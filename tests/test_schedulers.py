"""Scheduler policy tests — parity vs torch.optim.lr_scheduler where the
reference re-registers the torch scheduler of the same name
(reference: torchok/optim/schedulers/__init__.py:14-30)."""
import math

import pytest

from torchok_tpu.constructor import SCHEDULERS
from torchok_tpu.optim.schedulers import parse_lr_lambda


def _policy(name, base_lr=0.1, **params):
    sched = SCHEDULERS.get(name)(**params)
    sched.attach(base_lr)
    return sched


def _torch_lrs(torch_sched_cls, steps, base_lr=0.1, **params):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = torch_sched_cls(opt, **params)
    lrs = [opt.param_groups[0]["lr"]]
    for _ in range(steps - 1):
        opt.step()
        sched.step()
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


@pytest.mark.parametrize("pct_start,total", [(0.3, 100), (0.25, 40), (0.2, 20)])
def test_onecycle_matches_torch(pct_start, total):
    import torch

    ours = _policy("OneCycleLR", base_lr=0.1, max_lr=0.4, total_steps=total,
                   pct_start=pct_start)
    theirs = _torch_lrs(torch.optim.lr_scheduler.OneCycleLR, total,
                        max_lr=0.4, total_steps=total, pct_start=pct_start)
    for e in range(total):
        assert ours.lr_at(e) == pytest.approx(theirs[e], rel=1e-6), f"step {e}"


def test_onecycle_warmup_is_monotonic_ramp():
    total, pct = 100, 0.3
    sched = _policy("OneCycleLR", max_lr=0.4, total_steps=total, pct_start=pct)
    up = [sched.lr_at(e) for e in range(int(total * pct))]
    assert up[0] == pytest.approx(0.4 / 25.0)  # initial = max_lr / div_factor
    assert all(b > a for a, b in zip(up, up[1:])), "warmup must increase"
    assert max(up) <= 0.4 + 1e-9


def test_onecycle_linear_strategy_matches_torch():
    import torch

    total = 50
    ours = _policy("OneCycleLR", max_lr=0.2, total_steps=total,
                   pct_start=0.2, anneal_strategy="linear")
    theirs = _torch_lrs(torch.optim.lr_scheduler.OneCycleLR, total,
                        max_lr=0.2, total_steps=total, pct_start=0.2,
                        anneal_strategy="linear")
    for e in range(total):
        assert ours.lr_at(e) == pytest.approx(theirs[e], rel=1e-6), f"step {e}"


def test_lambda_lr_string_policy():
    sched = _policy("LambdaLR", base_lr=1.0, lr_lambda="lambda epoch: 0.95 ** epoch")
    assert sched.lr_at(0) == pytest.approx(1.0)
    assert sched.lr_at(3) == pytest.approx(0.95 ** 3)


def test_parse_lr_lambda_allows_math_and_builtins():
    fn = parse_lr_lambda("lambda e: max(0.1, math.cos(e / 10) ** 2)")
    assert fn(0) == pytest.approx(1.0)
    assert fn(100) == pytest.approx(max(0.1, math.cos(10.0) ** 2))


@pytest.mark.parametrize("src", [
    "lambda e: __import__('os').system('true')",
    "lambda e: open('/etc/passwd')",
    "lambda e: (lambda: exec('x=1'))()",
    "lambda e: e.__class__",
    "0.5",  # not a lambda
    "lambda e: [x for x in (1,)][0]",
])
def test_parse_lr_lambda_rejects_unsafe(src):
    with pytest.raises(ValueError):
        parse_lr_lambda(src)


@pytest.mark.parametrize("mode", ["triangular", "triangular2", "exp_range"])
def test_cyclic_lr_matches_torch(mode):
    import torch

    ours = _policy("CyclicLR", base_lr=0.001, max_lr=0.01,
                   step_size_up=5, mode=mode, gamma=0.9)
    # torch CyclicLR needs explicit base_lr/max_lr kwargs; build directly.
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.001)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=0.001, max_lr=0.01, step_size_up=5, mode=mode, gamma=0.9)
    for e in range(25):
        assert ours.lr_at(e) == pytest.approx(opt.param_groups[0]["lr"], abs=1e-12), f"{mode} step {e}"
        opt.step()
        tsched.step()
