"""Benchmark harness.

Headline metric (BASELINE.md): train images/sec/chip for ResNet-18 /
CIFAR-10-shaped input, batch 128, mixed precision — the reference's CI
recipe (reference: examples/configs/classification_cifar10.yaml:36,84) runs
the same model/batch at fp16 on a T4.

Also measures production ImageNet-shape cases (ResNet-50 and SwinV2-tiny at
224/256, bs 256) and reports achieved TFLOP/s + MFU for each, using XLA's
own cost analysis of the compiled train step and the chip's peak bf16
throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "mfu": ..., "extras": {case: {...}}}

The baseline divisor is a measured-estimate for the reference on its CI GPU
(T4, fp16, Lightning loop) since the reference publishes no numbers
(BASELINE.md): ~1100 img/s. Recorded in BASELINE.md; update when a real
reference measurement lands.
"""
import functools
import json
import os
import signal
import sys
import time

from torchok_tpu.utils.compile_cache import cache_dir as _cache_dir

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())
# same host-partitioned store the CLI uses (persistent across /tmp wipes —
# the probes and CLI already share it)

import jax

if os.environ.get("TORCHOK_BENCH_CPU"):
    # test hook: the axon TPU plugin ignores JAX_PLATFORMS, force via config;
    # skip the persistent cache on CPU (cpu_aot_loader noise, seconds-long
    # compiles anyway — see torchok_tpu/__main__.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)

import jax.numpy as jnp
import numpy as np

import threading

# ---------------------------------------------------------------------------
# Emit-or-die protection. Round 4's BENCH record was rc=124/parsed=null: the
# driver SIGKILLed bench.py before the single final print. Three layers keep
# the JSON line alive no matter what:
#   1. init watchdog — a dead TPU tunnel hangs jax.devices() forever; emit an
#      error JSON after 300 s instead of wedging.
#   2. total-runtime watchdog — after TORCHOK_BENCH_BUDGET_S (default 900 s,
#      well inside driver timeouts) a daemon thread prints the JSON with
#      whatever has been measured so far and exits 0. Works even when the
#      main thread is stuck inside a blocking XLA call.
#   3. SIGTERM/SIGINT handler — `timeout`-style drivers TERM first; emit
#      immediately instead of dying silently.
# The headline case runs FIRST and every finished case updates _RESULT under
# a lock, so a mid-extras timeout still records the headline number.
# ---------------------------------------------------------------------------

BENCH_BUDGET_S = float(os.environ.get("TORCHOK_BENCH_BUDGET_S", "900"))
# 900 + 120 grace emits by ~17 min: the round-4 driver kill (BENCH_r04 rc=124)
# happened with only the init warning printed, so its timeout may be ~20 min
_T_START = time.monotonic()

# RLocks: the SIGTERM handler runs on the main thread and may interrupt it
# while it holds these inside _update_*/_emit — a plain Lock self-deadlocks
# there (and _emitted would already be set, silencing the watchdog too)
_result_lock = threading.RLock()
_emit_once = threading.RLock()
_emitted = threading.Event()
_RESULT = {
    "metric": ("train images/sec/chip (ResNet-18/CIFAR-10 shape, bs=128, "
               "bf16, fused 25-step scan)"),
    "value": 0,
    "unit": "images/sec/chip",
    "vs_baseline": 0,
    "extras": {},
}


def _elapsed() -> float:
    return time.monotonic() - _T_START


def _update_result(**kv) -> None:
    with _result_lock:
        _RESULT.update(kv)


def _update_extra(key, value) -> None:
    with _result_lock:
        _RESULT["extras"][key] = value


def _emit(note=None, exit_code=None) -> None:
    """Print the result JSON exactly once; optionally exit."""
    with _emit_once:  # atomic test-and-set: racing threads print once total
        if _emitted.is_set():
            return
        _emitted.set()
    with _result_lock:
        out = dict(_RESULT)
        out["extras"] = dict(out["extras"])
    if note:
        out["timeout_note"] = note
    out["wall_s"] = round(_elapsed(), 1)
    print(json.dumps(out), flush=True)
    if exit_code is not None:
        os._exit(exit_code)


_backend_up = threading.Event()


def _backend_watchdog(limit_s: float = 300.0) -> None:
    if not _backend_up.wait(limit_s):
        _update_result(error=f"jax backend init exceeded {limit_s:.0f}s "
                             "(TPU tunnel down?)")
        _emit(exit_code=17)


def _budget_watchdog() -> None:
    # grace margin past the soft budget for the in-flight case to finish
    deadline = BENCH_BUDGET_S + float(
        os.environ.get("TORCHOK_BENCH_GRACE_S", "120"))
    remaining = deadline - _elapsed()
    while remaining > 0 and not _emitted.wait(min(remaining, 10.0)):
        remaining = deadline - _elapsed()
    if not _emitted.is_set():
        _emit(note=f"budget watchdog fired at {deadline:.0f}s; "
                   "emitting partial results", exit_code=0)


def _sig_handler(signum, frame):  # noqa: ARG001
    _emit(note=f"signal {signum}; emitting partial results", exit_code=0)


# Library mode (TORCHOK_BENCH_LIB=1): probes importing bench_case must not
# inherit the signal handlers / watchdog threads — a TERM would print
# bench's placeholder JSON and exit 0, masking the probe's own result.
if not os.environ.get("TORCHOK_BENCH_LIB"):
    for _sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(_sig, _sig_handler)
        except (ValueError, OSError):
            pass

    threading.Thread(target=_backend_watchdog, daemon=True).start()
    threading.Thread(target=_budget_watchdog, daemon=True).start()
jax.devices()
_backend_up.set()

if not os.environ.get("TORCHOK_BENCH_CPU"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

REFERENCE_T4_IMG_PER_SEC = 1100.0  # see module docstring

# peak dense bf16 TFLOP/s per chip by device_kind (public spec sheets)
PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def _peak_tflops() -> float:
    kind = jax.devices()[0].device_kind
    for key, val in PEAK_BF16_TFLOPS.items():
        if kind.startswith(key):
            return val
    return 0.0


def build_trainer(backbone: str, hw: int, batch_size: int,
                  num_classes: int = 1000, backbone_extra: dict = None,
                  pooling_name: str = "Pooling", neck_name: str = None):
    import torchok_tpu  # noqa: F401
    from torchok_tpu.constructor import TASKS
    from torchok_tpu.constructor.config import ConfigNode
    from torchok_tpu.constructor.config_structure import merge_structured
    from torchok_tpu.engine.trainer import Trainer

    cfg = {
        "task": {
            "name": "ClassificationTask",
            "params": {
                "backbone_name": backbone,
                "backbone_params": {"pretrained": False, "in_channels": 3,
                                    **(backbone_extra or {})},
                **({"neck_name": neck_name} if neck_name else {}),
                **({"pooling_name": pooling_name} if pooling_name else {}),
                "head_name": "ClassificationHead",
                "head_params": {"num_classes": num_classes},
                "inputs": [{"shape": [3, hw, hw], "dtype": "float16"}],
            },
        },
        "joint_loss": {"losses": [
            {"name": "CrossEntropyLoss",
             "mapping": {"input": "prediction", "target": "target"}},
        ]},
        "optimization": [
            {"optimizer": {"name": "Adam", "params": {"lr": 1e-4}}},
        ],
        "data": {"TRAIN": [{"dataloader": {"batch_size": batch_size},
                            "dataset": {"name": "SyntheticClassificationDataset",
                                        "params": {"num_samples": 256},
                                        "transform": []}}]},
        "trainer": {"max_epochs": 1, "precision": 16},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = Trainer(config.trainer)
    trainer.task = task
    trainer._setup_state(task)
    return trainer, task


def bench_case(backbone: str, hw: int, batch_size: int, k: int, reps: int,
               warmup_reps: int = 2, num_classes: int = 1000,
               pooling_name: str = "Pooling", neck_name: str = None,
               backbone_extra: dict = None):
    """Measure sustained train throughput with a fused k-step lax.scan (one
    host dispatch per k optimizer steps — per-step dispatch through the
    tunnel jitters 2-4x) and MFU from XLA's cost analysis of the step."""
    trainer, task = build_trainer(backbone, hw, batch_size, num_classes,
                                  backbone_extra=backbone_extra,
                                  pooling_name=pooling_name,
                                  neck_name=neck_name)
    train_step = trainer._make_train_step(task, trainer.tx)

    rng = np.random.default_rng(0)
    host = {
        "image": rng.normal(size=(batch_size, hw, hw, 3)).astype(np.float32),
        "target": rng.integers(0, num_classes,
                               size=(batch_size,)).astype(np.int64),
    }
    batch = jax.device_put(host, trainer.data_sharding)
    batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch):
        def body(s, _):
            s2, _outputs, losses = train_step(s, batch)
            return s2, losses["loss"]
        return jax.lax.scan(body, state, None, length=k)

    # XLA's own FLOP count for one optimizer step (fwd+bwd+update)
    step_flops = None
    try:
        cost = train_step.lower(trainer.state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0)) or None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort per backend
        pass

    state = trainer.state
    for _ in range(warmup_reps):
        state, losses = multi_step(state, batch)
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = multi_step(state, batch)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    steps_per_sec = reps * k / dt
    imgs_per_sec = steps_per_sec * batch_size
    n_chips = trainer.num_devices
    out = {
        "images_per_sec_per_chip": round(imgs_per_sec / n_chips, 1),
        "batch_size": batch_size,
        "hw": hw,
    }
    if step_flops:
        achieved = steps_per_sec * step_flops / n_chips
        out["achieved_tflops"] = round(achieved / 1e12, 2)
        peak = _peak_tflops()
        if peak:
            out["mfu"] = round(achieved / 1e12 / peak, 4)
    del state, batch
    return out


def bench_infer_case(backbone: str, hw: int, batch_size: int, k: int,
                     reps: int, num_classes: int = 1000):
    """Eval-mode forward throughput (the serving path): one jitted k-step
    scan over the bf16 forward, no grads/optimizer, batch stats frozen."""
    trainer, task = build_trainer(backbone, hw, batch_size, num_classes)
    model, state = task.model, trainer.state

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    if state.buffers:
        variables["buffers"] = state.buffers

    rng = np.random.default_rng(0)
    host = {"image": rng.normal(size=(batch_size, hw, hw, 3)).astype(np.float32)}
    batch = jax.device_put(host, trainer.data_sharding)
    batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}

    @jax.jit
    def infer_k(variables, batch):
        def body(carry, _):
            # thread the carry into the input so XLA cannot hoist the
            # loop-invariant forward out of the scan (the added term is a
            # dynamic zero: carry * 1e-30 underflows the bf16 cast)
            img = batch["image"] + (carry * 1e-30).astype(batch["image"].dtype)
            out = model.apply(variables, {**batch, "image": img}, train=False)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.sum(leaf.astype(jnp.float32)), None
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=k)
        return total

    total = infer_k(variables, batch)
    jax.block_until_ready(total)
    t0 = time.perf_counter()
    for _ in range(reps):
        total = infer_k(variables, batch)
    jax.block_until_ready(total)
    dt = time.perf_counter() - t0
    ips = reps * k * batch_size / dt
    return {"images_per_sec_per_chip": round(ips / trainer.num_devices, 1),
            "batch_size": batch_size, "hw": hw, "mode": "eval-forward"}


def main():
    _update_result(device_kind=jax.devices()[0].device_kind,
                   budget_s=BENCH_BUDGET_S)

    smoke = bool(os.environ.get("TORCHOK_BENCH_SMOKE"))

    # headline FIRST: the reference CI recipe shape — 10 classes like the
    # CIFAR-10 recipe the T4 baseline divisor describes. Recorded into
    # _RESULT immediately so a later timeout cannot lose it.
    _update_result(headline_status="in_flight")
    try:
        head = bench_case("resnet18", 32, 128, k=2 if smoke else 25,
                          reps=1 if smoke else 4, num_classes=10)
        _update_result(
            headline_status="ok",
            value=head["images_per_sec_per_chip"],
            vs_baseline=round(head["images_per_sec_per_chip"]
                              / REFERENCE_T4_IMG_PER_SEC, 3),
            vs_baseline_note=(
                "divisor ~1100 img/s is an UNMEASURED estimate of the "
                "reference's fp16 CIFAR recipe on its T4 CI box (the "
                "reference publishes no numbers and cannot run here: "
                "timm/lightning/mmcv absent); MFU is the defensible metric"),
            mfu=head.get("mfu"))
    except Exception as e:  # noqa: BLE001 — extras may still succeed
        _update_result(headline_status="failed",
                       error=f"headline case failed: {str(e)[:300]}")

    # extras, most important first (VERDICT r4: headline + ResNet-50 + SwinV2
    # must survive even a cold compile cache). Each case is skipped up front
    # when the soft budget is already spent; a case that blows the budget
    # mid-flight is cut by the watchdog, which emits everything recorded so
    # far and exits 0.
    extra_cases = [
        # production ImageNet shapes, where MFU is meaningful
        ("resnet50_224_bs256",
         lambda: bench_case("resnet50", 224, 256, k=10, reps=3)),
        # bs 128 (bs 256 without remat does not fit the 16 GB chip;
        # grad_checkpointing recovers it for real training). Round 3: the
        # fully fused Pallas window-attention kernel (fwd+bwd, partition/
        # reverse folded into BlockSpecs, ops/swin_attention.py) is the TPU
        # default — 742.8 img/s vs 497 for the XLA formulation on v5e.
        ("swinv2_tiny_256_bs128",
         lambda: bench_case("swinv2_tiny_window8_256", 256, 128, k=10, reps=3)),
        # serving path: eval-mode forward throughput
        ("resnet50_224_bs256_infer",
         lambda: bench_infer_case("resnet50", 224, 256, k=20, reps=3)),
        ("swinv2_tiny_256_bs128_infer",
         lambda: bench_infer_case("swinv2_tiny_window8_256", 256, 128,
                                  k=20, reps=3)),
        # the other fused-window-attention families (round 3b: the plain-dot
        # and global-q kernel modes measured faster than XLA on v5e —
        # davit_t 1242 vs 941 img/s)
        ("davit_t_224_bs128",
         lambda: bench_case("davit_t", 224, 128, k=10, reps=3)),
        ("gcvit_tiny_224_bs128",
         lambda: bench_case("gcvit_tiny", 224, 128, k=10, reps=3)),
        # CNN families with depthwise / multi-branch topologies. Depthwise
        # convs map to the VPU rather than the 128x128 MXU, so MFU is
        # expected to be low; img/s is the meaningful number for these.
        ("efficientnet_b0_224_bs256",
         lambda: bench_case("efficientnet_b0", 224, 256, k=10, reps=3)),
        ("mobilenetv3_large_100_224_bs256",
         lambda: bench_case("mobilenetv3_large_100", 224, 256, k=10, reps=3)),
        # hrnet emits a 4-branch pyramid: classification needs its
        # incre+downsample neck (the reference hrnet cls recipe's shape)
        ("hrnet_w18_224_bs128",
         lambda: bench_case("hrnet_w18", 224, 128, k=10, reps=3,
                            neck_name="HRNetClassificationNeck")),
        # global-attention transformer families (no windowing): XLA already
        # keeps these MXU-bound — 26%/33% MFU on v5e (tools/probe_vit_mfu.py).
        # ViT/BEiT emit the pooled cls token (B, C) themselves — no Pooling.
        ("vit_small_224_bs128",
         lambda: bench_case("vit_small_patch16_224", 224, 128, k=10, reps=3,
                            pooling_name=None)),
        ("beit_base_224_bs128",
         lambda: bench_case("beit_base_patch16_224", 224, 128, k=10, reps=3,
                            pooling_name=None)),
    ]
    for key, fn in extra_cases:
        if _elapsed() > BENCH_BUDGET_S:
            _update_extra(key, {"skipped": "budget"})
            continue
        _update_extra(key, {"in_flight_at_timeout": True})
        try:
            _update_extra(key, fn())
        except Exception as e:  # noqa: BLE001 — keep the rest alive
            _update_extra(key, {"error": str(e)[:200]})

    _emit()


if __name__ == "__main__":
    main()
