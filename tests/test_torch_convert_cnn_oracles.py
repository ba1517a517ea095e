"""EfficientNet / MobileNetV3 / HRNet full-network torch-oracle forward
equivalence for the weight converter (round-2 review: the cross-family test
synthesized its torch dict from the mapper's own candidates — circular).

Here the state dicts are HAND-WRITTEN with real timm key naming (reference:
torchok/models/backbones/efficientnet.py:506, mobilenetv3.py:108,
hrnet.py:49 — all load timm checkpoints via build_model_with_cfg) and the
forward oracles are independent torch.nn.functional re-implementations, so
a wrong timm key map or a layout-transform bug breaks the comparison.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from torchok_tpu.models.backbones.efficientnet import EfficientNet
from torchok_tpu.models.backbones.hrnet import CFGS, HighResolutionNet
from torchok_tpu.models.backbones.mobilenetv3 import MobileNetV3
from torchok_tpu.models.modules.blocks.se import make_divisible
from torchok_tpu.utils.torch_convert import convert_state_dict

# ---------------------------------------------------------------------------
# shared torch helpers

_T_ACTS = {"relu": F.relu, "relu6": F.relu6, "swish": F.silu,
           "hard_swish": F.hardswish}


def _bn(x, sd, p, eps):
    return F.batch_norm(x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                        sd[f"{p}.weight"], sd[f"{p}.bias"],
                        training=False, eps=eps)


def _se(x, sd, p, act, gate):
    s = x.mean((2, 3), keepdim=True)
    s = F.conv2d(s, sd[f"{p}.conv_reduce.weight"], sd[f"{p}.conv_reduce.bias"])
    s = act(s)
    s = F.conv2d(s, sd[f"{p}.conv_expand.weight"], sd[f"{p}.conv_expand.bias"])
    return x * gate(s)


def _rand(gen, *shape):
    return torch.from_numpy(gen.normal(0, 0.2, shape).astype(np.float32))


def _bn_entries(sd, gen, p, c):
    sd[f"{p}.weight"] = _rand(gen, c) + 1.0
    sd[f"{p}.bias"] = _rand(gen, c)
    sd[f"{p}.running_mean"] = _rand(gen, c)
    sd[f"{p}.running_var"] = torch.abs(_rand(gen, c)) + 0.5


def _se_entries(sd, gen, p, c, rd):
    sd[f"{p}.conv_reduce.weight"] = _rand(gen, rd, c, 1, 1)
    sd[f"{p}.conv_reduce.bias"] = _rand(gen, rd)
    sd[f"{p}.conv_expand.weight"] = _rand(gen, c, rd, 1, 1)
    sd[f"{p}.conv_expand.bias"] = _rand(gen, c)


# ---------------------------------------------------------------------------
# EfficientNet-family: generic sd builder + torch interpreter over an arch
# table ((block, repeats, k, stride, exp, channels, se_ratio[, act])).

def _effnet_sd(gen, arch, stem, head, se_from_exp, head_in_blocks,
               default_act):
    """State dict with timm naming for the given (scaled) arch."""
    sd = {"conv_stem.weight": _rand(gen, stem, 3, 3, 3)}
    _bn_entries(sd, gen, "bn1", stem)
    in_c = stem
    for si, row in enumerate(arch):
        block, repeats, k, s, e, c, se = row[:7]
        for b in range(repeats):
            p = f"blocks.{si}.{b}"
            if block == "cn":
                sd[f"{p}.conv.weight"] = _rand(gen, c, in_c, k, k)
                _bn_entries(sd, gen, f"{p}.bn1", c)
            elif block == "ds":
                sd[f"{p}.conv_dw.weight"] = _rand(gen, in_c, 1, k, k)
                _bn_entries(sd, gen, f"{p}.bn1", in_c)
                if se > 0:
                    _se_entries(sd, gen, f"{p}.se", in_c,
                                make_divisible(in_c * se))
                sd[f"{p}.conv_pw.weight"] = _rand(gen, c, in_c, 1, 1)
                _bn_entries(sd, gen, f"{p}.bn2", c)
            elif block == "ir":
                mid = make_divisible(in_c * e)
                sd[f"{p}.conv_pw.weight"] = _rand(gen, mid, in_c, 1, 1)
                _bn_entries(sd, gen, f"{p}.bn1", mid)
                sd[f"{p}.conv_dw.weight"] = _rand(gen, mid, 1, k, k)
                _bn_entries(sd, gen, f"{p}.bn2", mid)
                if se > 0:
                    rd = make_divisible((mid if se_from_exp else in_c) * se)
                    _se_entries(sd, gen, f"{p}.se", mid, rd)
                sd[f"{p}.conv_pwl.weight"] = _rand(gen, c, mid, 1, 1)
                _bn_entries(sd, gen, f"{p}.bn3", c)
            elif block == "er":
                mid = make_divisible(in_c * e)
                sd[f"{p}.conv_exp.weight"] = _rand(gen, mid, in_c, k, k)
                _bn_entries(sd, gen, f"{p}.bn1", mid)
                if se > 0:
                    _se_entries(sd, gen, f"{p}.se", mid,
                                make_divisible(in_c * se))
                sd[f"{p}.conv_pwl.weight"] = _rand(gen, c, mid, 1, 1)
                _bn_entries(sd, gen, f"{p}.bn2", c)
            in_c = c
    if head_in_blocks:  # mobilenetv3: trailing ConvBnAct stage in timm
        p = f"blocks.{len(arch)}.0"
        sd[f"{p}.conv.weight"] = _rand(gen, head, in_c, 1, 1)
        _bn_entries(sd, gen, f"{p}.bn1", head)
    else:  # efficientnet: top-level conv_head/bn2
        sd["conv_head.weight"] = _rand(gen, head, in_c, 1, 1)
        _bn_entries(sd, gen, "bn2", head)
    return sd


def _effnet_torch_forward(sd, x, arch, stem, head, se_from_exp, se_gate,
                          head_in_blocks, default_act, eps=1e-3):
    gate = F.hardsigmoid if se_gate == "hard_sigmoid" else torch.sigmoid
    a0 = _T_ACTS[default_act]
    x = F.conv2d(x, sd["conv_stem.weight"], None, stride=2, padding=1)
    x = a0(_bn(x, sd, "bn1", eps))
    in_c = stem
    for si, row in enumerate(arch):
        block, repeats, k, s, e, c, se = row[:7]
        act = _T_ACTS[row[7]] if len(row) > 7 else a0
        for b in range(repeats):
            stride = s if b == 0 else 1
            p = f"blocks.{si}.{b}"
            pad = (k - 1) // 2
            sc = x
            if block == "cn":
                x = F.conv2d(x, sd[f"{p}.conv.weight"], None, stride=stride,
                             padding=pad)
                x = act(_bn(x, sd, f"{p}.bn1", eps))
            elif block == "ds":
                x = F.conv2d(x, sd[f"{p}.conv_dw.weight"], None, stride=stride,
                             padding=pad, groups=in_c)
                x = act(_bn(x, sd, f"{p}.bn1", eps))
                if se > 0:
                    x = _se(x, sd, f"{p}.se", act, gate)
                x = F.conv2d(x, sd[f"{p}.conv_pw.weight"], None)
                x = _bn(x, sd, f"{p}.bn2", eps)
                if stride == 1 and in_c == c:
                    x = x + sc
            elif block == "ir":
                mid = make_divisible(in_c * e)
                x = F.conv2d(x, sd[f"{p}.conv_pw.weight"], None)
                x = act(_bn(x, sd, f"{p}.bn1", eps))
                x = F.conv2d(x, sd[f"{p}.conv_dw.weight"], None, stride=stride,
                             padding=pad, groups=mid)
                x = act(_bn(x, sd, f"{p}.bn2", eps))
                if se > 0:
                    # mnv3 (se_from_exp) uses relu inside SE
                    se_act = F.relu if se_from_exp else act
                    x = _se(x, sd, f"{p}.se", se_act, gate)
                x = F.conv2d(x, sd[f"{p}.conv_pwl.weight"], None)
                x = _bn(x, sd, f"{p}.bn3", eps)
                if stride == 1 and in_c == c:
                    x = x + sc
            elif block == "er":
                x = F.conv2d(x, sd[f"{p}.conv_exp.weight"], None,
                             stride=stride, padding=pad)
                x = act(_bn(x, sd, f"{p}.bn1", eps))
                if se > 0:
                    x = _se(x, sd, f"{p}.se", act, gate)
                x = F.conv2d(x, sd[f"{p}.conv_pwl.weight"], None)
                x = _bn(x, sd, f"{p}.bn2", eps)
                if stride == 1 and in_c == c:
                    x = x + sc
            in_c = c
    if head_in_blocks:
        p = f"blocks.{len(arch)}.0"
        x = F.conv2d(x, sd[f"{p}.conv.weight"], None)
        x = a0(_bn(x, sd, f"{p}.bn1", eps))
    else:
        x = F.conv2d(x, sd["conv_head.weight"], None)
        x = a0(_bn(x, sd, "bn2", eps))
    return x


def test_efficientnet_forward_matches_torch_oracle():
    """Tiny arch covering all four block codecs (cn/ds/ir/er) + SE; keys use
    real timm naming, converted under the 'efficientnet_b0' mapper."""
    arch = (("ds", 1, 3, 1, 1.0, 8, 0.25),
            ("ir", 2, 3, 2, 4.0, 16, 0.25),
            ("er", 1, 3, 2, 4.0, 16, 0.0),
            ("cn", 1, 3, 1, 1.0, 24, 0.0))
    gen = np.random.default_rng(11)
    sd = _effnet_sd(gen, arch, stem=8, head=32, se_from_exp=False,
                    head_in_blocks=False, default_act="swish")

    model = EfficientNet(arch=arch, stem_size=8, num_features=32,
                         width_mult=1.0, depth_mult=1.0, act="swish")
    x_np = gen.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("efficientnet_b0", sd, variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused

    with torch.no_grad():
        theirs = _effnet_torch_forward(
            sd, torch.from_numpy(x_np), arch, 8, 32, False, "sigmoid",
            False, "swish").permute(0, 2, 3, 1).numpy()
    ours = np.asarray(model.apply(converted, xin, False))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_mobilenetv3_forward_matches_torch_oracle():
    """mnv3 semantics: hard-swish/hard-sigmoid, SE from expanded chs with
    relu, and timm's trailing ConvBnAct stage (blocks.{N}.0.conv/bn1) as the
    source for our top-level conv_head/bn2."""
    arch = (("ds", 1, 3, 1, 1.0, 8, 0.0, "relu"),
            ("ir", 2, 3, 2, 4.0, 16, 0.25, "relu"),
            ("ir", 1, 5, 2, 4.0, 24, 0.25, "hard_swish"))
    gen = np.random.default_rng(12)
    sd = _effnet_sd(gen, arch, stem=8, head=32, se_from_exp=True,
                    head_in_blocks=True, default_act="hard_swish")

    model = MobileNetV3(arch=arch, stem_size=8, num_features=32,
                        width_mult=1.0)
    x_np = gen.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("mobilenetv3_large_100", sd,
                                           variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused

    with torch.no_grad():
        theirs = _effnet_torch_forward(
            sd, torch.from_numpy(x_np), arch, 8, 32, True, "hard_sigmoid",
            True, "hard_swish").permute(0, 2, 3, 1).numpy()
    ours = np.asarray(model.apply(converted, xin, False))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_mobilenetv3_real_conv_head_goes_unused_not_misrouted():
    """A real timm mnv3 checkpoint also carries the POST-pool conv_head
    (1280ch classifier limb). It must land in report.unused — never be
    force-fit into the backbone's pre-pool head."""
    arch = (("ds", 1, 3, 1, 1.0, 8, 0.0, "relu"),)
    gen = np.random.default_rng(13)
    sd = _effnet_sd(gen, arch, stem=8, head=16, se_from_exp=True,
                    head_in_blocks=True, default_act="hard_swish")
    sd["conv_head.weight"] = _rand(gen, 64, 16, 1, 1)  # post-pool, 64ch
    sd["conv_head.bias"] = _rand(gen, 64)

    model = MobileNetV3(arch=arch, stem_size=8, num_features=16,
                        width_mult=1.0)
    xin = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("mobilenetv3_large_100", sd,
                                           variables)
    assert not report.missing, report.missing
    assert sorted(report.unused) == ["conv_head.bias", "conv_head.weight"]


# ---------------------------------------------------------------------------
# HRNet: hrnet_w18_small torch interpreter (stem, bottleneck layer1,
# transitions incl. nested-Sequential new branches, HR modules with
# multi-resolution fuse via bilinear upsample).

_EPS_HR = 1e-5


def _hr_basic(sd, p, x):
    sc = x
    y = F.conv2d(x, sd[f"{p}.conv1.weight"], None, padding=1)
    y = F.relu(_bn(y, sd, f"{p}.bn1", _EPS_HR))
    y = F.conv2d(y, sd[f"{p}.conv2.weight"], None, padding=1)
    y = _bn(y, sd, f"{p}.bn2", _EPS_HR)
    return F.relu(y + sc)


def _hr_bottleneck(sd, p, x, has_down):
    sc = x
    y = F.conv2d(x, sd[f"{p}.conv1.weight"], None)
    y = F.relu(_bn(y, sd, f"{p}.bn1", _EPS_HR))
    y = F.conv2d(y, sd[f"{p}.conv2.weight"], None, padding=1)
    y = F.relu(_bn(y, sd, f"{p}.bn2", _EPS_HR))
    y = F.conv2d(y, sd[f"{p}.conv3.weight"], None)
    y = _bn(y, sd, f"{p}.bn3", _EPS_HR)
    if has_down:
        sc = F.conv2d(x, sd[f"{p}.downsample.0.weight"], None)
        sc = _bn(sc, sd, f"{p}.downsample.1", _EPS_HR)
    return F.relu(y + sc)


def _hrnet_sd(gen, cfg):
    sd = {"conv1.weight": _rand(gen, cfg["STEM_WIDTH"], 3, 3, 3),
          "conv2.weight": _rand(gen, 64, cfg["STEM_WIDTH"], 3, 3)}
    _bn_entries(sd, gen, "bn1", cfg["STEM_WIDTH"])
    _bn_entries(sd, gen, "bn2", 64)

    def bottleneck(p, in_c, planes, has_down):
        sd[f"{p}.conv1.weight"] = _rand(gen, planes, in_c, 1, 1)
        _bn_entries(sd, gen, f"{p}.bn1", planes)
        sd[f"{p}.conv2.weight"] = _rand(gen, planes, planes, 3, 3)
        _bn_entries(sd, gen, f"{p}.bn2", planes)
        sd[f"{p}.conv3.weight"] = _rand(gen, 4 * planes, planes, 1, 1)
        _bn_entries(sd, gen, f"{p}.bn3", 4 * planes)
        if has_down:
            sd[f"{p}.downsample.0.weight"] = _rand(gen, 4 * planes, in_c, 1, 1)
            _bn_entries(sd, gen, f"{p}.downsample.1", 4 * planes)

    def basic(p, c):
        sd[f"{p}.conv1.weight"] = _rand(gen, c, c, 3, 3)
        _bn_entries(sd, gen, f"{p}.bn1", c)
        sd[f"{p}.conv2.weight"] = _rand(gen, c, c, 3, 3)
        _bn_entries(sd, gen, f"{p}.bn2", c)

    s1 = cfg["STAGE1"]
    planes = s1["NUM_CHANNELS"][0]
    in_c = 64
    for i in range(s1["NUM_BLOCKS"][0]):
        bottleneck(f"layer1.{i}", in_c, planes, i == 0 and in_c != 4 * planes)
        in_c = 4 * planes

    prev_widths = [in_c]
    for sidx, key in enumerate(("STAGE2", "STAGE3", "STAGE4"), start=2):
        scfg = cfg[key]
        widths = list(scfg["NUM_CHANNELS"])  # BASIC expansion 1
        t = f"transition{sidx - 1}"
        for i, oc in enumerate(widths):
            if i < len(prev_widths):
                if prev_widths[i] != oc:
                    sd[f"{t}.{i}.0.weight"] = _rand(gen, oc, prev_widths[i], 3, 3)
                    _bn_entries(sd, gen, f"{t}.{i}.1", oc)
            else:
                sd[f"{t}.{i}.0.0.weight"] = _rand(gen, oc, prev_widths[-1], 3, 3)
                _bn_entries(sd, gen, f"{t}.{i}.0.1", oc)
        for m in range(scfg["NUM_MODULES"]):
            sp = f"stage{sidx}.{m}"
            for b, c in enumerate(widths):
                for i in range(scfg["NUM_BLOCKS"][b]):
                    basic(f"{sp}.branches.{b}.{i}", c)
            for i in range(len(widths)):
                for j in range(len(widths)):
                    if j > i:
                        sd[f"{sp}.fuse_layers.{i}.{j}.0.weight"] = \
                            _rand(gen, widths[i], widths[j], 1, 1)
                        _bn_entries(sd, gen, f"{sp}.fuse_layers.{i}.{j}.1",
                                    widths[i])
                    elif j < i:
                        ch_in = widths[j]
                        for s in range(i - j):
                            last = s == i - j - 1
                            ch_out = widths[i] if last else widths[j]
                            sd[f"{sp}.fuse_layers.{i}.{j}.{s}.0.weight"] = \
                                _rand(gen, ch_out, ch_in, 3, 3)
                            _bn_entries(
                                sd, gen, f"{sp}.fuse_layers.{i}.{j}.{s}.1",
                                ch_out)
                            ch_in = ch_out
        prev_widths = widths
    return sd


def _hrnet_torch_forward(sd, x, cfg):
    x = F.conv2d(x, sd["conv1.weight"], None, stride=2, padding=1)
    x = F.relu(_bn(x, sd, "bn1", _EPS_HR))
    x = F.conv2d(x, sd["conv2.weight"], None, stride=2, padding=1)
    x = F.relu(_bn(x, sd, "bn2", _EPS_HR))

    s1 = cfg["STAGE1"]
    planes = s1["NUM_CHANNELS"][0]
    in_c = 64
    for i in range(s1["NUM_BLOCKS"][0]):
        x = _hr_bottleneck(sd, f"layer1.{i}", x,
                           i == 0 and in_c != 4 * planes)
        in_c = 4 * planes
    xs = [x]
    prev_widths = [in_c]
    for sidx, key in enumerate(("STAGE2", "STAGE3", "STAGE4"), start=2):
        scfg = cfg[key]
        widths = list(scfg["NUM_CHANNELS"])
        t = f"transition{sidx - 1}"
        outs = []
        for i, oc in enumerate(widths):
            if i < len(xs):
                y = xs[i]
                if prev_widths[i] != oc:
                    y = F.conv2d(y, sd[f"{t}.{i}.0.weight"], None, padding=1)
                    y = F.relu(_bn(y, sd, f"{t}.{i}.1", _EPS_HR))
            else:
                y = F.conv2d(xs[-1], sd[f"{t}.{i}.0.0.weight"], None,
                             stride=2, padding=1)
                y = F.relu(_bn(y, sd, f"{t}.{i}.0.1", _EPS_HR))
            outs.append(y)
        xs = outs
        for m in range(scfg["NUM_MODULES"]):
            sp = f"stage{sidx}.{m}"
            branch_out = []
            for b, c in enumerate(widths):
                y = xs[b]
                for i in range(scfg["NUM_BLOCKS"][b]):
                    y = _hr_basic(sd, f"{sp}.branches.{b}.{i}", y)
                branch_out.append(y)
            fused = []
            for i in range(len(widths)):
                acc = None
                for j, y in enumerate(branch_out):
                    if j > i:
                        y = F.conv2d(y, sd[f"{sp}.fuse_layers.{i}.{j}.0.weight"],
                                     None)
                        y = _bn(y, sd, f"{sp}.fuse_layers.{i}.{j}.1", _EPS_HR)
                        y = F.interpolate(y, size=branch_out[i].shape[2:],
                                          mode="bilinear", align_corners=False)
                    elif j < i:
                        for s in range(i - j):
                            last = s == i - j - 1
                            y = F.conv2d(
                                y, sd[f"{sp}.fuse_layers.{i}.{j}.{s}.0.weight"],
                                None, stride=2, padding=1)
                            y = _bn(y, sd, f"{sp}.fuse_layers.{i}.{j}.{s}.1",
                                    _EPS_HR)
                            if not last:
                                y = F.relu(y)
                    acc = y if acc is None else acc + y
                fused.append(F.relu(acc))
            xs = fused
        prev_widths = widths
    return xs


def test_hrnet_w18_small_forward_matches_torch_oracle():
    cfg = CFGS["hrnet_w18_small"]
    gen = np.random.default_rng(14)
    sd = _hrnet_sd(gen, cfg)

    model = HighResolutionNet(cfg=cfg)
    x_np = gen.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("hrnet_w18_small", sd, variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused

    with torch.no_grad():
        theirs = _hrnet_torch_forward(sd, torch.from_numpy(x_np), cfg)
    ours = model.apply(converted, xin, False)
    assert len(ours) == len(theirs) == 4
    for b, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(
            np.asarray(o), t.permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=2e-3, err_msg=f"branch {b}")
