"""SwinV2 full-network forward equivalence: converted timm-style weights
must reproduce an independent torch.nn.functional re-implementation of the
SwinV2 semantics (cosine attention with log-scaled temperature, cpb-MLP
relative bias, shifted windows, post-norm residuals, patch merging) —
reference: torchok/models/backbones/swin.py via timm swin_transformer_v2.

The oracle shares only the host-side coordinate tables
(_relative_coords_table / _relative_position_index / region ids) with the
Flax model; every learned transformation is recomputed in torch, so a
converter layout error or an attention-math divergence (e.g. the blhd
layout rewrite) breaks the comparison.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from torchok_tpu.models.backbones.swin import (SwinTransformerV2,
                                               _relative_coords_table,
                                               _relative_position_index,
                                               _shift_window_region_ids)
from torchok_tpu.utils.torch_convert import convert_state_dict

# tiny but structurally complete: 2 stages, shifted block in stage 0,
# window==map in stage 1, one patch merge
IMG, PATCH, WS = 16, 4, 2
DIM, DEPTHS, HEADS = 8, (2, 2), (2, 2)
MLP_RATIO = 2.0


def _rand(shape, gen):
    return torch.from_numpy(gen.normal(0, 0.05, shape).astype(np.float32))


def _make_state_dict(gen):
    sd = {}
    sd["patch_embed.proj.weight"] = _rand((DIM, 3, PATCH, PATCH), gen)
    sd["patch_embed.proj.bias"] = _rand((DIM,), gen)
    sd["patch_embed.norm.weight"] = _rand((DIM,), gen) + 1.0
    sd["patch_embed.norm.bias"] = _rand((DIM,), gen)
    for s, (depth, heads) in enumerate(zip(DEPTHS, HEADS)):
        c = DIM * 2 ** s
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            sd[f"{p}.attn.logit_scale"] = _rand((heads,), gen) + math.log(8.0)
            sd[f"{p}.attn.cpb_mlp.0.weight"] = _rand((512, 2), gen)
            sd[f"{p}.attn.cpb_mlp.0.bias"] = _rand((512,), gen)
            sd[f"{p}.attn.cpb_mlp.2.weight"] = _rand((heads, 512), gen)
            sd[f"{p}.attn.qkv.weight"] = _rand((3 * c, c), gen)
            sd[f"{p}.attn.q_bias"] = _rand((c,), gen)
            sd[f"{p}.attn.v_bias"] = _rand((c,), gen)
            sd[f"{p}.attn.proj.weight"] = _rand((c, c), gen)
            sd[f"{p}.attn.proj.bias"] = _rand((c,), gen)
            for n in ("norm1", "norm2"):
                sd[f"{p}.{n}.weight"] = _rand((c,), gen) + 1.0
                sd[f"{p}.{n}.bias"] = _rand((c,), gen)
            hidden = int(c * MLP_RATIO)
            sd[f"{p}.mlp.fc1.weight"] = _rand((hidden, c), gen)
            sd[f"{p}.mlp.fc1.bias"] = _rand((hidden,), gen)
            sd[f"{p}.mlp.fc2.weight"] = _rand((c, hidden), gen)
            sd[f"{p}.mlp.fc2.bias"] = _rand((c,), gen)
        sd[f"feature_norms.{s}.weight"] = _rand((c,), gen) + 1.0
        sd[f"feature_norms.{s}.bias"] = _rand((c,), gen)
        if s < len(DEPTHS) - 1:
            c2 = DIM * 2 ** (s + 1)
            sd[f"layers.{s}.downsample.reduction.weight"] = _rand((c2, 4 * c), gen)
            sd[f"layers.{s}.downsample.norm.weight"] = _rand((c2,), gen) + 1.0
            sd[f"layers.{s}.downsample.norm.bias"] = _rand((c2,), gen)
    return sd


def _torch_window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _torch_window_reverse(win, ws, h, w):
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _torch_block(sd, p, x, hw, heads, ws, shift):
    """One SwinV2 post-norm block on tokens x (1, L_total, c)."""
    gh, gw = hw
    c = x.shape[-1]
    d = c // heads
    L = ws * ws
    x_sp = x.view(1, gh, gw, c)
    if shift > 0:
        x_sp = torch.roll(x_sp, (-shift, -shift), dims=(1, 2))
    win = _torch_window_partition(x_sp, ws)                 # (nWb, L, c)

    qkv_b = torch.cat([sd[f"{p}.attn.q_bias"],
                       torch.zeros(c), sd[f"{p}.attn.v_bias"]])
    qkv = F.linear(win, sd[f"{p}.attn.qkv.weight"], qkv_b)
    q, k, v = qkv.reshape(-1, L, 3, heads, d).permute(2, 0, 3, 1, 4).unbind(0)
    qn = F.normalize(q, dim=-1)
    kn = F.normalize(k, dim=-1)
    scale = torch.clamp(sd[f"{p}.attn.logit_scale"],
                        max=math.log(100.0)).exp()
    attn = (qn @ kn.transpose(-2, -1)) * scale.view(1, heads, 1, 1)

    table = torch.from_numpy(_relative_coords_table(ws, 0)).float()
    cpb = F.relu(F.linear(table, sd[f"{p}.attn.cpb_mlp.0.weight"],
                          sd[f"{p}.attn.cpb_mlp.0.bias"]))
    cpb = F.linear(cpb, sd[f"{p}.attn.cpb_mlp.2.weight"])
    idx = torch.from_numpy(_relative_position_index(ws)).long()
    bias = cpb[idx.reshape(-1)].reshape(L, L, heads).permute(2, 0, 1)
    attn = attn + 16.0 * torch.sigmoid(bias).unsqueeze(0)

    if shift > 0:
        ids = torch.from_numpy(_shift_window_region_ids(gh, gw, ws, shift))
        mask = torch.where(ids[:, :, None] != ids[:, None, :], -100.0, 0.0)
        attn = attn + mask.unsqueeze(1)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(-1, L, c)
    out = F.linear(out, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])

    x_sp = _torch_window_reverse(out, ws, gh, gw)
    if shift > 0:
        x_sp = torch.roll(x_sp, (shift, shift), dims=(1, 2))
    y = x_sp.reshape(1, gh * gw, c)

    def ln(t, n):
        return F.layer_norm(t, (c,), sd[f"{p}.{n}.weight"],
                            sd[f"{p}.{n}.bias"], eps=1e-5)

    x = x + ln(y, "norm1")
    h = F.linear(x, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
    return x + ln(h, "norm2")


def _torch_forward(sd, x):
    t = F.conv2d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=PATCH)
    gh = gw = IMG // PATCH
    t = t.flatten(2).transpose(1, 2)                       # (1, gh*gw, DIM)
    t = F.layer_norm(t, (DIM,), sd["patch_embed.norm.weight"],
                     sd["patch_embed.norm.bias"], eps=1e-5)
    for s, (depth, heads) in enumerate(zip(DEPTHS, HEADS)):
        c = DIM * 2 ** s
        ws = min(WS, gh, gw)
        for b in range(depth):
            shift = 0 if (b % 2 == 0 or min(gh, gw) <= WS) else WS // 2
            t = _torch_block(sd, f"layers.{s}.blocks.{b}", t, (gh, gw),
                             heads, ws, shift)
        feat = F.layer_norm(t, (c,), sd[f"feature_norms.{s}.weight"],
                            sd[f"feature_norms.{s}.bias"], eps=1e-5)
        if s < len(DEPTHS) - 1:
            x_sp = t.view(1, gh, gw, c)
            x_sp = x_sp.view(1, gh // 2, 2, gw // 2, 2, c)
            x_sp = x_sp.permute(0, 1, 3, 2, 4, 5).reshape(
                1, (gh // 2) * (gw // 2), 4 * c)
            t = F.linear(x_sp, sd[f"layers.{s}.downsample.reduction.weight"])
            c2 = DIM * 2 ** (s + 1)
            t = F.layer_norm(t, (c2,),
                             sd[f"layers.{s}.downsample.norm.weight"],
                             sd[f"layers.{s}.downsample.norm.bias"], eps=1e-5)
            gh, gw = gh // 2, gw // 2
    return feat.view(1, gh, gw, -1)


def test_swinv2_forward_matches_torch_oracle():
    gen = np.random.default_rng(5)
    sd = _make_state_dict(gen)

    model = SwinTransformerV2(img_size=IMG, patch_size=PATCH, window_size=WS,
                              embed_dim=DIM, depths=DEPTHS, num_heads=HEADS,
                              mlp_ratio=MLP_RATIO, drop_path_rate=0.0)
    x_np = gen.normal(0, 1, (1, 3, IMG, IMG)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("swinv2_tiny_window8_256", sd,
                                           variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused

    with torch.no_grad():
        theirs = _torch_forward(sd, torch.from_numpy(x_np)).numpy()
    ours = np.asarray(model.apply(converted, xin, False))
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)
