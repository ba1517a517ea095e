"""BEiT / DaViT full-network torch-oracle forward equivalence for the
weight converter. State dicts use real checkpoint naming (BEiT: timm beit
keys, reference torchok/models/backbones/beit.py:61; DaViT: the reference's
main_blocks naming, torchok/models/backbones/davit.py:378-456); forwards
are independent torch.nn.functional re-implementations."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from torchok_tpu.models.backbones.beit import Beit, _rel_pos_index
from torchok_tpu.models.backbones.davit import DaViT
from torchok_tpu.utils.torch_convert import convert_state_dict


def _rand(gen, *shape):
    return torch.from_numpy(gen.normal(0, 0.1, shape).astype(np.float32))


def _ln(x, sd, p, eps):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"],
                        eps=eps)


# ---------------------------------------------------------------------------
# BEiT

IMG_B, PATCH_B, DIM_B, DEPTH_B, HEADS_B = 16, 4, 8, 2, 2
GRID_B = IMG_B // PATCH_B


def _beit_sd(gen):
    sd = {"patch_embed.proj.weight": _rand(gen, DIM_B, 3, PATCH_B, PATCH_B),
          "patch_embed.proj.bias": _rand(gen, DIM_B),
          "cls_token": _rand(gen, 1, 1, DIM_B),
          "norm.weight": _rand(gen, DIM_B) + 1.0,
          "norm.bias": _rand(gen, DIM_B)}
    num_rel = (2 * GRID_B - 1) ** 2 + 3
    hidden = DIM_B * 4
    for i in range(DEPTH_B):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = _rand(gen, DIM_B) + 1.0
        sd[f"{p}.norm1.bias"] = _rand(gen, DIM_B)
        sd[f"{p}.attn.qkv.weight"] = _rand(gen, 3 * DIM_B, DIM_B)
        sd[f"{p}.attn.q_bias"] = _rand(gen, DIM_B)
        sd[f"{p}.attn.v_bias"] = _rand(gen, DIM_B)
        sd[f"{p}.attn.relative_position_bias_table"] = _rand(gen, num_rel,
                                                             HEADS_B)
        sd[f"{p}.attn.proj.weight"] = _rand(gen, DIM_B, DIM_B)
        sd[f"{p}.attn.proj.bias"] = _rand(gen, DIM_B)
        sd[f"{p}.gamma_1"] = _rand(gen, DIM_B)
        sd[f"{p}.gamma_2"] = _rand(gen, DIM_B)
        sd[f"{p}.norm2.weight"] = _rand(gen, DIM_B) + 1.0
        sd[f"{p}.norm2.bias"] = _rand(gen, DIM_B)
        sd[f"{p}.mlp.fc1.weight"] = _rand(gen, hidden, DIM_B)
        sd[f"{p}.mlp.fc1.bias"] = _rand(gen, hidden)
        sd[f"{p}.mlp.fc2.weight"] = _rand(gen, DIM_B, hidden)
        sd[f"{p}.mlp.fc2.bias"] = _rand(gen, DIM_B)
    return sd


def _beit_torch_forward(sd, x):
    h, d = HEADS_B, DIM_B // HEADS_B
    t = F.conv2d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=PATCH_B)
    t = t.flatten(2).transpose(1, 2)
    t = torch.cat([sd["cls_token"].expand(t.shape[0], -1, -1), t], dim=1)
    idx = torch.from_numpy(_rel_pos_index((GRID_B, GRID_B))).long()
    for i in range(DEPTH_B):
        p = f"blocks.{i}"
        y = _ln(t, sd, f"{p}.norm1", 1e-6)
        c = DIM_B
        qkv_b = torch.cat([sd[f"{p}.attn.q_bias"], torch.zeros(c),
                           sd[f"{p}.attn.v_bias"]])
        qkv = F.linear(y, sd[f"{p}.attn.qkv.weight"], qkv_b)
        n, l, _ = qkv.shape
        q, k, v = qkv.reshape(n, l, 3, h, d).permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) / (d ** 0.5)
        table = sd[f"{p}.attn.relative_position_bias_table"]
        bias = table[idx.reshape(-1)].reshape(l, l, h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        attn = attn.softmax(-1)
        y = (attn @ v).transpose(1, 2).reshape(n, l, c)
        y = F.linear(y, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
        t = t + sd[f"{p}.gamma_1"] * y
        y = _ln(t, sd, f"{p}.norm2", 1e-6)
        y = F.linear(y, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
        t = t + sd[f"{p}.gamma_2"] * y
    t = _ln(t, sd, "norm", 1e-6)
    return t[:, 0]


def test_beit_forward_matches_torch_oracle():
    gen = np.random.default_rng(21)
    sd = _beit_sd(gen)
    model = Beit(img_size=IMG_B, patch_size=PATCH_B, embed_dim=DIM_B,
                 depth=DEPTH_B, num_heads=HEADS_B, init_values=0.1,
                 use_rel_pos_bias=True, use_abs_pos_emb=False,
                 drop_path_rate=0.0)
    x_np = gen.normal(0, 1, (2, 3, IMG_B, IMG_B)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("beit_base_patch16_224", sd,
                                           variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused

    with torch.no_grad():
        theirs = _beit_torch_forward(sd, torch.from_numpy(x_np)).numpy()
    ours = np.asarray(model.apply(converted, xin, False))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# DaViT

IMG_D = 16
DIMS_D, HEADS_D, DEPTHS_D, WS_D = (8, 16), (2, 4), (1, 1), 4


def _davit_sd(gen):
    sd = {}
    for s, c in enumerate(DIMS_D):
        in_c = 3 if s == 0 else DIMS_D[s - 1]
        k = 7 if s == 0 else 2
        sd[f"patch_embeds.{s}.proj.weight"] = _rand(gen, c, in_c, k, k)
        sd[f"patch_embeds.{s}.proj.bias"] = _rand(gen, c)
        sd[f"patch_embeds.{s}.norm.weight"] = _rand(gen, c) + 1.0
        sd[f"patch_embeds.{s}.norm.bias"] = _rand(gen, c)
        hidden = c * 4
        for b in range(DEPTHS_D[s]):
            for t in (0, 1):  # 0 = spatial, 1 = channel
                p = f"main_blocks.{s}.{b}.{t}"
                for cp in (0, 1):
                    sd[f"{p}.cpe.{cp}.proj.weight"] = _rand(gen, c, 1, 3, 3)
                    sd[f"{p}.cpe.{cp}.proj.bias"] = _rand(gen, c)
                sd[f"{p}.norm1.weight"] = _rand(gen, c) + 1.0
                sd[f"{p}.norm1.bias"] = _rand(gen, c)
                sd[f"{p}.attn.qkv.weight"] = _rand(gen, 3 * c, c)
                sd[f"{p}.attn.qkv.bias"] = _rand(gen, 3 * c)
                sd[f"{p}.attn.proj.weight"] = _rand(gen, c, c)
                sd[f"{p}.attn.proj.bias"] = _rand(gen, c)
                sd[f"{p}.norm2.weight"] = _rand(gen, c) + 1.0
                sd[f"{p}.norm2.bias"] = _rand(gen, c)
                sd[f"{p}.mlp.fc1.weight"] = _rand(gen, hidden, c)
                sd[f"{p}.mlp.fc1.bias"] = _rand(gen, hidden)
                sd[f"{p}.mlp.fc2.weight"] = _rand(gen, c, hidden)
                sd[f"{p}.mlp.fc2.bias"] = _rand(gen, c)
    sd["norm.weight"] = _rand(gen, DIMS_D[-1]) + 1.0
    sd["norm.bias"] = _rand(gen, DIMS_D[-1])
    return sd


def _davit_cpe(sd, p, t, h, w):
    n, l, c = t.shape
    feat = t.transpose(1, 2).reshape(n, c, h, w)
    y = F.conv2d(feat, sd[f"{p}.proj.weight"], sd[f"{p}.proj.bias"],
                 padding=1, groups=c)
    return t + y.flatten(2).transpose(1, 2)


def _davit_torch_forward(sd, x):
    t = None
    for s, (c, heads) in enumerate(zip(DIMS_D, HEADS_D)):
        if s == 0:
            x = F.conv2d(x, sd["patch_embeds.0.proj.weight"],
                         sd["patch_embeds.0.proj.bias"], stride=4, padding=3)
        else:
            x = F.conv2d(x, sd[f"patch_embeds.{s}.proj.weight"],
                         sd[f"patch_embeds.{s}.proj.bias"], stride=2)
        n, _, h, w = x.shape
        t = x.flatten(2).transpose(1, 2)
        t = _ln(t, sd, f"patch_embeds.{s}.norm", 1e-5)
        d = c // heads
        for b in range(DEPTHS_D[s]):
            # spatial block (single window here: ws == grid)
            p = f"main_blocks.{s}.{b}.0"
            t = _davit_cpe(sd, f"{p}.cpe.0", t, h, w)
            y = _ln(t, sd, f"{p}.norm1", 1e-5)
            qkv = F.linear(y, sd[f"{p}.attn.qkv.weight"],
                           sd[f"{p}.attn.qkv.bias"])
            l = qkv.shape[1]
            q, k, v = qkv.reshape(n, l, 3, heads, d).permute(
                2, 0, 3, 1, 4).unbind(0)
            attn = ((q * d ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
            y = (attn @ v).transpose(1, 2).reshape(n, l, c)
            y = F.linear(y, sd[f"{p}.attn.proj.weight"],
                         sd[f"{p}.attn.proj.bias"])
            t = t + y
            t = _davit_cpe(sd, f"{p}.cpe.1", t, h, w)
            y = _ln(t, sd, f"{p}.norm2", 1e-5)
            y = F.gelu(F.linear(y, sd[f"{p}.mlp.fc1.weight"],
                                sd[f"{p}.mlp.fc1.bias"]))
            t = t + F.linear(y, sd[f"{p}.mlp.fc2.weight"],
                             sd[f"{p}.mlp.fc2.bias"])
            # channel block
            p = f"main_blocks.{s}.{b}.1"
            t = _davit_cpe(sd, f"{p}.cpe.0", t, h, w)
            y = _ln(t, sd, f"{p}.norm1", 1e-5)
            qkv = F.linear(y, sd[f"{p}.attn.qkv.weight"],
                           sd[f"{p}.attn.qkv.bias"])
            q, k, v = qkv.reshape(n, l, 3, heads, d).permute(
                2, 0, 3, 1, 4).unbind(0)
            k = k * d ** -0.5
            attn = (k.transpose(-2, -1) @ v).softmax(-1)   # (n, h, d, d)
            y = (q @ attn).transpose(1, 2).reshape(n, l, c)
            y = F.linear(y, sd[f"{p}.attn.proj.weight"],
                         sd[f"{p}.attn.proj.bias"])
            t = t + y
            t = _davit_cpe(sd, f"{p}.cpe.1", t, h, w)
            y = _ln(t, sd, f"{p}.norm2", 1e-5)
            y = F.gelu(F.linear(y, sd[f"{p}.mlp.fc1.weight"],
                                sd[f"{p}.mlp.fc1.bias"]))
            t = t + F.linear(y, sd[f"{p}.mlp.fc2.weight"],
                             sd[f"{p}.mlp.fc2.bias"])
        x = t.transpose(1, 2).reshape(n, c, h, w)
    out = t.reshape(n, h, w, c)
    return _ln(out, sd, "norm", 1e-5)


def test_davit_forward_matches_torch_oracle():
    gen = np.random.default_rng(22)
    sd = _davit_sd(gen)
    model = DaViT(embed_dims=DIMS_D, num_heads=HEADS_D, depths=DEPTHS_D,
                  window_size=WS_D, drop_path_rate=0.0)
    x_np = gen.normal(0, 1, (2, 3, IMG_D, IMG_D)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, False)
    converted, report = convert_state_dict("davit_t", sd, variables)
    assert not report.missing, report.missing
    assert not report.unused, report.unused

    with torch.no_grad():
        theirs = _davit_torch_forward(sd, torch.from_numpy(x_np)).numpy()
    ours = np.asarray(model.apply(converted, xin, False))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
