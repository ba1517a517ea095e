"""Torch/timm checkpoint -> Flax pytree converter.

The reference loads timm checkpoints through ``build_model_with_cfg``
(reference: torchok/models/backbones/resnet.py:566-569,
base_backbone.py); here a user converts the same ``state_dict`` into the
msgpack cache that :mod:`torchok_tpu.utils.pretrained` reads::

    python tools/convert_weights.py --name resnet18 --checkpoint r18.pth

Design: walk OUR Flax variable tree (the authoritative structure), derive
candidate torch keys for each leaf via a per-family path mapper, fetch the
tensor and adapt its memory layout (conv OIHW->HWIO, linear transpose, BN
running stats -> ``batch_stats``). Anything unmatched is reported, never
silently skipped.
"""
from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# --------------------------------------------------------------------------
# layout adaptation


def fit_tensor(t: np.ndarray, target_shape: Tuple[int, ...], key: str,
               is_kernel: bool = False) -> np.ndarray:
    """Adapt a torch tensor's memory layout to a Flax leaf shape.

    ``is_kernel`` must be True for conv/dense weights: those ALWAYS get the
    layout transform even when the torch and Flax shapes coincide (square
    dense matrices, symmetric convs) — shape equality alone cannot detect
    the needed transpose.
    """
    t = np.asarray(t)
    target = tuple(target_shape)
    if is_kernel:
        if t.ndim == 4 and t.shape[2:] == (7, 7) and len(target) == 4 \
                and target == (4, 4, 4 * t.shape[1], t.shape[0]):
            # 7x7 stem kernel into a space_to_depth_stem model (resnet.py):
            # OIHW -> HWIO, then the exact s2d kernel repacking
            from torchok_tpu.models.backbones.resnet import \
                stem7x7_to_space_to_depth
            return stem7x7_to_space_to_depth(t.transpose(2, 3, 1, 0))
        if t.ndim == 4 and len(target) == 4 and t.transpose(2, 3, 1, 0).shape == target:
            return t.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
        if t.ndim == 2 and len(target) == 2 and t.T.shape == target:
            return t.T  # linear (out, in) -> (in, out)
        if t.ndim == 3 and len(target) == 3 and t.transpose(2, 1, 0).shape == target:
            return t.transpose(2, 1, 0)  # conv1d (out, in, k) -> (k, in, out)
        if t.ndim == 4 and t.shape[2] == t.shape[3] == 1 and len(target) == 2 \
                and t[:, :, 0, 0].T.shape == target:
            return t[:, :, 0, 0].T  # 1x1 conv -> dense
        if t.ndim == 2 and len(target) == 4 and target[:2] == (1, 1) \
                and t.T.shape == target[2:]:
            return t.T.reshape(target)  # dense -> 1x1 conv
    if t.shape == target:
        return t
    if t.size == int(np.prod(target)) and t.squeeze().shape == tuple(
            s for s in target if s != 1):
        return t.reshape(target)  # pure singleton-axis mismatch
    raise ValueError(
        f"cannot fit torch tensor of shape {t.shape} into Flax leaf "
        f"{target} for {key!r}")


# --------------------------------------------------------------------------
# per-family path mappers: flax path tokens -> list of candidate torch keys

_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias",
         "mean": "running_mean", "var": "running_var"}


def _leaf(tok: str) -> str:
    return _LEAF.get(tok, tok)


def _expand(paths: List[List[str]], *variants: Sequence[str]) -> List[List[str]]:
    return [p + list(v) for p in paths for v in variants]


def map_resnet(parts: Sequence[str]) -> List[str]:
    """resnet/resnext/seresnet/ecaresnet/resnetrs stem + stages.

    timm naming: conv1/bn1 (or deep stem conv1.{0,3,6} + bn1),
    layer{X}.{Y}.conv{N}/bn{N}/downsample.{0,1}/se/eca."""
    out: List[List[str]] = [[]]
    parts = list(parts)
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.fullmatch(r"layer(\d+)_(\d+)", p)
        if m:
            out = _expand(out, [f"layer{m[1]}", m[2]])
        elif p == "downsample":
            nxt = parts[i + 1]
            # timm: downsample.0 = conv (or 1 after avgpool), downsample.1 = bn
            if nxt == "conv":
                out = _expand(out, ["downsample", "0"], ["downsample", "1"])
            else:
                out = _expand(out, ["downsample", "1"], ["downsample", "2"])
            i += 2
            continue
        elif re.fullmatch(r"conv1_(\d+)", p):  # deep stem: conv1_{k} -> conv1.{3k}
            k = int(p.split("_")[1])
            out = _expand(out, ["conv1", str(3 * k)])
        elif re.fullmatch(r"bn1_(\d+)", p):  # deep stem bn: bn1_{k} -> conv1.{3k+1}
            k = int(p.split("_")[1])
            out = _expand(out, ["conv1", str(3 * k + 1)])
        elif p == "stem_pool_conv":  # resnetrs replace_stem_pool
            out = _expand(out, ["maxpool", "0"])
        elif p == "stem_pool_bn":
            out = _expand(out, ["maxpool", "1"])
        elif p == "se" and i + 1 < len(parts) and parts[i + 1] in ("fc1", "fc2"):
            alt = {"fc1": "conv_reduce", "fc2": "conv_expand"}[parts[i + 1]]
            out = _expand(out, ["se", parts[i + 1]], ["se", alt])
            i += 2
            continue
        else:
            out = _expand(out, [p])
        i += 1
    return [".".join(p[:-1] + [_leaf(p[-1])]) for p in out]


def map_efficientnet(parts: Sequence[str]) -> List[str]:
    """efficientnet/mobilenetv3/mixnet/tinynet/lcnet/fbnetv3 (timm naming)."""
    out: List[List[str]] = [[]]
    parts = list(parts)
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.fullmatch(r"blocks_(\d+)_(\d+)", p)
        if m:
            out = _expand(out, ["blocks", m[1], m[2]])
        elif p == "se" and i + 1 < len(parts) and parts[i + 1] in ("fc1", "fc2"):
            alt = {"fc1": "conv_reduce", "fc2": "conv_expand"}[parts[i + 1]]
            out = _expand(out, ["se", alt], ["se", parts[i + 1]])
            i += 2
            continue
        elif p == "bn" and i == len(parts) - 2:
            # timm ConvBnAct ('cn' stage blocks) names its norm 'bn1'
            out = _expand(out, ["bn1"], ["bn"])
        else:
            out = _expand(out, [p])
        i += 1
    return [".".join(p[:-1] + [_leaf(p[-1])]) for p in out]


def map_mobilenetv3(parts: Sequence[str]) -> List[str]:
    """mobilenetv3/lcnet/fbnetv3: efficientnet naming, EXCEPT timm builds the
    final pre-pool 1x1 conv as a trailing ConvBnAct *stage*
    (``blocks.{N}.0.conv`` / ``blocks.{N}.0.bn1``) while this package keeps
    it as top-level ``conv_head``/``bn2`` (the post-pool timm ``conv_head``
    is classifier territory and is not part of the backbone)."""
    parts = list(parts)
    if len(parts) == 2 and parts[0] in ("conv_head", "bn2"):
        leaf = _leaf(parts[1])
        sub = "conv" if parts[0] == "conv_head" else "bn1"
        # the trailing ConvBnAct stage is always the LAST block group; scan
        # descending so an earlier block's same-named norm can never shadow
        # it by shape coincidence
        cands = [f"blocks.{i}.0.{sub}.{leaf}" for i in range(8, 0, -1)]
        return cands + [f"{parts[0]}.{leaf}"]
    return map_efficientnet(parts)


def map_hrnet(parts: Sequence[str]) -> List[str]:
    """hrnet (timm naming): stage{S}.{M}.branches.{B}.{K}, fuse_layers,
    transition{N} (plain or nested Sequential for new branches)."""
    out: List[List[str]] = [[]]
    parts = list(parts)
    i = 0
    while i < len(parts):
        p = parts[i]
        if (m := re.fullmatch(r"layer(\d+)_(\d+)", p)):
            out = _expand(out, [f"layer{m[1]}", m[2]])
        elif (m := re.fullmatch(r"stage(\d+)_(\d+)", p)):
            out = _expand(out, [f"stage{m[1]}", m[2]])
        elif (m := re.fullmatch(r"branch_(\d+)_block_(\d+)", p)):
            out = _expand(out, ["branches", m[1], m[2]])
        elif p == "downsample":
            nxt = parts[i + 1]
            out = _expand(out, ["downsample", "0" if nxt == "conv" else "1"])
            i += 2
            continue
        elif p == "fuse":
            nxt = parts[i + 1]
            if (m := re.fullmatch(r"fuse_(\d+)_(\d+)_(\d+)_(conv|bn)", nxt)):
                sub = "0" if m[4] == "conv" else "1"
                out = _expand(out, ["fuse_layers", m[1], m[2], m[3], sub])
            elif (m := re.fullmatch(r"fuse_(\d+)_(\d+)_(conv|bn)", nxt)):
                sub = "0" if m[3] == "conv" else "1"
                out = _expand(out, ["fuse_layers", m[1], m[2], sub])
            else:  # pragma: no cover
                out = _expand(out, ["fuse_layers", nxt])
            i += 2
            continue
        elif (m := re.fullmatch(r"transition(\d+)", p)):
            nxt = parts[i + 1]
            mm = re.fullmatch(r"t_(\d+)_(conv|bn)", nxt)
            sub = "0" if mm[2] == "conv" else "1"
            # plain Sequential(conv,bn,relu) for existing branches; nested
            # Sequential(Sequential(conv,bn,relu)) for a new branch
            out = _expand(out, [f"transition{m[1]}", mm[1], sub],
                          [f"transition{m[1]}", mm[1], "0", sub])
            i += 2
            continue
        else:
            out = _expand(out, [p])
        i += 1
    return [".".join(p[:-1] + [_leaf(p[-1])]) for p in out]


def map_swin(parts: Sequence[str]) -> List[str]:
    """swinv2 (timm/reference naming, reference swin.py:174)."""
    out: List[List[str]] = [[]]
    for p in parts:
        if (m := re.fullmatch(r"layers_(\d+)_blocks_(\d+)", p)):
            out = _expand(out, ["layers", m[1], "blocks", m[2]])
        elif (m := re.fullmatch(r"layers_(\d+)_downsample", p)):
            out = _expand(out, ["layers", m[1], "downsample"])
        elif (m := re.fullmatch(r"cpb_mlp_(\d+)", p)):  # cpb_mlp_0 -> .0, _1 -> .2
            out = _expand(out, ["cpb_mlp", str(2 * int(m[1]))])
        elif (m := re.fullmatch(r"feature_norms_(\d+)", p)):
            out = _expand(out, ["feature_norms", m[1]])
        elif p == "patch_embed":
            out = _expand(out, ["patch_embed", "proj"])
        elif p == "patch_norm":
            out = _expand(out, ["patch_embed", "norm"])
        else:
            out = _expand(out, [p])
    return [".".join(p[:-1] + [_leaf(p[-1])]) for p in out]


def map_vit(parts: Sequence[str]) -> List[str]:
    """vit / beit (timm naming)."""
    out: List[List[str]] = [[]]
    for p in parts:
        if (m := re.fullmatch(r"blocks_(\d+)", p)):
            out = _expand(out, ["blocks", m[1]])
        elif (m := re.fullmatch(r"gamma_(\d+)", p)):
            out = _expand(out, [f"gamma_{m[1]}"])
        elif p == "rel_pos_bias":
            continue  # beit: table lives directly under attn in torch keys
        elif p == "patch_embed" and len(parts) == 2:
            # beit flax names the stem conv 'patch_embed' directly
            out = _expand(out, ["patch_embed", "proj"])
        else:
            out = _expand(out, [p])
    keys = [".".join(p[:-1] + [_leaf(p[-1])]) for p in out]
    # vit patch_embed/proj is already nested: dedupe accidental double proj
    return [k.replace("proj.proj.", "proj.") for k in keys]


def map_davit(parts: Sequence[str]) -> List[str]:
    """davit (reference naming, davit.py:412-456): main_blocks.{S}.{B}.{t}
    with t: 0=spatial, 1=channel; patch_embeds.{i}; per-stage norm{i}."""
    out: List[List[str]] = [[]]
    for p in parts:
        if (m := re.fullmatch(r"stage_(\d+)_(spatial|channel)_(\d+)", p)):
            t = "0" if m[2] == "spatial" else "1"
            out = _expand(out, ["main_blocks", m[1], m[3], t])
        elif (m := re.fullmatch(r"patch_embed_(\d+)", p)):
            out = _expand(out, ["patch_embeds", m[1], "proj"])
        elif (m := re.fullmatch(r"patch_norm_(\d+)", p)):
            out = _expand(out, ["patch_embeds", m[1], "norm"])
        elif (m := re.fullmatch(r"cpe(\d+)", p)):
            out = _expand(out, ["cpe", str(int(m[1]) - 1)])
        elif p == "norm":
            out = _expand(out, ["norm3"], ["norms", "3"], ["norm"])
        else:
            out = _expand(out, [p])
    return [".".join(p[:-1] + [_leaf(p[-1])]) for p in out]


def map_gcvit(parts: Sequence[str]) -> List[str]:
    """gcvit (timm naming via reference gcvit.py:18 — the reference imports
    ``timm.models.gcvit`` Stem/GlobalContextVitStage directly).

    The Flax module tree (models/backbones/gcvit.py) mirrors timm 0.6.x's
    layout, so the map is near-identity: ``stages_{i}`` -> ``stages.{i}``,
    ``blocks_{b}`` -> ``blocks.{b}``, and the FeatureBlock's ``conv{j}``
    children sit under an nn.Sequential named ``blocks`` in timm
    (``global_block.blocks.conv{j}``). Torch-oracle forward equivalence:
    tests/test_torch_convert_gcvit.py."""
    out: List[List[str]] = [[]]
    prev = ""
    for p in parts:
        if (m := re.fullmatch(r"stages_(\d+)", p)):
            out = _expand(out, ["stages", m[1]])
        elif (m := re.fullmatch(r"blocks_(\d+)", p)):
            out = _expand(out, ["blocks", m[1]])
        elif prev == "global_block" and re.fullmatch(r"conv\d+", p):
            out = _expand(out, ["blocks", p])
        else:
            out = _expand(out, [p])
        prev = p
    return [".".join(p[:-1] + [_leaf(p[-1])]) for p in out]


_FAMILY_MAPPERS: List[Tuple[str, Callable[[Sequence[str]], List[str]]]] = [
    (r"^(resnet|resnext|seresne|ecaresne|ssl_|swsl_|ig_|gluon_|tv_|wide_)", map_resnet),
    (r"^(efficientnet|tf_efficientnet|mnasnet|semnasnet|mobilenetv2|mixnet|"
     r"tinynet|tf_mixnet|spnasnet|fbnetc|eca_efficientnet|gc_efficientnet)", map_efficientnet),
    (r"^(mobilenetv3|tf_mobilenetv3|fbnetv3|lcnet|tf_lcnet)", map_mobilenetv3),
    (r"^hrnet", map_hrnet),
    (r"^swinv2", map_swin),
    (r"^(vit_|deit)", map_vit),
    (r"^beit", map_vit),
    (r"^davit", map_davit),
    (r"^gcvit", map_gcvit),
]


def mapper_for(name: str) -> Callable[[Sequence[str]], List[str]]:
    for pat, fn in _FAMILY_MAPPERS:
        if re.match(pat, name):
            return fn
    # resnet naming is the default for the remaining resnet-derived variants
    return map_resnet


# --------------------------------------------------------------------------
# conversion driver


@dataclass
class ConversionReport:
    converted: int = 0
    missing: List[str] = field(default_factory=list)   # flax leaves left at init
    unused: List[str] = field(default_factory=list)    # torch keys never read

    def summary(self) -> str:
        return (f"{self.converted} leaves converted, "
                f"{len(self.missing)} missing, {len(self.unused)} torch keys unused")


_SKIP_TORCH = re.compile(
    r"(^|\.)(fc|head|classifier)\.(weight|bias)$"          # classifier head
    r"|num_batches_tracked$"                               # BN step counter
    r"|(^|\.)relative_(position|coords)_(index|table)$"    # recomputed buffers
    r"|attn_mask$")


def convert_state_dict(name: str, state_dict: Dict[str, Any],
                       variables: Dict[str, Any],
                       strict: bool = False) -> Tuple[Dict[str, Any], ConversionReport]:
    """Convert a torch ``state_dict`` into a copy of ``variables``.

    ``variables`` is the Flax variable dict (params + batch_stats + ...)
    of the target backbone, used as the structural template.
    """
    import jax
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    mapper = mapper_for(name)
    sd = {k: v for k, v in state_dict.items()}
    report = ConversionReport()
    used = set()

    flat, treedef = tree_flatten_with_path(variables)
    new_leaves = []
    for path, leaf in flat:
        tokens = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        collection, parts = tokens[0], tokens[1:]
        if collection not in ("params", "batch_stats"):
            new_leaves.append(leaf)
            continue
        candidates = mapper(parts)
        # first candidate that exists AND fits: a name collision with an
        # incompatible tensor (e.g. timm mobilenetv3's post-pool conv_head vs
        # the backbone's pre-pool one) must not shadow the real source
        fitted, hit, fit_err = None, None, None
        for k in candidates:
            if k not in sd:
                continue
            t = sd[k]
            if hasattr(t, "detach"):  # torch tensor w/o importing torch here
                t = t.detach().cpu().numpy()
            try:
                fitted = fit_tensor(np.asarray(t, np.float32), np.shape(leaf),
                                    "/".join(tokens),
                                    is_kernel=parts[-1] == "kernel")
                hit = k
                break
            except ValueError as e:
                fit_err = e
        if hit is None:
            if fit_err is not None:
                # a mapped source tensor EXISTED but no candidate fit the
                # target shape — that is a wrong key map or an architecture
                # mismatch, not an absent weight; silently shipping an
                # init-valued leaf here would train/eval with garbage
                raise ValueError(
                    f"convert({name}): mapped tensor for "
                    f"{'/'.join(tokens)} has an incompatible shape "
                    f"({fit_err}); candidates tried: "
                    f"{[k for k in candidates if k in sd][:4]}")
            report.missing.append("/".join(tokens))
            new_leaves.append(leaf)
            continue
        new_leaves.append(fitted.astype(np.asarray(leaf).dtype
                                        if hasattr(leaf, "dtype") else np.float32))
        used.add(hit)
        report.converted += 1

    report.unused = sorted(k for k in sd if k not in used
                           and not _SKIP_TORCH.search(k))
    if report.missing:
        logger.warning("convert(%s): %d Flax leaves had no torch source: %s",
                       name, len(report.missing), report.missing[:8])
    if report.unused:
        logger.warning("convert(%s): %d torch keys unused: %s",
                       name, len(report.unused), report.unused[:8])
    if strict and (report.missing or report.unused):
        raise ValueError(f"strict conversion failed for {name}: "
                         f"missing={report.missing[:5]} unused={report.unused[:5]}")
    return tree_unflatten(treedef, new_leaves), report


def convert_checkpoint(name: str, checkpoint_path: str,
                       out_path: Optional[str] = None,
                       image_size: int = 224,
                       strict: bool = False) -> Tuple[str, ConversionReport]:
    """Load a .pth checkpoint, convert it for backbone ``name``, and write the
    msgpack the pretrained cache reads. Returns (output path, report)."""
    import jax
    import jax.numpy as jnp
    import torch

    import torchok_tpu  # noqa: F401 - registers backbones
    from flax import serialization
    from torchok_tpu.constructor import BACKBONES
    from torchok_tpu.utils.pretrained import weights_dir

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {re.sub(r"^(module|model)\.", "", k): v for k, v in sd.items()}

    model = BACKBONES.get(name)(pretrained=False, in_channels=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, image_size, image_size, 3), jnp.float32))
    converted, report = convert_state_dict(name, sd, variables, strict=strict)

    if out_path is None:
        weights_dir().mkdir(parents=True, exist_ok=True)
        out_path = str(weights_dir() / f"{name}.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(converted))
    logger.info("wrote %s (%s)", out_path, report.summary())
    return out_path, report
