"""Detection neck zoo — native Flax/NHWC re-implementations of the mmdet
necks the reference re-registers (reference:
torchok/models/necks/detection/mmdet_necks.py:6-20 registers BFP,
ChannelMapper, HRFPN, NASFPN, FPN_CARAFE, PAFPN, NASFCOS_FPN, YOLOV3Neck,
DilatedEncoder, CTResNetNeck, RFP, FPG, SSDNeck, YOLOXPAFPN, DyHead).

Design notes (TPU-first, not translations):

* every neck is a Flax module over NHWC pyramids, static shapes, no python
  control flow on tensor values — jit/pjit clean;
* ops the originals implement with CUDA kernels map to XLA-native forms:
  CARAFE's content-aware reassembly uses ``conv_general_dilated_patches``
  (an MXU-friendly unfold) instead of a custom kernel; deformable convs
  (NASFCOS/DyHead/CTResNetNeck originals) use the first-party DCNv2 op
  (ops/deform_conv.py: corner-gather bilinear sampling + one einsum
  contraction on the MXU, loop-oracle-verified) — ``use_dcn=False`` swaps
  in a dense 3x3 conv where raw throughput matters more than parity;
* RFP here is a fixed-depth unrolled refinement (ASPP feedback + gated
  fusion) rather than re-running the backbone: recursion into the backbone
  belongs to the model, not the neck, in a functional framework.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchok_tpu.constructor import DETECTION_NECKS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.ops.deform_conv import ModulatedDeformConv
from torchok_tpu.ops.image import (adaptive_avg_pool, avg_pool, max_pool,
                                   resize_bilinear, resize_nearest)


def _conv(ch, k=3, s=1, name=None, dtype=None):
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    return nn.Conv(ch, (k, k), strides=(s, s), padding=pad, dtype=dtype, name=name)


class _ConvGNReLU(nn.Module):
    """conv + GroupNorm + ReLU block (mmdet necks default to GN/BN+ReLU)."""
    channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 32
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _conv(self.channels, self.kernel, self.stride, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(self.groups, self.channels),
                         dtype=self.dtype)(x)
        return nn.relu(x) if self.act else x


@DETECTION_NECKS.register_class
class ChannelMapper(BaseModel):
    """1x1 (or kxk) conv per level mapping every input to ``out_channels``."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    kernel_size: int = 3
    num_outs: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        outs = [
            _ConvGNReLU(self.out_channels, self.kernel_size, dtype=self.dtype,
                        name=f"map_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        num_outs = self.num_outs or len(outs)
        x = inputs[-1]
        for i in range(num_outs - len(outs)):
            x = _ConvGNReLU(self.out_channels, 3, stride=2, dtype=self.dtype,
                            name=f"extra_{i}")(x)
            outs.append(x)
        return outs


@DETECTION_NECKS.register_class
class BFP(BaseModel):
    """Balanced Feature Pyramid (Libra R-CNN): gather levels at the refine
    level, average, refine with a conv, scatter back residually."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    refine_level: int = 2
    refine_type: Optional[str] = "conv"  # None | 'conv' (non_local -> conv)
    num_levels: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        n = len(inputs)
        ref_h, ref_w = inputs[self.refine_level].shape[1:3]
        gathered = []
        for x in inputs:
            if x.shape[1] > ref_h:
                x = adaptive_avg_pool(x, (ref_h, ref_w))
            elif x.shape[1] < ref_h:
                x = resize_nearest(x, (ref_h, ref_w))
            gathered.append(x)
        bsf = sum(gathered) / n
        if self.refine_type == "conv":
            bsf = _conv(self.out_channels, 3, name="refine", dtype=self.dtype)(bsf)
        outs = []
        for i, x in enumerate(inputs):
            h, w = x.shape[1:3]
            if h >= ref_h:
                r = resize_nearest(bsf, (h, w))
            else:
                r = adaptive_avg_pool(bsf, (h, w))
            outs.append(x + r)
        return outs


@DETECTION_NECKS.register_class
class HRFPN(BaseModel):
    """HRNet FPN: concat all branches at the finest resolution, reduce 1x1,
    derive ``num_outs`` levels by average pooling + per-level 3x3 conv."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    pooling_type: str = "AVG"
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        h, w = inputs[0].shape[1:3]
        up = [inputs[0]] + [resize_bilinear(x, (h, w)) for x in inputs[1:]]
        feat = jnp.concatenate(up, axis=-1)
        feat = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="reduction")(feat)
        pool = avg_pool if self.pooling_type == "AVG" else max_pool
        outs = [feat]
        for i in range(1, self.num_outs):
            outs.append(pool(feat, window=2 ** i, stride=2 ** i, padding=0))
        return [
            _conv(self.out_channels, 3, name=f"fpn_conv_{i}",
                  dtype=self.dtype)(x)
            for i, x in enumerate(outs)
        ]


@DETECTION_NECKS.register_class
class PAFPN(BaseModel):
    """Path Aggregation FPN: FPN top-down + an extra bottom-up path."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_nearest(laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + up
        inter = [
            _conv(self.out_channels, 3, name=f"fpn_conv_{i}",
                  dtype=self.dtype)(laterals[i])
            for i in range(len(laterals))
        ]
        # bottom-up augmentation
        for i in range(len(inter) - 1):
            down = _conv(self.out_channels, 3, s=2, name=f"down_conv_{i}",
                         dtype=self.dtype)(inter[i])
            inter[i + 1] = inter[i + 1] + down
        outs = [inter[0]] + [
            _conv(self.out_channels, 3, name=f"pafpn_conv_{i}",
                  dtype=self.dtype)(inter[i])
            for i in range(1, len(inter))
        ]
        while len(outs) < self.num_outs:
            outs.append(max_pool(outs[-1], window=1, stride=2, padding=0))
        return outs


class _NASFPNCell(nn.Module):
    """NAS-FPN merging cell: resize both inputs to the output resolution,
    combine (sum or global-pool attention), then 3x3 conv."""
    channels: int
    mode: str = "sum"  # 'sum' | 'gp'
    dtype: Any = None

    @nn.compact
    def __call__(self, a, b, out_hw):
        def fit(x):
            if x.shape[1:3] == tuple(out_hw):
                return x
            if x.shape[1] > out_hw[0]:
                return adaptive_avg_pool(x, tuple(out_hw))
            return resize_nearest(x, tuple(out_hw))
        a, b = fit(a), fit(b)
        if self.mode == "gp":
            gate = jax.nn.sigmoid(adaptive_avg_pool(b, 1))
            merged = a * gate + b
        else:
            merged = a + b
        merged = nn.relu(merged)
        merged = _conv(self.channels, 3, dtype=self.dtype)(merged)
        return nn.GroupNorm(num_groups=min(32, self.channels),
                            dtype=self.dtype)(merged)


@DETECTION_NECKS.register_class
class NASFPN(BaseModel):
    """NAS-FPN: ``stack_times`` repetitions of the searched 7-cell merging
    topology over a 5-level pyramid."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        while len(feats) < self.num_outs:
            feats.append(max_pool(feats[-1], window=1, stride=2, padding=0))
        # p3..p7
        for s in range(self.stack_times):
            p3, p4, p5, p6, p7 = feats[-5:]
            hw = lambda x: x.shape[1:3]
            gp64_4 = _NASFPNCell(self.out_channels, "gp", self.dtype,
                                 name=f"s{s}_gp64_4")(p6, p4, hw(p4))
            sum44_4 = _NASFPNCell(self.out_channels, "sum", self.dtype,
                                  name=f"s{s}_sum44_4")(gp64_4, p4, hw(p4))
            sum43_3 = _NASFPNCell(self.out_channels, "sum", self.dtype,
                                  name=f"s{s}_sum43_3")(sum44_4, p3, hw(p3))
            sum34_4 = _NASFPNCell(self.out_channels, "sum", self.dtype,
                                  name=f"s{s}_sum34_4")(sum43_3, sum44_4, hw(p4))
            gp43_5 = _NASFPNCell(self.out_channels, "gp", self.dtype,
                                 name=f"s{s}_gp43_5")(sum34_4, sum43_3, hw(p5))
            sum55_5 = _NASFPNCell(self.out_channels, "sum", self.dtype,
                                  name=f"s{s}_sum55_5")(gp43_5, p5, hw(p5))
            gp54_7 = _NASFPNCell(self.out_channels, "gp", self.dtype,
                                 name=f"s{s}_gp54_7")(sum55_5, sum34_4, hw(p7))
            sum77_7 = _NASFPNCell(self.out_channels, "sum", self.dtype,
                                  name=f"s{s}_sum77_7")(gp54_7, p7, hw(p7))
            gp75_6 = _NASFPNCell(self.out_channels, "gp", self.dtype,
                                 name=f"s{s}_gp75_6")(sum77_7, sum55_5, hw(p6))
            feats = [sum43_3, sum34_4, sum55_5, gp75_6, sum77_7]
        return feats


@DETECTION_NECKS.register_class
class NASFCOS_FPN(BaseModel):
    """NAS-FCOS FPN: FPN laterals + searched merge blocks using DCNv2
    (ops/deform_conv.py), matching the original's deformable convs;
    ``use_dcn=False`` falls back to separable 3x3."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    use_dcn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_nearest(laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + up
        outs = []
        for i, x in enumerate(laterals):
            if self.use_dcn:
                y = ModulatedDeformConv(self.out_channels, dtype=self.dtype,
                                        use_bias=False,
                                        name=f"dcn_{i}")(x)
            else:
                y = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                            feature_group_count=self.out_channels, dtype=self.dtype,
                            name=f"sep_dw_{i}")(x)
                y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"sep_pw_{i}")(y)
            y = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"sep_gn_{i}")(y)
            outs.append(nn.relu(y) + x)
        x = outs[-1]
        for i in range(self.num_outs - len(outs)):
            x = _conv(self.out_channels, 3, s=2, name=f"extra_{i}",
                      dtype=self.dtype)(x)
            outs.append(x)
        return outs


def _carafe_upsample(x, kernels, up: int, k_up: int):
    """Content-aware reassembly (CARAFE): reassemble k_up x k_up neighborhoods
    of ``x`` with predicted per-position kernels, upsampling by ``up``.

    x: (N, H, W, C); kernels: (N, up*H, up*W, k_up*k_up) softmax-normalized.
    Uses conv_general_dilated_patches — an im2col the TPU executes as
    MXU-friendly strided loads — instead of the CUDA kernel of the original.
    """
    n, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(k_up, k_up), window_strides=(1, 1),
        padding=((k_up // 2, k_up // 2), (k_up // 2, k_up // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches: (N, H, W, C*k_up*k_up) with channel-major layout (c, ky, kx)
    patches = patches.reshape(n, h, w, c, k_up * k_up)
    patches = resize_nearest(patches.reshape(n, h, w, -1), (up * h, up * w))
    patches = patches.reshape(n, up * h, up * w, c, k_up * k_up)
    return jnp.einsum("nhwck,nhwk->nhwc", patches, kernels)


@DETECTION_NECKS.register_class
class FPN_CARAFE(BaseModel):
    """FPN with CARAFE content-aware upsampling in the top-down path."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            src = laterals[i]
            up = 2
            comp = nn.Conv(self.compressed_channels, (1, 1), dtype=self.dtype,
                           name=f"carafe_comp_{i}")(src)
            k = self.encoder_kernel
            kernels = nn.Conv(up * up * self.up_kernel ** 2, (k, k),
                              padding=((k // 2, k // 2), (k // 2, k // 2)),
                              dtype=self.dtype, name=f"carafe_enc_{i}")(comp)
            n, h, w, _ = kernels.shape
            kernels = kernels.reshape(n, h, w, up, up, self.up_kernel ** 2)
            kernels = kernels.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, h * up, w * up, self.up_kernel ** 2)
            kernels = jax.nn.softmax(kernels, axis=-1)
            upsampled = _carafe_upsample(src, kernels, up, self.up_kernel)
            th, tw = laterals[i - 1].shape[1:3]
            if upsampled.shape[1:3] != (th, tw):
                upsampled = upsampled[:, :th, :tw]
            laterals[i - 1] = laterals[i - 1] + upsampled
        outs = [
            _conv(self.out_channels, 3, name=f"fpn_conv_{i}",
                  dtype=self.dtype)(laterals[i])
            for i in range(len(laterals))
        ]
        while len(outs) < self.num_outs:
            outs.append(max_pool(outs[-1], window=1, stride=2, padding=0))
        return outs


class _YoloDetectionBlock(nn.Module):
    """YOLOv3 detection block: five alternating 1x1/3x3 convs."""
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, k in enumerate([1, 3, 1, 3, 1]):
            ch = self.channels if k == 1 else self.channels * 2
            x = _conv(ch, k, name=f"conv{i}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.leaky_relu(x, 0.1)
        return x


@DETECTION_NECKS.register_class
class YOLOV3Neck(BaseModel):
    """YOLOv3 neck: detection blocks with top-down 1x1+upsample+concat."""
    in_channels: Tuple[int, ...] = (256, 512, 1024)
    out_channels: Tuple[int, ...] = (128, 256, 512)
    num_scales: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        # deepest first (mmdet convention feeds C5, C4, C3)
        feats = list(inputs[-self.num_scales:])[::-1]
        out_chs = list(self.out_channels)[::-1] if isinstance(
            self.out_channels, (list, tuple)) else \
            [self.out_channels] * self.num_scales
        outs = []
        x = _YoloDetectionBlock(out_chs[0], self.dtype, name="detect0")(feats[0])
        outs.append(x)
        for i in range(1, self.num_scales):
            lat = _conv(out_chs[i], 1, name=f"conv{i}", dtype=self.dtype)(x)
            lat = resize_nearest(lat, feats[i].shape[1:3])
            x = jnp.concatenate([lat, feats[i]], axis=-1)
            x = _YoloDetectionBlock(out_chs[i], self.dtype,
                                    name=f"detect{i}")(x)
            outs.append(x)
        return outs[::-1]  # shallow -> deep


@DETECTION_NECKS.register_class
class DilatedEncoder(BaseModel):
    """YOLOF dilated encoder on the single C5 level: lateral 1x1 + 3x3, then
    four dilated residual bottlenecks."""
    in_channels: Tuple[int, ...] = (2048,)
    out_channels: int = 512
    block_mid_channels: int = 128
    num_residual_blocks: int = 4
    block_dilations: Tuple[int, ...] = (2, 4, 6, 8)
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        x = inputs[-1]
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="lateral")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="lateral_bn")(x)
        x = _conv(self.out_channels, 3, name="fpn_conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="fpn_bn")(x)
        for i in range(self.num_residual_blocks):
            d = self.block_dilations[i % len(self.block_dilations)]
            y = nn.Conv(self.block_mid_channels, (1, 1), dtype=self.dtype,
                        name=f"res{i}_reduce")(x)
            y = nn.relu(y)
            y = nn.Conv(self.block_mid_channels, (3, 3),
                        kernel_dilation=(d, d), padding=((d, d), (d, d)),
                        dtype=self.dtype, name=f"res{i}_dil")(y)
            y = nn.relu(y)
            y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"res{i}_expand")(y)
            x = x + nn.relu(y)
        return [x]


@DETECTION_NECKS.register_class
class CTResNetNeck(BaseModel):
    """CenterNet neck: three upsampling stages (DCNv2 pre-conv +
    transpose-conv), matching the original's mmcv ModulatedDeformConv2d;
    ``use_dcn=False`` falls back to a dense 3x3."""
    in_channels: Tuple[int, ...] = (2048,)
    num_deconv_filters: Tuple[int, ...] = (256, 128, 64)
    num_deconv_kernels: Tuple[int, ...] = (4, 4, 4)
    use_dcn: bool = True
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.num_deconv_filters[-1]

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        x = inputs[-1]
        for i, ch in enumerate(self.num_deconv_filters):
            if self.use_dcn:
                x = ModulatedDeformConv(ch, use_bias=False, dtype=self.dtype,
                                        name=f"pre_dcn_{i}")(x)
            else:
                x = _conv(ch, 3, name=f"pre_conv_{i}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name=f"pre_bn_{i}")(x)
            x = nn.relu(x)
            k = self.num_deconv_kernels[i]
            x = nn.ConvTranspose(ch, (k, k), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"deconv_{i}")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name=f"deconv_bn_{i}")(x)
            x = nn.relu(x)
        return [x]


@DETECTION_NECKS.register_class
class SSDNeck(BaseModel):
    """SSD extra layers: alternating 1x1/3x3-s2 downsampling stages appended
    after the backbone levels, with optional L2-norm rescaling of the first."""
    in_channels: Tuple[int, ...] = (512, 1024)
    out_channels: Tuple[int, ...] = (512, 1024, 512, 256, 256, 256)
    level_strides: Tuple[int, ...] = (2, 2, 1, 1)
    level_paddings: Tuple[int, ...] = (1, 1, 0, 0)
    l2_norm_scale: Optional[float] = 20.0
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        feats = list(inputs[-len(self.in_channels):])
        if self.l2_norm_scale is not None:
            scale = self.param("l2_norm", nn.initializers.constant(
                self.l2_norm_scale), (feats[0].shape[-1],))
            norm = jnp.sqrt(jnp.sum(feats[0] ** 2, axis=-1, keepdims=True) + 1e-10)
            feats[0] = feats[0] / norm * scale
        x = feats[-1]
        extra = self.out_channels[len(self.in_channels):]
        for i, ch in enumerate(extra):
            s = self.level_strides[i % len(self.level_strides)]
            p = self.level_paddings[i % len(self.level_paddings)]
            x = nn.Conv(ch // 2, (1, 1), dtype=self.dtype,
                        name=f"extra_{i}_reduce")(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding=((p, p), (p, p)),
                        dtype=self.dtype, name=f"extra_{i}_conv")(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


class _CSPBlock(nn.Module):
    """Simplified CSP layer (YOLOX): split, bottleneck stack, merge."""
    channels: int
    n_blocks: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mid = self.channels // 2
        a = _conv(mid, 1, name="split_a", dtype=self.dtype)(x)
        b = _conv(mid, 1, name="split_b", dtype=self.dtype)(x)
        for i in range(self.n_blocks):
            y = _conv(mid, 1, name=f"b{i}_reduce", dtype=self.dtype)(b)
            y = nn.silu(y)
            y = _conv(mid, 3, name=f"b{i}_conv", dtype=self.dtype)(y)
            b = b + nn.silu(y)
        out = jnp.concatenate([a, b], axis=-1)
        return nn.silu(_conv(self.channels, 1, name="merge", dtype=self.dtype)(out))


@DETECTION_NECKS.register_class
class YOLOXPAFPN(BaseModel):
    """YOLOX PAFPN: CSP-based top-down + bottom-up aggregation."""
    in_channels: Tuple[int, ...] = (256, 512, 1024)
    out_channels: int = 256
    num_csp_blocks: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        feats = list(inputs[-3:])
        # top-down
        inner = [feats[-1]]
        for i in range(len(feats) - 1, 0, -1):
            lat = _conv(feats[i - 1].shape[-1], 1, name=f"reduce_{i}",
                        dtype=self.dtype)(inner[0])
            up = resize_nearest(lat, feats[i - 1].shape[1:3])
            merged = jnp.concatenate([up, feats[i - 1]], axis=-1)
            merged = _CSPBlock(feats[i - 1].shape[-1], self.num_csp_blocks,
                               self.dtype, name=f"td_csp_{i}")(merged)
            inner.insert(0, merged)
        # bottom-up
        outs = [inner[0]]
        for i in range(len(inner) - 1):
            down = _conv(outs[-1].shape[-1], 3, s=2, name=f"down_{i}",
                         dtype=self.dtype)(outs[-1])
            merged = jnp.concatenate([down, inner[i + 1]], axis=-1)
            merged = _CSPBlock(inner[i + 1].shape[-1], self.num_csp_blocks,
                               self.dtype, name=f"bu_csp_{i}")(merged)
            outs.append(merged)
        return [
            _conv(self.out_channels, 1, name=f"out_{i}", dtype=self.dtype)(x)
            for i, x in enumerate(outs)
        ]


@DETECTION_NECKS.register_class
class FPG(BaseModel):
    """Feature Pyramid Grids: ``stack_times`` stages; at each stage every
    level fuses same-level skip, bottom-up (stride-2) and top-down
    (upsampled) pathways — a compact dense-grid realization of the paper's
    multi-pathway grid."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        while len(feats) < self.num_outs:
            feats.append(max_pool(feats[-1], window=1, stride=2, padding=0))
        for s in range(self.stack_times):
            nxt = []
            for i in range(len(feats)):
                parts = [feats[i]]
                if i > 0:  # bottom-up from finer level
                    parts.append(_conv(self.out_channels, 3, s=2,
                                       name=f"s{s}_bu_{i}",
                                       dtype=self.dtype)(feats[i - 1]))
                if i < len(feats) - 1:  # top-down from coarser level
                    parts.append(resize_nearest(feats[i + 1], feats[i].shape[1:3]))
                x = sum(parts)
                x = _conv(self.out_channels, 3, name=f"s{s}_fuse_{i}",
                          dtype=self.dtype)(nn.relu(x))
                nxt.append(x)
            feats = nxt
        return feats


class _ASPP(nn.Module):
    """Atrous spatial pyramid pooling (RFP feedback module)."""
    channels: int
    dilations: Tuple[int, ...] = (1, 3, 6, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, d in enumerate(self.dilations):
            if i == len(self.dilations) - 1:  # image-level pooling branch
                g = adaptive_avg_pool(x, 1)
                g = nn.Conv(self.channels // len(self.dilations), (1, 1),
                            dtype=self.dtype, name=f"aspp_{i}")(g)
                outs.append(jnp.broadcast_to(
                    g, x.shape[:3] + (g.shape[-1],)))
            else:
                outs.append(nn.Conv(
                    self.channels // len(self.dilations), (3, 3),
                    kernel_dilation=(d, d), padding=((d, d), (d, d)),
                    dtype=self.dtype, name=f"aspp_{i}")(x))
        return nn.relu(jnp.concatenate(outs, axis=-1))


@DETECTION_NECKS.register_class
class RFP(BaseModel):
    """Recursive Feature Pyramid (DetectoRS; reference via mmdet,
    torchok/models/necks/detection/mmdet_necks.py:6-20).

    With ``rfp_backbone_name`` set this matches DetectoRS semantics: the
    neck owns a SECOND backbone ("recursive" copy, its own weights, like
    mmdet's ``rfp_backbone``); each recursion step runs FPN, turns each
    level's output into an ASPP feedback feature, RE-RUNS the internal
    backbone on the input image with the feedback injected per stage
    through zero-init 1x1 convs (``ResNet.forward_features(rfp_feats=...)``),
    runs the SHARED FPN on the recursed features and fuses old/new levels
    with a shared zero-init sigmoid gate (mmdet's ``rfp_weight``). The task
    feeds the image as ``inputs[0]`` when ``requires_image`` is True.

    Without a backbone name the round-2 behavior remains: the same
    FPN/ASPP/gate recursion applied to the pyramid only (cheaper; no
    backbone re-run)."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    rfp_steps: int = 2
    rfp_backbone_name: Optional[str] = None
    rfp_backbone_params: Any = None
    dtype: Any = None

    @property
    def requires_image(self) -> bool:
        return self.rfp_backbone_name is not None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        img = None
        if self.requires_image:
            img, inputs = inputs[0], list(inputs[1:])
        n_levels = len(inputs)

        if self.requires_image:
            # DetectoRS mode: the recursed backbone reproduces the original
            # stage channels, so ONE set of FPN/ASPP/gate module instances
            # is created and reused across steps — in Flax, calling the same
            # instance again shares its parameters (mmdet reuses
            # super().forward / rfp_aspp / rfp_weight the same way).
            lateral_convs = [nn.Conv(self.out_channels, (1, 1),
                                     dtype=self.dtype,
                                     name=f"fpn_lateral_{i}")
                             for i in range(n_levels)]
            out_convs = [_conv(self.out_channels, 3, name=f"fpn_out_{i}",
                               dtype=self.dtype) for i in range(n_levels)]
            aspp_mods = [_ASPP(self.out_channels, dtype=self.dtype,
                               name=f"aspp_{i}") for i in range(n_levels)]
            # mmdet rfp_weight: single shared zero-init 1x1 -> sigmoid gate
            # (sigmoid(0) = 0.5: refined and previous mix equally at init)
            gate_conv = nn.Conv(1, (1, 1),
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros,
                                dtype=self.dtype, name="rfp_weight")

            def run_fpn(feats):
                laterals = [conv(x) for conv, x in zip(lateral_convs, feats)]
                for i in range(len(laterals) - 1, 0, -1):
                    laterals[i - 1] = laterals[i - 1] + resize_nearest(
                        laterals[i], laterals[i - 1].shape[1:3])
                return [conv(x) for conv, x in zip(out_convs, laterals)]

            from torchok_tpu.constructor import BACKBONES
            params = dict(self.rfp_backbone_params or {})
            params.setdefault("pretrained", False)
            rfp_backbone = BACKBONES.get(self.rfp_backbone_name)(
                dtype=self.dtype, name="rfp_backbone", **params)
            import inspect
            sig = inspect.signature(rfp_backbone.forward_features)
            if "rfp_feats" not in sig.parameters:
                # DetectoRS recursion needs per-stage feedback injection —
                # only the resnet family implements it (mmdet's RFP has the
                # same restriction: ResNet with rfp_inplanes)
                raise ValueError(
                    f"RFP recursion: backbone "
                    f"{self.rfp_backbone_name!r} does not support "
                    "rfp_feats feedback injection; use a resnet-family "
                    "rfp_backbone_name (reference mmdet RFP is likewise "
                    "ResNet-only) or drop rfp_backbone_name for "
                    "pyramid-only refinement")

            outs = run_fpn(inputs)
            for step in range(1, self.rfp_steps):
                feedback = [aspp(x) for aspp, x in zip(aspp_mods, outs)]
                feats = rfp_backbone.forward_features(
                    img, train=train, rfp_feats=feedback)[-n_levels:]
                refined = run_fpn(feats)
                gates = [jax.nn.sigmoid(gate_conv(r)) for r in refined]
                outs = [g * r + (1 - g) * o
                        for g, o, r in zip(gates, outs, refined)]
        else:
            # pyramid-only refinement (round-2 behavior, no backbone
            # re-run): feedback channels differ from the input pyramid's, so
            # each step gets its own FPN parameters
            def run_fpn_step(feats, prefix):
                laterals = [
                    nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"{prefix}_lateral_{i}")(x)
                    for i, x in enumerate(feats)
                ]
                for i in range(len(laterals) - 1, 0, -1):
                    laterals[i - 1] = laterals[i - 1] + resize_nearest(
                        laterals[i], laterals[i - 1].shape[1:3])
                return [
                    _conv(self.out_channels, 3, name=f"{prefix}_out_{i}",
                          dtype=self.dtype)(laterals[i])
                    for i in range(len(laterals))
                ]

            outs = run_fpn_step(inputs, "fpn0")
            for step in range(1, self.rfp_steps):
                feedback = [
                    _ASPP(self.out_channels, dtype=self.dtype,
                          name=f"aspp{step}_{i}")(x)
                    for i, x in enumerate(outs)
                ]
                refined = run_fpn_step(feedback, f"fpn{step}")
                fused = []
                for i, (o, r) in enumerate(zip(outs, refined)):
                    gate = jax.nn.sigmoid(nn.Conv(
                        self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"gate{step}_{i}")(r))
                    fused.append(gate * r + (1 - gate) * o)
                outs = fused
        while len(outs) < self.num_outs:
            outs.append(max_pool(outs[-1], window=1, stride=2, padding=0))
        return outs


class _DyHeadBlock(nn.Module):
    """DyHead block: scale (level) attention + deformable spatial
    aggregation (DCNv2, like the original's spatial attention) +
    task/channel attention; ``use_dcn=False`` degrades to a dense 3x3."""
    channels: int
    use_dcn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        outs = []
        for i, x in enumerate(feats):
            hw = x.shape[1:3]
            gather = [x]
            if i > 0:
                gather.append(adaptive_avg_pool(feats[i - 1], hw))
            if i < len(feats) - 1:
                gather.append(resize_nearest(feats[i + 1], hw))
            # scale attention: per-level global gate
            stacked = jnp.stack(gather, axis=0)  # (L, N, H, W, C)
            gates = jnp.stack([
                jax.nn.hard_sigmoid(nn.Dense(1, dtype=self.dtype,
                                             name=f"scale_attn_{i}_{j}")(
                    jnp.mean(g, axis=(1, 2))))[:, None, None, :]
                for j, g in enumerate(gather)
            ], axis=0)
            fused = jnp.sum(stacked * gates, axis=0) / len(gather)
            # spatial aggregation
            if self.use_dcn:
                y = ModulatedDeformConv(self.channels, dtype=self.dtype,
                                        name=f"spatial_{i}")(fused)
            else:
                y = _conv(self.channels, 3, name=f"spatial_{i}",
                          dtype=self.dtype)(fused)
            y = nn.GroupNorm(num_groups=16, dtype=self.dtype,
                             name=f"gn_{i}")(y)
            y = nn.relu(y)
            # task/channel attention (squeeze-excite style hard gating)
            z = jnp.mean(y, axis=(1, 2))
            z = nn.relu(nn.Dense(self.channels // 4, dtype=self.dtype,
                                 name=f"task_fc1_{i}")(z))
            z = jax.nn.hard_sigmoid(nn.Dense(self.channels, dtype=self.dtype,
                                             name=f"task_fc2_{i}")(z))
            outs.append(y * z[:, None, None, :])
        return outs


@DETECTION_NECKS.register_class
class DyHead(BaseModel):
    """Dynamic Head: ``num_blocks`` stacked scale/spatial/task attention
    blocks over the pyramid."""
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_blocks: int = 6
    use_dcn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"proj_{i}")(x) if x.shape[-1] != self.out_channels
            else x
            for i, x in enumerate(inputs)
        ]
        for b in range(self.num_blocks):
            feats = _DyHeadBlock(self.out_channels, use_dcn=self.use_dcn,
                                 dtype=self.dtype, name=f"block_{b}")(feats)
        return feats
