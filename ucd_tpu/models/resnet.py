"""Dilated ResNet backbone (Flax/NHWC).

TPU-native rebuild of the reference ResNet body (reference models/resnet.py:11-136
and modules/residual.py:7-97): mod1 stem (7x7 s2 + ABN + maxpool s2) followed by
four groups of bottleneck blocks, with dilation replacing stride in the late
groups for output stride 8/16 (`jax.lax` rhs_dilation under the hood via
`nn.Conv(kernel_dilation=...)`).

Module/parameter names deliberately mirror the torch state-dict layout
(`mod2.block1.convs.conv1` -> flax path mod2/block1/conv1) so the pretrained
inplace-abn checkpoint converts by pure name mapping.

Residual block contract (reference modules/residual.py:84-97): the final norm
of the main path and the projection shortcut use identity activation; the
post-add activation is leaky_relu(0.01) read from the block's norm config.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ABN, conv

STRUCTURES = {
    "resnet18": ([2, 2, 2, 2], False),
    "resnet34": ([3, 4, 6, 3], False),
    "resnet50": ([3, 4, 6, 3], True),
    "resnet101": ([3, 4, 23, 3], True),
    "resnet152": ([3, 8, 36, 3], True),
}


class S2DStemConv(nn.Module):
    """The stem 7x7/stride-2 conv computed space-to-depth packed.

    A 7x7 s2 conv on (H,W,3) is layout-hostile on TPU: 3 input channels pad
    terribly onto the MXU and the stride-2 window re-reads HBM (measured
    95-237 GB/s vs the 819 GB/s peak — BASELINE.md round-3 trace). Packing
    2x2 pixel blocks into channels turns it into an EXACTLY equivalent
    4x4 stride-1 conv on (H/2,W/2,12):

        y[p,q] = sum_{u,v} W[u,v] x[2p+u-3, 2q+v-3]
               = sum_{i,j,a,b} W[2i+a-1, 2j+b-1] X[p+i-2, q+j-2, (a,b,:)]

    so K[i,j,(a,b,c),o] = W[2i+a-1, 2j+b-1, c, o] (zero where u or v falls
    outside [0,6]) with asymmetric padding (2,1). The PARAMETER stays the
    standard (7,7,C,64) `kernel` — checkpoints, the pretrained converter and
    the torch parity oracle are unaffected; only the compute layout changes
    (MLPerf-ResNet space-to-depth trick, here derived for k=7 s=2 p=3)."""

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (7, 7, c_in, self.features), jnp.float32)
        B, H, W, _ = x.shape
        if H % 2 or W % 2:
            # odd input: fall back to the plain conv (same param)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xp = x.reshape(B, H // 2, 2, W // 2, 2, c_in)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2,
                                                    4 * c_in)
        wp = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))
        K = wp[0:8, 0:8].reshape(4, 2, 4, 2, c_in, self.features)
        K = K.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c_in,
                                                  self.features)
        return jax.lax.conv_general_dilated(
            xp.astype(self.dtype), K.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResidualBlock(nn.Module):
    """Bottleneck (1x1 -> 3x3 -> 1x1) or basic (3x3 -> 3x3) residual block."""

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    activation_param: float = 0.01
    dtype: Any = jnp.float32
    # per-block norm compute dtype override (None -> process default):
    # bfloat16 on the early HBM-bound groups halves the normalize-chain
    # traffic where the convs are bandwidth-limited (cfg.bf16_norm_early)
    norm_dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = tuple(self.channels)
        is_bottleneck = len(ch) == 3
        out_ch = ch[-1]
        need_proj = self.stride != 1 or x.shape[-1] != out_ch

        if need_proj:
            residual = conv(out_ch, 1, self.stride, dtype=self.dtype,
                            name="proj_conv")(x)
            residual = ABN(activation="identity", dtype=self.dtype,
                           norm_dtype=self.norm_dtype,
                           name="proj_bn")(residual, train)
        else:
            residual = x

        if is_bottleneck:
            y = conv(ch[0], 1, 1, dtype=self.dtype, name="conv1")(x)
            y = ABN(activation_param=self.activation_param, dtype=self.dtype,
                    norm_dtype=self.norm_dtype, name="bn1")(y, train)
            y = conv(ch[1], 3, self.stride, self.dilation, dtype=self.dtype,
                     name="conv2")(y)
            y = ABN(activation_param=self.activation_param, dtype=self.dtype,
                    norm_dtype=self.norm_dtype, name="bn2")(y, train)
            y = conv(ch[2], 1, 1, dtype=self.dtype, name="conv3")(y)
            y = ABN(activation="identity", dtype=self.dtype,
                    norm_dtype=self.norm_dtype, name="bn3")(y, train)
        else:
            y = conv(ch[0], 3, self.stride, self.dilation, dtype=self.dtype,
                     name="conv1")(x)
            y = ABN(activation_param=self.activation_param, dtype=self.dtype,
                    norm_dtype=self.norm_dtype, name="bn1")(y, train)
            y = conv(ch[1], 3, 1, self.dilation, dtype=self.dtype,
                     name="conv2")(y)
            y = ABN(activation="identity", dtype=self.dtype,
                    norm_dtype=self.norm_dtype, name="bn2")(y, train)

        y = y + residual
        return nn.leaky_relu(y, self.activation_param)


class IdentityResidualBlock(nn.Module):
    """Pre-activation residual block (reference modules/residual.py:100-180).

    The reference ships it but no `_NETS` entry uses it (SURVEY §2.4 marks it
    optional); built here for inventory completeness. Contract: bn1 activates
    the INPUT; the projection shortcut (when shapes change) taps the
    activated tensor; the main path is conv->bn->conv (basic) or
    1x1->bn->3x3->bn->1x1 (bottleneck); the residual add has NO post-add
    activation (pre-act design)."""

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    activation_param: float = 0.01
    dtype: Any = jnp.float32
    # per-block norm compute dtype override (None -> process default):
    # bfloat16 on the early HBM-bound groups halves the normalize-chain
    # traffic where the convs are bandwidth-limited (cfg.bf16_norm_early)
    norm_dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = tuple(self.channels)
        is_bottleneck = len(ch) == 3
        out_ch = ch[-1]
        need_proj = self.stride != 1 or x.shape[-1] != out_ch

        bn1 = ABN(activation_param=self.activation_param, dtype=self.dtype,
                  name="bn1")(x, train)
        residual = x
        if need_proj:
            residual = conv(out_ch, 1, self.stride, dtype=self.dtype,
                            name="proj_conv")(bn1)

        if is_bottleneck:
            y = conv(ch[0], 1, self.stride, dtype=self.dtype,
                     name="conv1")(bn1)
            y = ABN(activation_param=self.activation_param, dtype=self.dtype,
                    name="bn2")(y, train)
            y = conv(ch[1], 3, 1, self.dilation, dtype=self.dtype,
                     name="conv2")(y)
            y = ABN(activation_param=self.activation_param, dtype=self.dtype,
                    name="bn3")(y, train)
            y = conv(ch[2], 1, 1, dtype=self.dtype, name="conv3")(y)
        else:
            y = conv(ch[0], 3, self.stride, self.dilation, dtype=self.dtype,
                     name="conv1")(bn1)
            y = ABN(activation_param=self.activation_param, dtype=self.dtype,
                    name="bn2")(y, train)
            y = conv(ch[1], 3, 1, self.dilation, dtype=self.dtype,
                     name="conv2")(y)

        return y + residual


class ResNet(nn.Module):
    """Four-group dilated ResNet; output stride 8 or 16.

    output_stride 16 -> dilation [1,1,1,2]; 8 -> [1,1,2,4]
    (reference models/resnet.py:48-53). Stride 2 at the first block of a group
    when its dilation is 1 and it is not the first group
    (reference models/resnet.py:100-104).
    """

    structure: Sequence[int] = (3, 4, 23, 3)
    bottleneck: bool = True
    output_stride: int = 16
    dtype: Any = jnp.float32
    remat: bool = False
    stem_s2d: bool = False  # space-to-depth packed stem conv (same params)
    # norm compute dtype for the stem + mod2 group only (the 128^2/256^2
    # HBM-bound activations; BASELINE.md round-3 trace): bfloat16 halves
    # that chain's traffic while the MXU-bound late groups keep f32 norms
    norm_dtype_early: Any = None
    # rematerialize ONLY the mod2 group in the backward: its 128^2
    # activations dominate saved-activation HBM while its recompute FLOPs
    # are cheap — the bandwidth-for-compute trade targeted at the measured
    # HBM-bound region (full-model remat trades everywhere, incl. the
    # MXU-bound late groups where it only costs)
    remat_early: bool = False

    @property
    def out_channels(self) -> int:
        base = 256 if self.bottleneck else 64
        return base * 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.output_stride == 16:
            dilation = [1, 1, 1, 2]
        elif self.output_stride == 8:
            dilation = [1, 1, 2, 4]
        else:
            raise ValueError("output stride must be 8 or 16")

        # stem: mod1
        if self.stem_s2d:
            y = S2DStemConv(features=64, dtype=self.dtype,
                            name="mod1_conv1")(x)
        else:
            y = conv(64, 7, 2, dtype=self.dtype, name="mod1_conv1")(x)
        y = ABN(dtype=self.dtype, norm_dtype=self.norm_dtype_early,
                name="mod1_bn1")(y, train)
        if dilation[0] == 1:
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        channels = (64, 64, 256) if self.bottleneck else (64, 64)
        base_cls = ResidualBlock
        remat_cls = nn.remat(ResidualBlock, static_argnums=(2,))
        for mod_id, num in enumerate(self.structure):
            d = dilation[mod_id]
            block_cls = (remat_cls if self.remat
                         or (self.remat_early and mod_id == 0) else base_cls)
            for block_id in range(num):
                stride = 2 if d == 1 and block_id == 0 and mod_id > 0 else 1
                y = block_cls(
                    channels=channels,
                    stride=stride,
                    dilation=d,
                    dtype=self.dtype,
                    norm_dtype=(self.norm_dtype_early if mod_id == 0
                                else None),
                    name=f"mod{mod_id + 2}_block{block_id + 1}",
                )(y, train)
            channels = tuple(c * 2 for c in channels)

        return y


def make_backbone(name: str, output_stride: int, dtype=jnp.float32,
                  remat: bool = False, stem_s2d: bool = False) -> ResNet:
    structure, bottleneck = STRUCTURES[name]
    return ResNet(structure=structure, bottleneck=bottleneck,
                  output_stride=output_stride, dtype=dtype, remat=remat,
                  stem_s2d=stem_s2d)
