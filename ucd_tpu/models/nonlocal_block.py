"""Embedded-gaussian non-local attention block (Flax/NHWC).

Parity component for reference utils/non_local_embedded_gaussian.py:6-109
(imported by segmentation_module.py:13 but never instantiated — kept for API
completeness). y = softmax(theta(x) phi(x)^T) g(x), W(y) + x, with optional
spatial max-pool sub-sampling on phi/g and BatchNorm on the output projection.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class NonLocalBlock2D(nn.Module):
    inter_channels: Optional[int] = None
    sub_sample: bool = True
    bn_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        inter = self.inter_channels or max(C // 2, 1)

        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x)

        if self.sub_sample:
            g = nn.max_pool(g, (2, 2), strides=(2, 2))
            phi = nn.max_pool(phi, (2, 2), strides=(2, 2))

        q = theta.reshape(B, H * W, inter)
        k = phi.reshape(B, -1, inter)
        v = g.reshape(B, -1, inter)

        attn = jnp.einsum("bqc,bkc->bqk", q, k)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, inter)

        w = nn.Conv(C, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros if not self.bn_layer
                    else nn.initializers.he_normal(), name="W")(y)
        if self.bn_layer:
            # zero-init scale so the block starts as identity
            w = nn.BatchNorm(use_running_average=not train,
                             scale_init=nn.initializers.zeros,
                             dtype=jnp.float32, name="W_bn")(w)
        return (w + x).astype(x.dtype)
