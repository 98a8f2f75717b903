"""DeepLab-v3 ASPP head (Flax/NHWC).

Rebuild of the reference head (reference modules/deeplab.py:8-89): four
parallel map convolutions (1x1 + three 3x3 dilated 6/12/18 at output stride 16
or 12/24/32 at os 8), channel concat -> ABN -> 1x1 reduction, plus a global
pooling branch. During training the pooling branch is a true global average
pool broadcast back over space; in eval mode with a `pooling_size` it becomes a
sliding average pool with replicate padding (reference modules/deeplab.py:72-89).

Conv weights use Xavier-normal with the leaky_relu(0.01) gain
(reference modules/deeplab.py:41-47).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import ABN, conv, global_avg_pool, leaky_relu_gain, xavier_normal_gain


class DeeplabV3(nn.Module):
    out_channels: int = 256
    hidden_channels: int = 256
    out_stride: int = 16
    pooling_size: Optional[int] = None
    activation_param: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = [6, 12, 18] if self.out_stride == 16 else [12, 24, 32]
        gain = leaky_relu_gain(self.activation_param)
        init = xavier_normal_gain(gain)
        hc = self.hidden_channels

        branches = [
            conv(hc, 1, dtype=self.dtype, kernel_init=init, name="map_conv0")(x),
            conv(hc, 3, dilation=dilations[0], dtype=self.dtype, kernel_init=init,
                 name="map_conv1")(x),
            conv(hc, 3, dilation=dilations[1], dtype=self.dtype, kernel_init=init,
                 name="map_conv2")(x),
            conv(hc, 3, dilation=dilations[2], dtype=self.dtype, kernel_init=init,
                 name="map_conv3")(x),
        ]
        out = jnp.concatenate(branches, axis=-1)
        out = ABN(activation_param=self.activation_param, dtype=self.dtype,
                  name="map_bn")(out, train)
        out = conv(self.out_channels, 1, dtype=self.dtype, kernel_init=init,
                   name="red_conv")(out)

        pool = self._global_pooling(x, train)
        pool = conv(hc, 1, dtype=self.dtype, kernel_init=init,
                    name="global_pooling_conv")(pool)
        pool = ABN(activation_param=self.activation_param, dtype=self.dtype,
                   name="global_pooling_bn")(pool, train)
        pool = conv(self.out_channels, 1, dtype=self.dtype, kernel_init=init,
                    name="pool_red_conv")(pool)
        if train or self.pooling_size is None:
            pool = jnp.broadcast_to(pool, out.shape)

        out = out + pool
        out = ABN(activation_param=self.activation_param, dtype=self.dtype,
                  name="red_bn")(out, train)
        return out

    def _global_pooling(self, x, train: bool):
        if train or self.pooling_size is None:
            return global_avg_pool(x)
        h, w = x.shape[1], x.shape[2]
        ph = min(self.pooling_size, h)
        pw = min(self.pooling_size, w)
        pool = nn.avg_pool(x, (ph, pw), strides=(1, 1), padding="VALID")
        # replicate-pad back to (h, w); torch F.pad order (l, r, t, b)
        # (reference modules/deeplab.py:79-88)
        pl = (pw - 1) // 2
        pr = (pw - 1) // 2 if pw % 2 == 1 else (pw - 1) // 2 + 1
        pt = (ph - 1) // 2
        pb = (ph - 1) // 2 if ph % 2 == 1 else (ph - 1) // 2 + 1
        return jnp.pad(pool, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")
