"""Core layers: fused norm+activation (ABN) and initializers.

TPU-native replacement for the reference's native `inplace_abn` C++/CUDA
package (imported at /root/reference/segmentation_module.py:5-22). On TPU the
fused BatchNorm+leaky_relu is expressed as BatchNorm followed by the
activation inside one jitted graph — XLA fuses the normalize+scale+activate
elementwise chain into the producing convolution's epilogue, and the
cross-replica statistics sync of `InPlaceABNSync` falls out of SPMD
sharding automatically: when the batch axis is sharded over the mesh, the
batch-mean/variance reductions lower to `all-reduce` over ICI with no
per-layer eager collective calls (SURVEY.md §5.8).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# process-wide ABN norm compute dtype default (boxed so make_model can set it
# from cfg.bf16_norm without threading a field through every constructor)
DEFAULT_NORM_DTYPE = [jnp.float32]

# process-wide BatchNorm variance formula (boxed, set from cfg.stable_norm):
# True = flax's one-pass E[x^2]-E[x]^2 (fewer HBM reads, the production
# default); False = the cancellation-free two-pass variance (torch
# semantics — what the composed parity oracle compares against)
DEFAULT_FAST_VARIANCE = [True]


def xavier_normal_gain(gain: float):
    """Xavier/Glorot normal with an explicit gain, matching
    `nn.init.xavier_normal_(w, gain)` (reference modules/deeplab.py:41-47)."""

    def init(key, shape, dtype=jnp.float32):
        # flax conv kernels are (kh, kw, in, out)
        if len(shape) == 4:
            receptive = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * receptive, shape[3] * receptive
        else:
            fan_in, fan_out = shape[0], shape[-1]
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std

    return init


def leaky_relu_gain(negative_slope: float) -> float:
    """torch.nn.init.calculate_gain('leaky_relu', slope)."""
    return math.sqrt(2.0 / (1.0 + negative_slope**2))


class ABN(nn.Module):
    """BatchNorm + activation (`inplace_abn.ABN` semantics).

    `activation='identity'` is used for the last norm of each residual block
    and projection shortcuts (reference modules/residual.py:52,65,82).
    Statistics and affine transform run in float32; the output is cast to
    `dtype` (bf16 compute policy).
    """

    activation: str = "leaky_relu"
    activation_param: float = 0.01
    momentum: float = 0.9  # flax convention == torch/inplace_abn momentum 0.1
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    norm_type: str = "bn"  # 'bn' | 'gn' (the reference's convert_bn2gn
    #                         utility, utils/utils.py:243-254, as a config
    #                         choice instead of post-hoc module surgery)
    gn_groups: int = 16
    # None -> module-level default (set by make_model from cfg.bf16_norm).
    # bfloat16 halves the normalize-chain HBM traffic; XLA reductions
    # accumulate bf16 sums in f32 on TPU, and running stats stay f32.
    norm_dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_dtype = self.norm_dtype if self.norm_dtype is not None \
            else DEFAULT_NORM_DTYPE[0]
        if self.norm_type == "gn":
            x = nn.GroupNorm(num_groups=min(self.gn_groups, x.shape[-1]),
                             epsilon=self.epsilon, dtype=norm_dtype,
                             param_dtype=jnp.float32, name="gn")(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=self.epsilon,
                dtype=norm_dtype,
                param_dtype=jnp.float32,
                use_fast_variance=DEFAULT_FAST_VARIANCE[0],
                name="bn",
            )(x)
        if self.activation == "leaky_relu":
            x = nn.leaky_relu(x, self.activation_param)
        elif self.activation == "elu":
            x = nn.elu(x, self.activation_param)
        elif self.activation != "identity":
            raise ValueError(f"unknown activation {self.activation!r}")
        return x.astype(self.dtype)


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    dilation: int = 1,
    use_bias: bool = False,
    name: Optional[str] = None,
    dtype: Any = jnp.float32,
    kernel_init=None,
) -> nn.Conv:
    """NHWC conv with torch-style symmetric padding = dilation*(k-1)/2."""
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init or nn.initializers.he_normal(),
        name=name,
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over spatial dims, keepdims (reference modules/misc.py:1-12)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
