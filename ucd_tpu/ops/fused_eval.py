"""Fused bilinear-upsample + argmax Pallas kernel (eval / serving path).

The reference's eval and test entries argmax full-resolution logits
(train.py:215 `outputs.max(dim=1)`, test.py prediction dumps) produced by
the model's bilinear upsample (segmentation_module.py:133). On TPU that
materializes the (B, H, W, C) upsampled logits — 176 MB at VOC's C=21 /
batch 16 / 512², 1.3 GB at ADE's C=151 — written to and re-read from HBM
just to reduce them to a (B, H, W) int32 prediction.

This kernel reuses the fused-loss tile machinery (ops/fused_loss.py): per
(batch, 8-row output tile) it expands width with one small MXU dot against
the precomputed interpolation matrix, lerps the 2-3 source rows, and takes
the class argmax in VMEM — the upsampled logits never exist, and callers
that drop the model's `outputs` let XLA dead-code-eliminate the model-side
upsample too.

Interpolation dtype: argmax only needs ORDERING, not loss-grade logit
precision, so when the incoming logits are bf16 (the default compute
policy) the tiles are STORED and dotted in bf16 — single-pass MXU dots
and half the HBM→VMEM traffic of the f32 path — while the post-dot lerp
and compare run in f32 (Mosaic requires 32-bit accumulators/broadcasts).
f32 inputs keep exact f32 interpolation.

Semantics match `jnp.argmax(resize_bilinear(logits, (H, W)), axis=-1)`
with first-occurrence tie-breaking; near-exact ties (top-2 gap at the
interpolation dtype's rounding scale) may resolve differently from the
dense composition because the summation order differs. Eval-only (no VJP).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_loss import (
    _const_spec,
    _interp_consts,
    _on_tpu,
    _pick_to,
    _round_up,
    _row_specs,
    _tr_pad_classes,
)

_NEG = -1e30


def _upsample_tile_fast(rA, rB, rC, w3, awt, dtype):
    """(To, Cp, Wp) f32 upsampled tile from three (Cp, w) source rows held
    in `dtype`. Unlike fused_loss._upsample_tile (f32 HIGHEST — loss-grade),
    the argmax path runs the width dots at the INPUT dtype: one MXU pass
    for bf16 operands, half the HBM→VMEM traffic. Mosaic requires a 32-bit
    matmul accumulator and 32-bit minor-dim broadcasts, so all in-VMEM
    arithmetic past the dot stays f32 (argmax only needs ordering; the
    bf16 savings are in the memory system, not the VPU)."""
    prec = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    a = jnp.dot(rA[0, 0], awt[:], preferred_element_type=jnp.float32,
                precision=prec)
    b = jnp.dot(rB[0, 0], awt[:], preferred_element_type=jnp.float32,
                precision=prec)
    c = jnp.dot(rC[0, 0], awt[:], preferred_element_type=jnp.float32,
                precision=prec)
    w = w3[0]  # (To, 128) f32; cols 0..2 hold the slot weights
    wA = w[:, 0][:, None, None]
    wB = w[:, 1][:, None, None]
    wC = w[:, 2][:, None, None]
    return wA * a[None] + wB * b[None] + wC * c[None]


def _argmax_kernel(zA, zB, zC, w3, awt, out, *, C, To, dtype):
    z = _upsample_tile_fast(zA, zB, zC, w3, awt, dtype)      # (To, Cp, Wp)
    Cp, Wp = z.shape[1], z.shape[2]
    ci = jax.lax.broadcasted_iota(jnp.int32, (To, Cp, Wp), 1)
    zm = jnp.where(ci < C, z, _NEG)
    m = jnp.max(zm, axis=1, keepdims=True)
    # first-occurrence tie-break, matching jnp.argmax
    p = jnp.min(jnp.where(zm >= m, ci, Cp), axis=1)
    # all-NaN pixels leave `zm >= m` false everywhere and fall through to
    # Cp — an out-of-range class that would land in the WRONG row of the
    # confusion matrix (idx = label*n_cls + pred). jnp.argmax returns 0
    # there; match it.
    out[0, 0] = jnp.where(p >= C, 0, p).astype(jnp.int32)


def supported(lowres_shape, out_hw) -> bool:
    """Upsampling only (each output tile's source window stays at 3 rows)."""
    _, h, w, _ = lowres_shape
    H, W = int(out_hw[0]), int(out_hw[1])
    return H >= h and W >= w


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret", "dt"))
def _fused_argmax(z, out_hw, interpret, dt):
    dtype = jnp.dtype(dt)
    B, h, w, C = z.shape
    H, W = out_hw
    # bf16 tiles pack 16 sublanes; keep the class padding tile-aligned
    Cp = _round_up(C, 16 if dtype == jnp.bfloat16 else 8)
    To = _pick_to(H, h, W, Cp, 0)
    nT, Hp, Wp, Ap, w3p = _interp_consts(H, h, W, w, To)
    zt = _tr_pad_classes(z, Cp, dtype)

    rows = _row_specs(h, Cp, w, To, H)
    in_specs = rows + [
        pl.BlockSpec((1, To, 128), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((w, Wp)),
    ]
    out_spec = pl.BlockSpec((1, 1, To, Wp), lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_argmax_kernel, C=C, To=To, dtype=dtype)
    preds = pl.pallas_call(
        kern, grid=(B, nT), in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nT, To, Wp), jnp.int32),
        interpret=interpret,
    )(zt, zt, zt, jnp.asarray(w3p), jnp.asarray(Ap.T, dtype))
    return preds.reshape(B, Hp, Wp)[:, :H, :W]


def fused_argmax(logits_lr: jnp.ndarray, out_hw: Tuple[int, int], *,
                 interpret: Optional[bool] = None,
                 compute_dtype=None) -> jnp.ndarray:
    """(B, H, W) int32 argmax of the bilinearly-upsampled logits, fused.

    Equivalent to `jnp.argmax(resize_bilinear(logits_lr, out_hw), axis=-1)`
    without materializing the upsampled tensor. `compute_dtype` defaults to
    the input dtype (bf16 logits → bf16 interpolation, single-pass MXU
    dots; anything else → exact f32)."""
    if interpret is None:
        interpret = not _on_tpu()
    if compute_dtype is None:
        compute_dtype = (jnp.bfloat16 if logits_lr.dtype == jnp.bfloat16
                         else jnp.float32)
    return _fused_argmax(logits_lr, (int(out_hw[0]), int(out_hw[1])),
                         bool(interpret), jnp.dtype(compute_dtype).name)


def fused_argmax_dense(logits_lr, out_hw):
    """Dense composition oracle: f32 bilinear upsample + argmax."""
    from ..models.segmentation import resize_bilinear

    up = resize_bilinear(logits_lr, (int(out_hw[0]), int(out_hw[1])),
                         dtype=jnp.float32)
    return jnp.argmax(up, axis=-1).astype(jnp.int32)
