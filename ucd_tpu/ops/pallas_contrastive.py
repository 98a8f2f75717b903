"""Tiled Pallas TPU kernel for the UCD pixel-contrastive loss.

The reference materializes the full anchors x contrast similarity matrix AND
the same-shape joint-probability uncertainty matrix in HBM
(utils/utils.py:376-378, utils/loss.py:445-449) — O(P^2) memory, ~1.2 GB per
tensor at batch 12 (SURVEY.md §5.7). This kernel streams contrast tiles
flash-attention-style and never materializes either matrix:

  pass 1: per-anchor negative partition sum  neg_i = sum_j mask_n * exp(adc)
          and positive count num_i
  pass 2: per-anchor loss sum S_i = sum_j mask_p*JM*(adc - log(exp(adc)+neg_i))
          and the backward row-scalar G_i = sum_j mask_p*JM/(exp(adc)+neg_i)
  bwd  : streaming recompute of the tiles, da_i = sum_j dL/dadc_ij * c_j / tau

No running-max stabilization is needed: anchors/contrast are L2-normalized so
adc in [-1/tau, 1/tau] (tau=0.07 -> |adc| <= ~14.3, exp <= 1.6e6), and the
negative sum is bounded by 2P * exp(1/tau) << f32 max. The JM_p uncertainty
tile is computed on the fly from the two softmaxed old-logit tiles (one
[TA,C] x [C,TC] MXU matmul per tile pair).

Masks are derived in-kernel from per-tile label/valid/is-new vectors; the
self-pair exclusion (utils/loss.py:437) uses global row/col indices
(anchor i's self is contrast column i by construction of the batch layout in
ops/contrastive.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .contrastive import ContrastiveBatch

TA = 256   # anchor tile rows (f32 mode)
TC = 512   # contrast tile cols (f32 mode)
# bf16 tiles: half the bytes per element, so double the contrast tile —
# fewer grid invocations and ~4x less HBM re-streaming of the feature
# blocks (each af block is fetched once per contrast tile).
TC_BF16 = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _tile_masks(la, lv, ln, lc, cv, cn, row0, col0):
    """Per-tile positive/negative masks and JM forcing mask.

    la/lv/ln: anchor labels/valid/is_new, shape (ta, 1)
    lc/cv/cn: contrast labels/valid/is_new, shape (1, tc)
    row0/col0: global offsets of this tile.
    """
    ta, tc = la.shape[0], lc.shape[1]
    pair_valid = (lv > 0) & (cv > 0)
    R = (la == lc) & pair_valid
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (ta, tc), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (ta, tc), 1)
    eye = rows == cols
    mask_p = R & (~eye)
    mask_n = (~R) & pair_valid
    m_gt = (ln > 0) & (cn > 0)
    return mask_p, mask_n, m_gt


def _pass1_kernel(af, la, lv, ln, cf, lc, cv, cn,
                  neg_out, num_out, *, tau: float, precision):
    """neg_i += sum_j mask_n exp(adc); num_i += sum_j mask_p."""
    j = pl.program_id(1)
    row0 = pl.program_id(0) * af.shape[0]
    col0 = j * cf.shape[0]

    @pl.when(j == 0)
    def _():
        neg_out[:] = jnp.zeros_like(neg_out)
        num_out[:] = jnp.zeros_like(num_out)

    adc = jnp.dot(af[:], cf[:].T, preferred_element_type=jnp.float32,
                  precision=precision) / tau
    mask_p, mask_n, _ = _tile_masks(la[:], lv[:], ln[:], lc[:], cv[:], cn[:],
                                    row0, col0)
    e = jnp.exp(adc)
    neg_out[:] += jnp.sum(jnp.where(mask_n, e, 0.0), axis=1, keepdims=True)
    num_out[:] += jnp.sum(mask_p.astype(jnp.float32), axis=1, keepdims=True)


def _pass2_kernel(af, ap, la, lv, ln, cf, cp, lc, cv, cn, neg,
                  s_out, g_out, *, tau: float, precision):
    """S_i += sum_j mask_p JM (adc - log(exp(adc)+neg_i));
       G_i += sum_j mask_p JM / (exp(adc)+neg_i)."""
    j = pl.program_id(1)
    row0 = pl.program_id(0) * af.shape[0]
    col0 = j * cf.shape[0]

    @pl.when(j == 0)
    def _():
        s_out[:] = jnp.zeros_like(s_out)
        g_out[:] = jnp.zeros_like(g_out)

    adc = jnp.dot(af[:], cf[:].T, preferred_element_type=jnp.float32,
                  precision=precision) / tau
    mask_p, _, m_gt = _tile_masks(la[:], lv[:], ln[:], lc[:], cv[:], cn[:],
                                  row0, col0)
    jm = jnp.dot(ap[:], cp[:].T, preferred_element_type=jnp.float32,
                 precision=precision)
    jm = jnp.where(m_gt, 1.0, jm)
    w = jnp.where(mask_p, jm, 0.0)

    e = jnp.exp(adc)
    denom = e + neg[:]                       # (TA,1) broadcast over cols
    s_out[:] += jnp.sum(w * (adc - jnp.log(denom)), axis=1, keepdims=True)
    g_out[:] += jnp.sum(w / denom, axis=1, keepdims=True)


def _bwd_kernel(af, ap, la, lv, ln, cf, cp, lc, cv, cn, neg, g_row, coef,
                da_out, *, tau: float, precision):
    """da_i = sum_j dL/dadc_ij * c_j / tau, with
       dL/dadc_ij = coef_i * [mask_p JM (1 - e/(e+neg)) - mask_n e G_i]."""
    j = pl.program_id(1)
    row0 = pl.program_id(0) * af.shape[0]
    col0 = j * cf.shape[0]

    @pl.when(j == 0)
    def _():
        da_out[:] = jnp.zeros_like(da_out)

    adc = jnp.dot(af[:], cf[:].T, preferred_element_type=jnp.float32,
                  precision=precision) / tau
    mask_p, mask_n, m_gt = _tile_masks(la[:], lv[:], ln[:], lc[:], cv[:],
                                       cn[:], row0, col0)
    jm = jnp.dot(ap[:], cp[:].T, preferred_element_type=jnp.float32,
                 precision=precision)
    jm = jnp.where(m_gt, 1.0, jm)
    w = jnp.where(mask_p, jm, 0.0)

    e = jnp.exp(adc)
    denom = e + neg[:]
    dadc = coef[:] * (w * (1.0 - e / denom)
                      - jnp.where(mask_n, e, 0.0) * g_row[:])
    # match cf's dtype so the MXU sees a homogeneous (single-pass in bf16
    # mode) matmul; accumulation stays f32 via preferred_element_type
    da_out[:] += jnp.dot(dadc.astype(cf.dtype), cf[:],
                         preferred_element_type=jnp.float32,
                         precision=precision) / tau


def _row_spec(ta):
    return pl.BlockSpec((ta, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _col_spec(tc):
    return pl.BlockSpec((1, tc), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)


def _anchor_spec(ta, d):
    return pl.BlockSpec((ta, d), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _contrast_spec(tc, d):
    return pl.BlockSpec((tc, d), lambda i, j: (j, 0),
                        memory_space=pltpu.VMEM)


def _tiles(compute_dtype):
    return (TA, TC_BF16) if compute_dtype == jnp.bfloat16 else (TA, TC)


def _prep(batch: ContrastiveBatch, compute_dtype):
    """Pad every array to tile multiples; pack masks as float rows/cols."""
    ta, tc = _tiles(compute_dtype)
    P, D = batch.anchor_feat.shape
    M = batch.contrast_feat.shape[0]
    C = batch.anchor_prob.shape[1]
    Pp, Mp, Cp = _round_up(P, ta), _round_up(M, tc), _round_up(C, 128)
    f32 = jnp.float32

    def pad2(x, rows, cols=None):
        pr = rows - x.shape[0]
        pc = 0 if cols is None else cols - x.shape[1]
        return jnp.pad(x.astype(compute_dtype), ((0, pr), (0, pc)))

    af = pad2(batch.anchor_feat, Pp)
    cf = pad2(batch.contrast_feat, Mp)
    ap = pad2(batch.anchor_prob, Pp, Cp)
    cp = pad2(batch.contrast_prob, Mp, Cp)

    def row(x):  # (P,) -> (Pp, 1) f32
        return jnp.pad(x.astype(f32)[:, None], ((0, Pp - x.shape[0]), (0, 0)))

    def col(x):  # (M,) -> (1, Mp) f32
        return jnp.pad(x.astype(f32)[None, :], ((0, 0), (0, Mp - x.shape[0])))

    # invalid slots get label -1 so they never match a valid label
    la = row(jnp.where(batch.anchor_valid, batch.anchor_label, -1))
    lc = col(jnp.where(batch.contrast_valid, batch.contrast_label, -2))
    lv = row(batch.anchor_valid)
    cv = col(batch.contrast_valid)
    ln = row(batch.anchor_is_new & batch.anchor_valid)
    cn = col(batch.contrast_is_new & batch.contrast_valid)
    return af, ap, la, lv, ln, cf, cp, lc, cv, cn, Pp, Mp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _pallas_loss(batch: ContrastiveBatch, tau: float, interpret: bool,
                 precision, compute_dtype):
    loss, _ = _pallas_fwd_impl(batch, tau, interpret, precision,
                               compute_dtype)
    return loss


def _pallas_fwd_impl(batch, tau, interpret, precision, compute_dtype):
    af, ap, la, lv, ln, cf, cp, lc, cv, cn, Pp, Mp = _prep(batch,
                                                          compute_dtype)
    ta, tc = _tiles(compute_dtype)
    grid = (Pp // ta, Mp // tc)
    D, Cp = af.shape[1], ap.shape[1]

    in_specs = [
        _anchor_spec(ta, D), _anchor_spec(ta, Cp), _row_spec(ta),
        _row_spec(ta), _row_spec(ta), _contrast_spec(tc, D),
        _contrast_spec(tc, Cp), _col_spec(tc), _col_spec(tc), _col_spec(tc),
    ]
    pass1_specs = [
        _anchor_spec(ta, D), _row_spec(ta), _row_spec(ta), _row_spec(ta),
        _contrast_spec(tc, D), _col_spec(tc), _col_spec(tc), _col_spec(tc),
    ]
    out_spec = pl.BlockSpec((ta, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    neg, num = pl.pallas_call(
        functools.partial(_pass1_kernel, tau=tau, precision=precision),
        grid=grid,
        in_specs=pass1_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((Pp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Pp, 1), jnp.float32)),
        interpret=interpret,
    )(af, la, lv, ln, cf, lc, cv, cn)

    s, g = pl.pallas_call(
        functools.partial(_pass2_kernel, tau=tau, precision=precision),
        grid=grid,
        in_specs=in_specs + [out_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((Pp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Pp, 1), jnp.float32)),
        interpret=interpret,
    )(af, ap, la, lv, ln, cf, cp, lc, cv, cn, neg)

    has_pos = num[:, 0] > 0
    n_active = jnp.maximum(jnp.sum(has_pos), 1)
    per_anchor = -s[:, 0] / jnp.maximum(num[:, 0], 1.0)
    loss = jnp.sum(jnp.where(has_pos, per_anchor, 0.0)) / n_active
    residuals = (batch, neg, num, g, n_active)
    return loss, residuals


def _pallas_fwd(batch, tau, interpret, precision, compute_dtype):
    return _pallas_fwd_impl(batch, tau, interpret, precision, compute_dtype)


def _pallas_bwd(tau, interpret, precision, compute_dtype, residuals, ct):
    batch, neg, num, g, n_active = residuals
    af, ap, la, lv, ln, cf, cp, lc, cv, cn, Pp, Mp = _prep(batch,
                                                           compute_dtype)
    ta, tc = _tiles(compute_dtype)
    grid = (Pp // ta, Mp // tc)
    D, Cp = af.shape[1], ap.shape[1]

    has_pos = num > 0
    # dLoss/dS_i = -1/(num_i * n_active) for anchors with positives
    coef = jnp.where(has_pos,
                     -ct / (jnp.maximum(num, 1.0) * n_active.astype(jnp.float32)),
                     0.0)

    in_specs = [
        _anchor_spec(ta, D), _anchor_spec(ta, Cp), _row_spec(ta),
        _row_spec(ta), _row_spec(ta), _contrast_spec(tc, D),
        _contrast_spec(tc, Cp), _col_spec(tc), _col_spec(tc), _col_spec(tc),
        _row_spec(ta), _row_spec(ta), _row_spec(ta),
    ]
    da = pl.pallas_call(
        functools.partial(_bwd_kernel, tau=tau, precision=precision),
        grid=grid,
        in_specs=in_specs,
        out_specs=_anchor_spec(ta, D),
        out_shape=jax.ShapeDtypeStruct((Pp, D), jnp.float32),
        interpret=interpret,
    )(af, ap, la, lv, ln, cf, cp, lc, cv, cn, neg, g, coef)

    P = batch.anchor_feat.shape[0]
    da = da[:P].astype(batch.anchor_feat.dtype)

    def zero_ct(x):
        # int/bool leaves take float0 cotangents; float leaves zeros
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        import numpy as np
        return np.zeros(x.shape, jax.dtypes.float0)

    zero_batch = jax.tree_util.tree_map(zero_ct, batch)
    grads = zero_batch._replace(anchor_feat=da)
    return (grads,)


_pallas_loss.defvjp(_pallas_fwd, _pallas_bwd)


def pixel_contrastive_loss_pallas(batch: ContrastiveBatch,
                                  temperature: float = 0.07,
                                  interpret: Optional[bool] = None,
                                  precision=None,
                                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """Drop-in replacement for ops.contrastive.pixel_contrastive_loss using
    the tiled kernel. Gradient flows only through anchor features (the
    contrast set and JM_p are detached in the reference,
    utils/utils.py:366,393).

    `precision`: MXU precision for the similarity/JM dots. None (default) =
    bf16-input one-pass matmul with f32 accumulation — the flash-attention
    convention; ~1e-3 relative logit rounding, negligible under the 0.01
    loss weight and 13% cheaper end-to-end than 'highest'. Pass 'highest'
    for exactness checks (bench.py parity gate: kernel-vs-dense agree to
    ~1e-6 on TPU at 'highest').

    `compute_dtype`: VMEM dtype for the feature/probability tiles.
    jnp.bfloat16 halves the kernel's HBM streaming, doubles the contrast
    tile (TC_BF16) and makes every MXU dot a native one-pass bf16 matmul;
    accumulation and all transcendental work stay f32. Feature rounding is
    ~4e-3 relative — in the bf16 training config (where the backbone
    activations were bf16 anyway) this is below the loss term's existing
    noise floor; keep f32 for exactness gates."""
    if interpret is None:
        interpret = not _on_tpu()
    return _pallas_loss(batch, float(temperature), bool(interpret),
                        precision, jnp.dtype(compute_dtype).type)
