"""Fused bilinear-upsample + CE/KD loss Pallas kernel.

The reference computes every full-resolution loss on logits bilinearly
upsampled to label size (segmentation_module.py:133 + train.py:112-133).
At 512^2 that materializes (B, 512, 512, C) tensors — 1.3 GB at ADE's
C=151 — and the loss chain re-streams them from HBM several times; the
round-3 trace attributes ~60 ms/step (of 155) to this chain at ADE scale
(BASELINE.md "ADE fused-loss profile").

This kernel never materializes the upsampled logits. It tiles the OUTPUT
grid into row blocks; per (batch, row-tile) grid cell it

  1. reads the 2-3 low-res logit rows the tile depends on (bilinear with
     half-pixel centers touches two consecutive source rows per output row),
  2. expands width with one small MXU dot against the precomputed
     interpolation matrix, lerps rows with precomputed 3-slot weights,
  3. evaluates the CE (plain or MiB-unbiased) and KD (plain or unbiased)
     per-pixel terms in VMEM and reduces them to per-tile partial sums.

The custom-VJP backward recomputes the tile, forms the analytic per-pixel
gradient of both loss terms, and contracts it straight back to low-res
inside the kernel (sum over tile rows x one (C, W) @ (W, w) dot), so the
full-res gradient tensor never exists either. Per-tile row contributions
are combined outside with two tiny selection-matrix einsums.

Layout note: classes live on SUBLANES ((To, C, W) tiles, W on lanes), so
VOC's 21 classes pad to 24 instead of a 128-lane tile — 6x less wasted
VPU work than a channels-last layout.

Semantics match `resize_bilinear` (models/segmentation.py:40, i.e. torch
F.interpolate align_corners=False) composed with ops.losses
{cross_entropy, unbiased_cross_entropy, knowledge_distillation,
unbiased_knowledge_distillation} at reduction='mean' — verified by
tests/test_fused_loss.py against the dense composition. The kernel always
interpolates in f32 (the dense bf16_upsample path quantizes the upsampled
logits to bf16 first; the fused path is strictly more precise).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IGNORE = 255
NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# host-side interpolation plans (numpy, shapes are static)
# ---------------------------------------------------------------------------

def interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear weight matrix with half-pixel centers and edge
    clamping — `A @ x` == jax.image.resize(x, n_out, 'linear') for upsampling
    (== torch F.interpolate align_corners=False)."""
    A = np.zeros((n_out, n_in), np.float32)
    x = np.arange(n_out, dtype=np.float64)
    src = (x + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    for i in range(n_out):
        A[i, np.clip(lo[i], 0, n_in - 1)] += 1.0 - frac[i]
        A[i, np.clip(lo[i] + 1, 0, n_in - 1)] += frac[i]
    return A


def _lo_min(t: int, To: int, h: int, H: int):
    """floor(((t*To + 0.5) * h/H) - 0.5) in exact integer arithmetic; works
    for traced t (used in BlockSpec index maps)."""
    return (2 * t * To * h + h - H) // (2 * H)


def _row_plan(H: int, h: int, To: int) -> Tuple[int, int, np.ndarray]:
    """Per-output-row weights for the 3-slot source-row window of each tile.

    Slot j of tile t is source row clip(lo_min(t)+j, 0, h-1). Every bilinear
    tap of every output row in the tile lands in one of the three slots as
    long as To <= H/h (the tile's source span is then < 1 row); edge clamping
    is folded by accumulating a tap's weight onto the first slot holding the
    clamped row. Rows >= H (tile padding) get zero weights.
    Returns (nT, Hp, W3[Hp, 3])."""
    assert To * h <= H, (To, h, H)
    nT = -(-H // To)
    Hp = nT * To
    W3 = np.zeros((Hp, 3), np.float32)
    y = np.arange(H, dtype=np.float64)
    src = (y + 0.5) * (h / H) - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    for yy in range(H):
        t = yy // To
        base = _lo_min(t, To, h, H)
        slots = [min(max(base + j, 0), h - 1) for j in range(3)]
        for tap_row, tap_w in ((lo[yy], 1.0 - frac[yy]),
                               (lo[yy] + 1, frac[yy])):
            r = min(max(int(tap_row), 0), h - 1)
            W3[yy, slots.index(r)] += tap_w
    return nT, Hp, W3


def _pick_to(H: int, h: int, W: int, Cp: int, Cop: int) -> int:
    """Largest tile height <= 8 that (a) keeps the source window at 3 rows
    (To <= H/h) and (b) keeps the two upsampled (To, C, Wp) f32 tiles under
    ~12 MB of the ~16 MB/core VMEM (Mosaic reuses the loss temporaries).
    Measured on v5e at ADE scale (Cp=Cop=152, Wp=512): To=8 13.4 ms
    fwd+bwd, To=4 18.4, To=2 30.2, To=1 54.6 — grid overhead dominates
    small tiles, so prefer the largest that fits."""
    Wp = _round_up(W, 128)
    to = max(1, min(8, H // h))
    while to > 1 and 2 * 4 * to * Wp * (Cp + Cop) > 12 * 1024 * 1024:
        to //= 2
    return to


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _upsample_tile(rA, rB, rC, w3, awt):
    """(To, Cp, Wp) f32 upsampled tile from three (Cp, w) source rows.

    The width-expansion dots run at HIGHEST precision: they are tiny
    (Cp x w x Wp per tile) but their output feeds exp/log chains — MXU
    default bf16 rounding here would cost ~1e-2 of logit precision."""
    hi = jax.lax.Precision.HIGHEST
    a = jnp.dot(rA[0, 0], awt[:], preferred_element_type=jnp.float32,
                precision=hi)
    b = jnp.dot(rB[0, 0], awt[:], preferred_element_type=jnp.float32,
                precision=hi)
    c = jnp.dot(rC[0, 0], awt[:], preferred_element_type=jnp.float32,
                precision=hi)
    w = w3[0]  # (To, 128); cols 0..2 hold the slot weights
    wA = w[:, 0][:, None, None]
    wB = w[:, 1][:, None, None]
    wC = w[:, 2][:, None, None]
    return wA * a[None] + wB * b[None] + wC * c[None]


def _masked_lse(z, ok):
    """Stabilized logsumexp over the class axis (1) restricted to `ok`.
    Returns (lse (To, Wp), e (To, Cp, Wp), se (To, 1, Wp)) so callers can
    reuse the softmax pieces."""
    zm = jnp.where(ok, z, NEG)
    m = jnp.max(zm, axis=1, keepdims=True)
    e = jnp.where(ok, jnp.exp(z - m), 0.0)
    se = jnp.sum(e, axis=1, keepdims=True)
    return m[:, 0, :] + jnp.log(se[:, 0, :]), e, se


def _tile_fields(t, lab_ref, *, C, old_cl, H, W, To, ce_mode):
    """Shared per-tile masks / label fields."""
    To_, Wp = lab_ref.shape[2], lab_ref.shape[3]
    lab = lab_ref[0, 0]  # (To, Wp)
    yi = t * To + jax.lax.broadcasted_iota(jnp.int32, (To_, Wp), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (To_, Wp), 1)
    inb = (yi < H) & (xi < W)
    valid = (lab != IGNORE) & inb
    lraw = jnp.where((lab < old_cl) & valid, 0, lab) if ce_mode == "unce" \
        else lab
    safe = jnp.clip(jnp.where(valid, lraw, 0), 0, C - 1)
    return inb, valid, safe


def _loss_kernel(zA, zB, zC, tA, tB, tC, lab, w3, awt, ce_out, kd_out, *,
                 C, Co, old_cl, H, W, To, ce_mode, kd_mode, alpha):
    t = pl.program_id(1)
    z = _upsample_tile(zA, zB, zC, w3, awt)                  # (To, Cp, Wp)
    Cp, Wp = z.shape[1], z.shape[2]
    ci = jax.lax.broadcasted_iota(jnp.int32, (To, Cp, Wp), 1)
    cls_ok = ci < C
    inb, valid, safe = _tile_fields(t, lab, C=C, old_cl=old_cl, H=H, W=W,
                                    To=To, ce_mode=ce_mode)

    den, _, _ = _masked_lse(z, cls_ok)                       # (To, Wp)
    oh = (ci == safe[:, None, :]) & cls_ok
    sel = jnp.sum(jnp.where(oh, z, 0.0), axis=1)
    if ce_mode == "unce":
        lse_old, _, _ = _masked_lse(z, ci < old_cl)
        sel = jnp.where(safe == 0, lse_old, sel)
    nll = jnp.where(valid, den - sel, 0.0)
    # scalar partials broadcast into a full (8,128) block (Mosaic's minimum
    # output tile); the host reads [..., 0, 0]
    ce_out[0, 0] = jnp.full((8, 128), jnp.sum(nll), jnp.float32)

    if kd_mode == "none":
        kd_out[0, 0] = jnp.zeros((8, 128), jnp.float32)
        return
    tz = _upsample_tile(tA, tB, tC, w3, awt)
    co_ok = ci < Co
    _, e_t, se_t = _masked_lse(tz * alpha, co_ok)
    lam = e_t / se_t                                         # softmax(old)
    if kd_mode == "unkd":
        lse_bn, _, _ = _masked_lse(z, ((ci == 0) | (ci >= Co)) & cls_ok)
        lam0 = lam[:, 0, :]
        mid = co_ok & (ci >= 1)
        t2 = jnp.sum(jnp.where(mid, lam * z, 0.0), axis=1)
        s_mid = jnp.sum(jnp.where(mid, lam, 0.0), axis=1)
        term = lam0 * (lse_bn - den) + t2 - s_mid * den
    else:  # plain kd: sum_c lam_c * (z_c - lse(z[:Co]))
        lse_co, _, _ = _masked_lse(z, co_ok)
        t2 = jnp.sum(jnp.where(co_ok, lam * z, 0.0), axis=1)
        term = t2 - lse_co
    kd_out[0, 0] = jnp.full((8, 128), jnp.sum(jnp.where(inb, term, 0.0)),
                            jnp.float32)


def _grad_kernel(zA, zB, zC, tA, tB, tC, lab, w3, awt, aw, coefs,
                 dA, dB, dC, *, C, Co, old_cl, H, W, To, ce_mode, kd_mode,
                 alpha):
    t = pl.program_id(1)
    z = _upsample_tile(zA, zB, zC, w3, awt)
    Cp, Wp = z.shape[1], z.shape[2]
    ci = jax.lax.broadcasted_iota(jnp.int32, (To, Cp, Wp), 1)
    cls_ok = ci < C
    inb, valid, safe = _tile_fields(t, lab, C=C, old_cl=old_cl, H=H, W=W,
                                    To=To, ce_mode=ce_mode)

    _, e_all, se_all = _masked_lse(z, cls_ok)
    p = e_all / se_all                                       # softmax(z)
    oh = ((ci == safe[:, None, :]) & cls_ok).astype(jnp.float32)
    if ce_mode == "unce":
        _, e_o, se_o = _masked_lse(z, ci < old_cl)
        d_sel = jnp.where((safe == 0)[:, None, :], e_o / se_o, oh)
    else:
        d_sel = oh
    g = coefs[0, 0] * (p - d_sel) * valid[:, None, :]

    if kd_mode != "none":
        tz = _upsample_tile(tA, tB, tC, w3, awt)
        co_ok = ci < Co
        _, e_t, se_t = _masked_lse(tz * alpha, co_ok)
        lam = e_t / se_t
        if kd_mode == "unkd":
            _, e_s, se_s = _masked_lse(z, ((ci == 0) | (ci >= Co)) & cls_ok)
            lam0 = lam[:, 0:1, :]
            mid = co_ok & (ci >= 1)
            g_kd = lam0 * (e_s / se_s) + jnp.where(mid, lam, 0.0) - p
        else:
            _, e_co, se_co = _masked_lse(z, co_ok)
            g_kd = jnp.where(co_ok, lam - e_co / se_co, 0.0)
        g = g + coefs[0, 1] * g_kd * inb[:, None, :]

    w = w3[0]
    for j, out in enumerate((dA, dB, dC)):
        gj = jnp.sum(w[:, j][:, None, None] * g, axis=0)     # (Cp, Wp)
        out[0, 0] = jnp.dot(gj, aw[:], preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _tr_pad_classes(x, Cp, dtype=jnp.float32):
    """(B, h, w, C) → (B, h, Cp, w): classes onto sublanes, padded to Cp."""
    x = jnp.transpose(x.astype(dtype), (0, 1, 3, 2))
    return jnp.pad(x, ((0, 0), (0, 0), (0, Cp - x.shape[2]), (0, 0)))


def _interp_consts(H, h, W, w, To):
    """Shared upsample-plan constants: padded width-interp matrix
    (Wp, w) and the 3-slot row-weight plan reshaped per tile
    (nT, To, 128; cols 0..2 hold the slot weights)."""
    nT, Hp, W3 = _row_plan(H, h, To)
    Wp = _round_up(W, 128)
    A = interp_matrix(W, w)                                   # (W, w)
    Ap = np.zeros((Wp, w), np.float32)
    Ap[:W] = A
    w3p = np.zeros((Hp, 128), np.float32)
    w3p[:, :3] = W3
    return nT, Hp, Wp, Ap, w3p.reshape(nT, To, 128)


def _prep(z, tz, labels, H, W, To):
    """Transpose to (B, h, C, w), pad classes to a shared multiple of 8,
    pad labels/interp matrices to lane multiples."""
    B, h, w, C = z.shape
    Co = tz.shape[-1]
    Cp = _round_up(max(C, Co), 8)
    nT, Hp, Wp, Ap, w3p = _interp_consts(H, h, W, w, To)

    zt, tt = _tr_pad_classes(z, Cp), _tr_pad_classes(tz, Cp)
    # labels as (B, nT, To, Wp) and weights as (nT, To, 128): Mosaic block
    # shapes must have their last two dims equal to the array dims (or be
    # (8,128)-divisible), so the tile height gets its own full axis
    lab = jnp.pad(labels.astype(jnp.int32),
                  ((0, 0), (0, Hp - H), (0, Wp - W)),
                  constant_values=IGNORE).reshape(B, nT, To, Wp)
    return zt, tt, lab, jnp.asarray(Ap.T), jnp.asarray(Ap), \
        jnp.asarray(w3p), B, h, Cp, Wp, nT


def _row_specs(h, Cp, w, To, H):
    """Three overlapping-source-row input specs for one logit tensor."""
    def mk(j):
        def idx(b, t):
            r = jnp.clip(_lo_min(t, To, h, H) + j, 0, h - 1)
            return (b, r, 0, 0)
        return pl.BlockSpec((1, 1, Cp, w), idx, memory_space=pltpu.VMEM)
    return [mk(0), mk(1), mk(2)]


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, t: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused(z, tz, labels, H, W, old_cl, ce_mode, kd_mode, alpha, interpret):
    out, _ = _fused_fwd(z, tz, labels, H, W, old_cl, ce_mode, kd_mode,
                        alpha, interpret)
    return out


def _fused_fwd(z, tz, labels, H, W, old_cl, ce_mode, kd_mode, alpha,
               interpret):
    B, h, w, C = z.shape
    Co = tz.shape[-1]
    To = _pick_to(H, h, W, _round_up(max(C, Co), 8),
                  _round_up(max(C, Co), 8) if kd_mode != "none" else 0)
    zt, tt, lab, awt, aw, w3, B, h, Cp, Wp, nT = _prep(z, tz, labels, H, W,
                                                       To)
    grid = (B, nT)
    rows = _row_specs(h, Cp, w, To, H)
    in_specs = rows + rows + [
        pl.BlockSpec((1, 1, To, Wp), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, To, 128), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((w, Wp)),
    ]
    out_spec = pl.BlockSpec((1, 1, 8, 128), lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_loss_kernel, C=C, Co=Co, old_cl=old_cl, H=H,
                             W=W, To=To, ce_mode=ce_mode, kd_mode=kd_mode,
                             alpha=alpha)
    oshp = jax.ShapeDtypeStruct((B, nT, 8, 128), jnp.float32)
    ce, kd = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=(out_spec, out_spec),
        out_shape=(oshp, oshp),
        interpret=interpret,
    )(zt, zt, zt, tt, tt, tt, lab, w3, awt)
    n_pix = B * H * W
    loss_ce = jnp.sum(ce[:, :, 0, 0]) / n_pix
    loss_kd = -jnp.sum(kd[:, :, 0, 0]) / (Co * n_pix)
    return (loss_ce, loss_kd), (z, tz, labels)


def _fused_bwd(H, W, old_cl, ce_mode, kd_mode, alpha, interpret, res, cts):
    z, tz, labels = res
    ct_ce, ct_kd = cts
    B, h, w, C = z.shape
    Co = tz.shape[-1]
    To = _pick_to(H, h, W, _round_up(max(C, Co), 8),
                  _round_up(max(C, Co), 8) if kd_mode != "none" else 0)
    zt, tt, lab, awt, aw, w3, B, h, Cp, Wp, nT = _prep(z, tz, labels, H, W,
                                                       To)
    n_pix = B * H * W
    coefs = jnp.zeros((1, 128), jnp.float32)
    coefs = coefs.at[0, 0].set(ct_ce / n_pix)
    coefs = coefs.at[0, 1].set(-ct_kd / (Co * n_pix))

    grid = (B, nT)
    rows = _row_specs(h, Cp, w, To, H)
    in_specs = rows + rows + [
        pl.BlockSpec((1, 1, To, Wp), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, To, 128), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((w, Wp)),
        _const_spec((Wp, w)),
        _const_spec((1, 128)),
    ]
    d_spec = pl.BlockSpec((1, 1, Cp, w), lambda b, t: (b, t, 0, 0),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_grad_kernel, C=C, Co=Co, old_cl=old_cl, H=H,
                             W=W, To=To, ce_mode=ce_mode, kd_mode=kd_mode,
                             alpha=alpha)
    shp = jax.ShapeDtypeStruct((B, nT, Cp, w), jnp.float32)
    dA, dB, dC = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(d_spec, d_spec, d_spec), out_shape=(shp, shp, shp),
        interpret=interpret,
    )(zt, zt, zt, tt, tt, tt, lab, w3, awt, aw, coefs)

    # combine per-tile slot contributions onto source rows: S_j[r, t] = 1 iff
    # slot j of tile t is source row r (duplicates at clamped edges fold by
    # summation, mirroring _row_plan's weight folding)
    lo = np.array([_lo_min(t, To, h, H) for t in range(nT)])
    dz_t = jnp.zeros((B, h, Cp, w), jnp.float32)
    for j, d in enumerate((dA, dB, dC)):
        S = np.zeros((h, nT), np.float32)
        S[np.clip(lo + j, 0, h - 1), np.arange(nT)] = 1.0
        dz_t = dz_t + jnp.einsum("rt,btcw->brcw", jnp.asarray(S), d,
                                 precision=jax.lax.Precision.HIGHEST)
    dz = jnp.transpose(dz_t[:, :, :C, :], (0, 1, 3, 2)).astype(z.dtype)

    d_tz = jnp.zeros_like(tz)
    d_lab = np.zeros(labels.shape, jax.dtypes.float0)
    return dz, d_tz, d_lab


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def supported(lowres_shape, label_shape, ce_mode: str, kd_mode: str) -> bool:
    """Whether the fused kernel covers this configuration: an upsampling
    ratio of at least 1 source row per tile row and the plain/unbiased
    CE/KD modes (bce/icarl/focal fall back to the dense path)."""
    _, h, w, _ = lowres_shape
    H, W = label_shape[-2], label_shape[-1]
    return (H >= h and W >= w
            and ce_mode in ("ce", "unce") and kd_mode in ("none", "kd",
                                                          "unkd"))


def fused_ce_kd(logits_lr: jnp.ndarray, labels: jnp.ndarray,
                old_logits_lr: Optional[jnp.ndarray] = None, *,
                old_cl: int = 0, ce_mode: str = "ce", kd_mode: str = "none",
                alpha: float = 1.0,
                interpret: Optional[bool] = None) -> Tuple[jnp.ndarray,
                                                           jnp.ndarray]:
    """(loss_ce, loss_kd) on bilinearly-upsampled logits, fused.

    Equivalent to `resize_bilinear(logits_lr, labels.shape[1:])` followed by
    ops.losses.{cross_entropy | unbiased_cross_entropy} and
    ops.losses.{knowledge_distillation | unbiased_knowledge_distillation}
    (reduction='mean'), without materializing the upsampled tensors.
    Gradient flows to `logits_lr` only (the donor is frozen)."""
    if interpret is None:
        interpret = not _on_tpu()
    H, W = int(labels.shape[1]), int(labels.shape[2])
    if kd_mode == "none":
        # dummy single-class donor tensor; the kernel never reads it
        old_logits_lr = jnp.zeros(logits_lr.shape[:3] + (1,), jnp.float32)
    old_logits_lr = jax.lax.stop_gradient(old_logits_lr)
    return _fused(logits_lr, old_logits_lr, labels, H, W, int(old_cl),
                  ce_mode, kd_mode, float(alpha), bool(interpret))


def fused_ce_kd_dense(logits_lr, labels, old_logits_lr=None, *, old_cl=0,
                      ce_mode="ce", kd_mode="none", alpha=1.0):
    """Dense composition oracle: f32 bilinear upsample + ops.losses terms.
    Used by tests and as the non-TPU fallback semantics reference."""
    from ..models.segmentation import resize_bilinear
    from . import losses as L

    H, W = int(labels.shape[1]), int(labels.shape[2])
    up = resize_bilinear(logits_lr, (H, W), dtype=jnp.float32)
    if ce_mode == "unce":
        loss_ce = L.unbiased_cross_entropy(up, labels, old_cl)
    else:
        loss_ce = L.cross_entropy(up, labels)
    loss_kd = jnp.zeros((), jnp.float32)
    if kd_mode != "none":
        up_old = resize_bilinear(jax.lax.stop_gradient(old_logits_lr),
                                 (H, W), dtype=jnp.float32)
        kd_fn = (L.unbiased_knowledge_distillation if kd_mode == "unkd"
                 else L.knowledge_distillation)
        loss_kd = kd_fn(up, up_old, alpha=alpha)
    return loss_ce, loss_kd
