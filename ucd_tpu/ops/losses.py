"""Segmentation & distillation losses as pure jnp functions.

Rebuild of the reference method layer (/root/reference/utils/loss.py:13-256).
All functions take NHWC logits `(B, H, W, C)` and integer labels `(B, H, W)`
with ignore value 255, and are jit/grad-safe (no data-dependent shapes).

Reduction semantics follow the call sites in the reference Trainer
(train.py:110-133): the criterion is built with reduction='none' and `.mean()`
is applied over *all* pixels (ignored pixels contribute 0 to the numerator but
still count in the denominator) — reproduced here by `reduction='mean_all'`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE = 255


def _reduce(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def _gather_class(x, idx):
    """x[..., idx] over the trailing class dim via a one-hot contraction.

    TPU-critical: `jnp.take_along_axis` lowers to an HBM-bound scalar gather
    (profiled at 64 ms/step on v5e for a (16,512²,21) tensor — 1/3 of the
    whole UCD train step); the one-hot multiply+reduce fuses into the
    surrounding elementwise chain and its gradient is a scatter-free mask."""
    oh = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
    return jnp.sum(x * oh, axis=-1)


def cross_entropy(logits, labels, ignore_index: int = IGNORE,
                  reduction: str = "mean") -> jnp.ndarray:
    """torch CrossEntropyLoss(ignore_index=255, reduction='none') -> .mean().

    reduction='mean' divides by the count of ALL pixels (matching the
    reference's reduction='none' + .mean(), train.py:112).
    nll = logsumexp(logits) - logits[label] — no log_softmax intermediate."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    den = jax.nn.logsumexp(logits, axis=-1)
    nll = den - _gather_class(logits, safe)
    nll = jnp.where(valid, nll, 0.0)
    return _reduce(nll, reduction)


def focal_loss(logits, labels, alpha: float = 1.0, gamma: float = 2.0,
               ignore_index: int = IGNORE, size_average: bool = True):
    """(1-pt)^gamma-weighted CE (reference utils/loss.py:13-28)."""
    ce = cross_entropy(logits, labels, ignore_index, reduction="none")
    pt = jnp.exp(-ce)
    fl = alpha * (1 - pt) ** gamma * ce
    return jnp.mean(fl) if size_average else jnp.sum(fl)


def _one_hot_ignore(labels, n_classes: int, ignore_index: int = IGNORE):
    """One-hot with ignore folded to an extra class then sliced off
    (reference utils/loss.py:39-43). Returns (B,H,W,C) float."""
    labels_new = jnp.where(labels != ignore_index, labels, n_classes)
    oh = jax.nn.one_hot(labels_new, n_classes + 1, dtype=jnp.float32)
    return oh[..., :n_classes]


def _bce_with_logits(logits, targets):
    """Elementwise binary cross entropy with logits (stable)."""
    logits = logits.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def bce_with_logits_ignore(logits, labels, ignore_index: int = IGNORE,
                           reduction: str = "mean"):
    """BCEWithLogitsLossWithIgnoreIndex (reference utils/loss.py:31-54):
    per-pixel sum over classes; mean over pixels whose one-hot target is
    non-empty (i.e. non-ignored)."""
    n_cl = logits.shape[-1]
    targets = _one_hot_ignore(labels, n_cl, ignore_index)
    loss = _bce_with_logits(logits, targets).sum(axis=-1)  # B,H,W
    valid = targets.sum(axis=-1) != 0
    if reduction == "mean":
        # the class's reduction='mean' branch: masked-select mean
        return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)
    if reduction == "mean_all":
        # the Trainer call path: reduction='none' -> .mean() over ALL pixels
        # (train.py:36 + train.py:112; masked loss, full-count denominator)
        return jnp.mean(jnp.where(valid, loss, 0.0))
    if reduction == "sum":
        return jnp.sum(jnp.where(valid, loss, 0.0))
    return loss * targets.sum(axis=-1)


def icarl_loss(logits, labels, outputs_old_sig, bkg: bool = False,
               ignore_index: int = IGNORE, reduction: str = "mean"):
    """IcarlLoss (reference utils/loss.py:57-86): BCE where the old-class
    columns of the one-hot target are replaced by sigmoid(old logits)
    (`outputs_old_sig`, already sigmoided at the call site, train.py:216).
    With bkg=True, keep the GT background column."""
    n_cl = logits.shape[-1]
    n_old = outputs_old_sig.shape[-1]
    targets = _one_hot_ignore(labels, n_cl, ignore_index)
    if bkg:
        targets = jnp.concatenate(
            [targets[..., :1], outputs_old_sig[..., 1:], targets[..., n_old:]],
            axis=-1)
    else:
        targets = jnp.concatenate([outputs_old_sig, targets[..., n_old:]],
                                  axis=-1)
    loss = _bce_with_logits(logits, targets).sum(axis=-1)
    return _reduce(loss, reduction)


def icarl_combined_loss(logits, outputs_old, importance: float):
    """iCaRL combined mode (reference train.py:119-124): plain mean BCE between
    the new model's old-class logits and sigmoid(old logits), scaled by
    importance * n_old (to sum over classes rather than average)."""
    n_old = outputs_old.shape[-1]
    bce = jnp.mean(_bce_with_logits(logits[..., :n_old],
                                    jax.nn.sigmoid(outputs_old.astype(jnp.float32))))
    return importance * n_old * bce


def unbiased_cross_entropy(logits, labels, old_cl: int,
                           ignore_index: int = IGNORE,
                           reduction: str = "mean"):
    """MiB UnbiasedCrossEntropy (reference utils/loss.py:89-109):
    p(bkg) := logsumexp over {bkg ∪ old classes} − logsumexp(all);
    new classes get standard log-softmax; labels < old_cl mapped to 0."""
    logits = logits.astype(jnp.float32)
    den = jax.nn.logsumexp(logits, axis=-1)                  # B,H,W
    lse_old = jax.nn.logsumexp(logits[..., :old_cl], axis=-1)
    # labels < old_cl are remapped to 0, which selects
    # p(bkg) = lse_old - den; new classes select logits[label] - den.
    # (The reference materializes a concat [p_bkg, zeros, p_new] and gathers
    # from it, utils/loss.py:100-106 — equivalent math, but the concat +
    # take_along_axis cost ~73 ms/step on TPU; see _gather_class.)
    labels = jnp.where((labels < old_cl) & (labels != ignore_index), 0, labels)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    sel = jnp.where(safe == 0, lse_old, _gather_class(logits, safe))
    nll = jnp.where(valid, den - sel, 0.0)
    return _reduce(nll, reduction)


def knowledge_distillation(inputs, targets, alpha: float = 1.0,
                           mask: Optional[jnp.ndarray] = None,
                           reduction: str = "mean"):
    """Soft cross-entropy between log_softmax(new logits narrowed to old C)
    and softmax(alpha * old logits), averaged over classes
    (reference utils/loss.py:112-136)."""
    n_old = targets.shape[-1]
    outputs = jax.nn.log_softmax(inputs[..., :n_old].astype(jnp.float32),
                                 axis=-1)
    labels = jax.nn.softmax(targets.astype(jnp.float32) * alpha, axis=-1)
    loss = (outputs * labels).mean(axis=-1)  # B,H,W
    if mask is not None:
        loss = loss * mask.astype(jnp.float32)
    return -_reduce(loss, reduction)


def unbiased_knowledge_distillation(inputs, targets, alpha: float = 1.0,
                                    mask: Optional[jnp.ndarray] = None,
                                    reduction: str = "mean"):
    """MiB UnbiasedKnowledgeDistillationLoss (reference utils/loss.py:139-184):
    the old model's bkg probability is matched against logsumexp over
    {bkg ∪ new classes} of the new model; old-class probabilities matched
    directly. (The reference also computes an unused GAP 'gamma' encoding at
    utils/loss.py:155-156 — omitted.)"""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32) * alpha
    n_tot, n_old_tot = inputs.shape[-1], targets.shape[-1]
    new_cl = n_tot - n_old_tot

    den = jax.nn.logsumexp(inputs, axis=-1)                        # B,H,W
    outputs_no_bkg = inputs[..., 1:-new_cl] - den[..., None]       # old classes
    bkg_new = jnp.concatenate([inputs[..., :1], inputs[..., n_old_tot:]],
                              axis=-1)
    outputs_bkg = jax.nn.logsumexp(bkg_new, axis=-1) - den         # B,H,W

    labels = jax.nn.softmax(targets, axis=-1)
    loss = (labels[..., 0] * outputs_bkg
            + (labels[..., 1:] * outputs_no_bkg).sum(axis=-1)) / n_old_tot
    if mask is not None:
        loss = loss * mask.astype(jnp.float32)
    return -_reduce(loss, reduction)


def feature_distillation(feat_new, feat_old):
    """ILT 'lde' term: MSE between new/old features (reference train.py:127-129,
    nn.MSELoss default mean)."""
    return jnp.mean(
        (feat_new.astype(jnp.float32) - feat_old.astype(jnp.float32)) ** 2)


def mask_cross_entropy(logits, labels, old_cl: int,
                       outputs_old: Optional[jnp.ndarray] = None,
                       ignore_index: int = IGNORE, reduction: str = "mean"):
    """Pseudo-label-masked unbiased CE (reference utils/loss.py:186-216; not
    wired into the reference CLI). The mask keeps pixels where the old model
    predicts background or the GT is a new class.

    Note: the reference returns `-mean(nll)` (a negated positive loss, shipped
    oddity); we return the positive loss (intended semantics)."""
    logits = logits.astype(jnp.float32)
    den = jax.nn.logsumexp(logits, axis=-1)
    lse_old = jax.nn.logsumexp(logits[..., :old_cl], axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    # channel selection without the concat+gather (see _gather_class):
    # 0 -> p_bkg = lse_old - den; 1..old_cl-1 are zero channels in the
    # reference's concat (labels there are NOT remapped) -> nll 0;
    # >= old_cl -> logits[label] - den
    in_zero = (safe > 0) & (safe < old_cl)
    sel = jnp.where(safe == 0, lse_old, _gather_class(logits, safe))
    nll = jnp.where(in_zero, 0.0, den - sel)
    nll = jnp.where(valid, nll, 0.0)
    if outputs_old is not None:
        pseudo = jnp.argmax(outputs_old, axis=-1)
        mask = (pseudo == 0) | (labels > old_cl)
        nll = nll * mask.astype(jnp.float32)
    return _reduce(nll, reduction)


def mask_knowledge_distillation(inputs, targets, alpha: float = 1.0,
                                mask: Optional[jnp.ndarray] = None,
                                reduction: str = "mean"):
    """Unbiased KD restricted to mask==0 pixels (reference utils/loss.py:218-256;
    not wired into the reference CLI)."""
    inv_mask = None if mask is None else (mask == 0)
    return unbiased_knowledge_distillation(inputs, targets, alpha=alpha,
                                           mask=inv_mask, reduction=reduction)
