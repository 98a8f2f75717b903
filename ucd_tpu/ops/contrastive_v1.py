"""v1 contrastive-loss variants (reference utils/loss_new.py:264-400).

These are the STALE earlier iterations of the UCD contrastive machinery: the
reference keeps them in `loss_new.py`, which is never imported by the main
path (SURVEY.md §2.6-8). Reproduced here purely for inventory completeness —
the product path uses `ops.contrastive` (v2 + uncertainty weighting) /
`ops.pallas_contrastive`.

Semantics preserved verbatim, including the v1 quirks:

  * `sup_con_loss` — SupCon (Khosla et al.) with SimCLR degenerate mode:
    row-max-stabilized softmax over non-self contrast columns, +1e-6 /
    +1e-8 epsilons, loss scaled by temperature/base_temperature.
  * `pixel_con_loss_v1` — per-pixel supervised contrastive without the JM_p
    uncertainty weighting; the negative sum added inside the log is the
    CONTRAST column's row-sum (`neg.repeat(batch,1)` => neg[j] at [i,j]),
    not the anchor row's — an asymmetry the v2 rewrite removed; anchors with
    no positives are excluded from the mean.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sup_con_loss(features: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 temperature: float = 0.07, base_temperature: float = 0.07,
                 contrast_mode: str = "all") -> jnp.ndarray:
    """features: (B, V, D) L2-normalized views. labels: (B,) int or None
    (None + no mask = SimCLR self-supervised mode)."""
    assert features.ndim >= 3, "features must be (B, V, ...)"
    B, V = features.shape[0], features.shape[1]
    feats = features.reshape(B, V, -1).astype(jnp.float32)

    if mask is None:
        if labels is None:
            mask = jnp.eye(B, dtype=jnp.float32)
        else:
            lab = labels.reshape(-1, 1)
            mask = (lab == lab.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    # torch.cat(torch.unbind(features, dim=1)): view-major stacking (V*B, D)
    contrast = jnp.concatenate([feats[:, v] for v in range(V)], axis=0)
    if contrast_mode == "one":
        anchor, anchor_count = feats[:, 0], 1
    elif contrast_mode == "all":
        anchor, anchor_count = contrast, V
    else:
        raise ValueError(f"unknown mode {contrast_mode!r}")

    adc = (anchor @ contrast.T) / temperature
    logits = adc - jax.lax.stop_gradient(jnp.max(adc, axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, V))
    n_a = B * anchor_count
    # self-contrast exclusion: zero at column i of row i
    logits_mask = 1.0 - jnp.eye(n_a, B * V, dtype=jnp.float32)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True)
                                + 1e-6)
    mean_log_prob_pos = (jnp.sum(mask * log_prob, axis=1)
                         / (jnp.sum(mask, axis=1) + 1e-8))
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return loss.reshape(anchor_count, B).mean()


def pixel_con_loss_v1(features: jnp.ndarray, labels: jnp.ndarray,
                      temperature: float = 1.0) -> jnp.ndarray:
    """features: (B, 1, D) pixel embeddings; labels: (B,) int."""
    assert features.ndim >= 3
    B = features.shape[0]
    feats = features.reshape(B, features.shape[1], -1).astype(jnp.float32)
    contrast = feats[:, 0]

    lab = labels.reshape(-1, 1)
    R = (lab == lab.T).astype(jnp.float32)
    mask_p = jax.lax.stop_gradient(R - jnp.eye(B, dtype=jnp.float32))
    mask_n = jax.lax.stop_gradient(1.0 - R)

    adc = (contrast @ contrast.T) / temperature
    e = jnp.exp(adc)
    neg = jnp.sum(e * mask_n, axis=1)                      # (B,)
    # v1 quirk kept: the added negative sum is neg[j] (column's), not neg[i]
    pos = adc * mask_p - jnp.log(e + neg[None, :]) * mask_p
    num = jnp.sum(mask_p, axis=1)
    has_pos = num > 0
    per_anchor = -jnp.sum(pos, axis=1) / jnp.maximum(num, 1.0)
    n_active = jnp.maximum(jnp.sum(has_pos), 1)
    return jnp.sum(jnp.where(has_pos, per_anchor, 0.0)) / n_active
