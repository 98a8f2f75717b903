"""v1 contrastive variants vs an independent torch oracle re-deriving the
reference formulas (utils/loss_new.py:264-400) — reference-stale components
kept for inventory completeness."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ucd_tpu.ops.contrastive_v1 import pixel_con_loss_v1, sup_con_loss


def torch_supcon(feats, labels=None, mask=None, tau=0.07, base_tau=0.07,
                 mode="all"):
    f = torch.from_numpy(feats)
    B, V = f.shape[0], f.shape[1]
    f = f.reshape(B, V, -1)
    if mask is None:
        if labels is None:
            m = torch.eye(B)
        else:
            lab = torch.from_numpy(labels).reshape(-1, 1)
            m = (lab == lab.T).float()
    else:
        m = torch.from_numpy(mask).float()
    contrast = torch.cat(torch.unbind(f, dim=1), dim=0)
    anchor = contrast if mode == "all" else f[:, 0]
    a_cnt = V if mode == "all" else 1
    adc = anchor @ contrast.T / tau
    logits = adc - adc.max(dim=1, keepdim=True).values.detach()
    m = m.repeat(a_cnt, V)
    lm = torch.ones_like(m)
    lm[torch.arange(B * a_cnt), torch.arange(B * a_cnt)] = 0
    m = m * lm
    expl = torch.exp(logits) * lm
    logp = logits - torch.log(expl.sum(1, keepdim=True) + 1e-6)
    mlpp = (m * logp).sum(1) / (m.sum(1) + 1e-8)
    return float((-(tau / base_tau) * mlpp).reshape(a_cnt, B).mean())


def torch_pixelcon_v1(feats, labels, tau=1.0):
    f = torch.from_numpy(feats).reshape(feats.shape[0], feats.shape[1], -1)
    B = f.shape[0]
    lab = torch.from_numpy(labels).reshape(-1, 1)
    R = (lab.T == lab).float()
    mask_p = (R - torch.eye(B)).detach()
    mask_n = (1 - R).detach()
    contrast = torch.cat(torch.unbind(f, dim=1), dim=0)
    adc = contrast @ contrast.T / tau
    neg = (torch.exp(adc) * mask_n).sum(dim=1)
    pos = (torch.log(torch.exp(adc)) * mask_p
           - torch.log(torch.exp(adc) + neg.repeat(B, 1)) * mask_p)
    num = mask_p.sum(dim=1)
    loss = -(pos.sum(dim=1)[num != 0] / num[num != 0])
    return float(loss.mean())


def _unit(rng, *shape):
    x = rng.randn(*shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("mode", ["all", "one"])
def test_supcon_labeled_parity(rng, mode):
    f = _unit(rng, 12, 2, 16)
    labels = rng.randint(0, 4, size=12).astype(np.int64)
    ours = float(sup_con_loss(jnp.array(f), jnp.array(labels),
                              contrast_mode=mode))
    ref = torch_supcon(f, labels, mode=mode)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_supcon_simclr_mode(rng):
    f = _unit(rng, 8, 2, 16)
    ours = float(sup_con_loss(jnp.array(f)))
    ref = torch_supcon(f)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pixelcon_v1_parity(rng):
    f = _unit(rng, 20, 1, 16)
    labels = rng.randint(0, 5, size=20).astype(np.int64)
    ours = float(pixel_con_loss_v1(jnp.array(f), jnp.array(labels)))
    ref = torch_pixelcon_v1(f, labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pixelcon_v1_no_positive_rows(rng):
    # all-distinct labels: every row has zero positives in mask_p except
    # none -> reference would be empty mean; ensure we handle a mix
    f = _unit(rng, 6, 1, 8)
    labels = np.array([0, 0, 1, 2, 3, 4], np.int64)
    ours = float(pixel_con_loss_v1(jnp.array(f), jnp.array(labels)))
    ref = torch_pixelcon_v1(f, labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
