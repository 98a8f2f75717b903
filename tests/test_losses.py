"""Loss math parity vs independent torch oracles.

The reference repo has no tests (SURVEY.md §4); parity oracles are rebuilt
here from the loss formulas using torch-CPU, structured after the reference
definitions in utils/loss.py so every jnp loss is pinned to the exact
reference semantics on random tensors.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ucd_tpu.ops import losses

B, H, W, C = 2, 8, 9, 7
IGN = 255


@pytest.fixture
def data(rng):
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, size=(B, H, W)).astype(np.int32)
    labels[0, :2, :3] = IGN  # some ignored pixels
    return logits, labels


def t(x):  # NHWC numpy -> NCHW torch
    if x.ndim == 4:
        return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))
    return torch.from_numpy(np.ascontiguousarray(x))


def test_cross_entropy(data):
    logits, labels = data
    ours = losses.cross_entropy(jnp.array(logits), jnp.array(labels))
    ref = F.cross_entropy(t(logits), t(labels).long(), ignore_index=IGN,
                          reduction="none").mean()  # reference train.py:112
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_focal_loss(data):
    logits, labels = data
    ours = losses.focal_loss(jnp.array(logits), jnp.array(labels))
    ce = F.cross_entropy(t(logits), t(labels).long(), reduction="none",
                         ignore_index=IGN)
    pt = torch.exp(-ce)
    ref = (1.0 * (1 - pt) ** 2 * ce).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def bce_ignore_oracle(logits_t, labels_t):
    n_cl = logits_t.shape[1]
    labels_new = torch.where(labels_t != IGN, labels_t, torch.tensor(n_cl))
    tgt = F.one_hot(labels_new.long(), n_cl + 1).float().permute(0, 3, 1, 2)
    tgt = tgt[:, :n_cl]
    loss = F.binary_cross_entropy_with_logits(logits_t, tgt, reduction="none")
    loss = loss.sum(dim=1)
    return torch.masked_select(loss, tgt.sum(dim=1) != 0).mean()


def test_bce_with_ignore(data):
    logits, labels = data
    ours = losses.bce_with_logits_ignore(jnp.array(logits), jnp.array(labels))
    ref = bce_ignore_oracle(t(logits), t(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_unbiased_cross_entropy(data):
    logits, labels = data
    old_cl = 4
    ours = losses.unbiased_cross_entropy(jnp.array(logits), jnp.array(labels),
                                         old_cl)
    # oracle per reference utils/loss.py:96-109
    inp = t(logits)
    lab = t(labels).long().clone()
    out = torch.zeros_like(inp)
    den = torch.logsumexp(inp, dim=1)
    out[:, 0] = torch.logsumexp(inp[:, 0:old_cl], dim=1) - den
    out[:, old_cl:] = inp[:, old_cl:] - den.unsqueeze(1)
    lab[(lab < old_cl) & (lab != IGN)] = 0
    ref = F.nll_loss(out, lab, ignore_index=IGN, reduction="none").mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_knowledge_distillation(rng, data):
    logits, _ = data
    C_old = 5
    targets = rng.randn(B, H, W, C_old).astype(np.float32)
    for alpha in (1.0, 2.0):
        ours = losses.knowledge_distillation(jnp.array(logits),
                                             jnp.array(targets), alpha=alpha)
        inp = t(logits)[:, :C_old]
        out = torch.log_softmax(inp, dim=1)
        lab = torch.softmax(t(targets) * alpha, dim=1)
        ref = -(out * lab).mean(dim=1).mean()
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_unbiased_knowledge_distillation(rng, data):
    logits, _ = data
    C_old = 5  # includes bkg
    targets = rng.randn(B, H, W, C_old).astype(np.float32)
    ours = losses.unbiased_knowledge_distillation(jnp.array(logits),
                                                  jnp.array(targets))
    # oracle per reference utils/loss.py:148-184
    inp, tgt = t(logits), t(targets)
    new_cl = inp.shape[1] - tgt.shape[1]
    new_bkg_idx = torch.tensor([0] + list(range(tgt.shape[1], inp.shape[1])))
    den = torch.logsumexp(inp, dim=1)
    out_no_bkg = inp[:, 1:-new_cl] - den.unsqueeze(1)
    out_bkg = torch.logsumexp(torch.index_select(inp, 1, new_bkg_idx), dim=1) - den
    lab = torch.softmax(tgt, dim=1)
    ref = -((lab[:, 0] * out_bkg
             + (lab[:, 1:] * out_no_bkg).sum(dim=1)) / tgt.shape[1]).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_icarl_loss(rng, data):
    logits, labels = data
    n_old = 4
    old_sig = torch.sigmoid(torch.from_numpy(
        rng.randn(B, H, W, n_old).astype(np.float32)))
    ours = losses.icarl_loss(jnp.array(logits), jnp.array(labels),
                             jnp.array(old_sig.numpy()))
    # oracle per reference utils/loss.py:64-86 (bkg=False)
    inp, lab = t(logits), t(labels)
    n_cl = inp.shape[1]
    labels_new = torch.where(lab != IGN, lab, torch.tensor(n_cl))
    tgt = F.one_hot(labels_new.long(), n_cl + 1).float().permute(0, 3, 1, 2)
    tgt = tgt[:, :n_cl].clone()
    tgt[:, :n_old] = t(old_sig.numpy())
    ref = F.binary_cross_entropy_with_logits(inp, tgt, reduction="none")
    ref = ref.sum(dim=1).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_icarl_combined(rng, data):
    logits, _ = data
    n_old = 4
    out_old = rng.randn(B, H, W, n_old).astype(np.float32)
    ours = losses.icarl_combined_loss(jnp.array(logits), jnp.array(out_old),
                                      importance=10.0)
    ref = 10.0 * n_old * F.binary_cross_entropy_with_logits(
        t(logits)[:, :n_old], torch.sigmoid(t(out_old)), reduction="mean")
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_feature_distillation(rng):
    a = rng.randn(B, 4, 4, 16).astype(np.float32)
    b = rng.randn(B, 4, 4, 16).astype(np.float32)
    ours = losses.feature_distillation(jnp.array(a), jnp.array(b))
    ref = F.mse_loss(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_mask_cross_entropy(rng, data):
    logits, labels = data
    old_cl = 4
    out_old = rng.randn(B, H, W, old_cl).astype(np.float32)
    ours = losses.mask_cross_entropy(jnp.array(logits), jnp.array(labels),
                                     old_cl, jnp.array(out_old))
    # oracle: nll on unbiased outputs, masked where old predicts bkg or GT new
    inp, lab = t(logits), t(labels).long()
    out = torch.zeros_like(inp)
    den = torch.logsumexp(inp, dim=1)
    out[:, 0] = torch.logsumexp(inp[:, 0:old_cl], dim=1) - den
    out[:, old_cl:] = inp[:, old_cl:] - den.unsqueeze(1)
    nll = F.nll_loss(out, lab, ignore_index=IGN, reduction="none")
    pseudo = t(out_old).argmax(dim=1)
    mask = ((pseudo == 0) | (lab > old_cl)).float()
    ref = (nll * mask).mean()  # positive-sign intended semantics
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_mean_all_matches_trainer_call_path(data):
    """Training call path: reduction='none' -> .mean() over ALL pixels
    (reference train.py:36,112)."""
    logits, labels = data
    ours = losses.bce_with_logits_ignore(jnp.array(logits), jnp.array(labels),
                                         reduction="mean_all")
    inp, lab = t(logits), t(labels)
    n_cl = inp.shape[1]
    labels_new = torch.where(lab != IGN, lab, torch.tensor(n_cl))
    tgt = F.one_hot(labels_new.long(), n_cl + 1).float().permute(0, 3, 1, 2)
    tgt = tgt[:, :n_cl]
    loss = F.binary_cross_entropy_with_logits(inp, tgt, reduction="none")
    loss = loss.sum(dim=1)
    ref = (loss * (tgt.sum(dim=1) != 0).float()).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
