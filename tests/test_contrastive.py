"""UCD contrastive machinery parity vs a torch oracle implementing the
reference v2 semantics (utils/utils.py:349-393 + utils/loss.py:403-466) with
the arity defect fixed (SURVEY.md §2.6-1)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ucd_tpu.ops.contrastive import (
    build_contrastive_batch,
    compact_batch,
    downsample_labels,
    pixel_contrastive_loss,
    ucd_contrastive_loss,
)

B, H, W, h, w, N, C = 2, 16, 16, 4, 4, 8, 6
MAX_LABEL = 5
TAU = 0.07


def torch_prep_oracle(f_n, l_n, l_po, f_o, max_label):
    """Reference pre_contractive_pixel v2, written from the math; torch NCHW.
    Returns (anchor_f, contrast_f, anchor_lbl, contrast_lbl, JM_p)."""
    out_size = f_n.shape[-2:]
    label_n = F.interpolate(l_n.float().unsqueeze(1), size=out_size,
                            mode="bilinear", align_corners=False).to(torch.int8)
    label_n[label_n < 0] = 0
    label_n[label_n > max_label] = 0
    Bt, Nt, ht, wt = f_n.shape
    f_n_ = f_n.permute(0, 2, 3, 1).reshape(Bt * ht * wt, Nt)
    f_o_ = f_o.permute(0, 2, 3, 1).reshape(Bt * ht * wt, Nt)

    flat = label_n.view(-1)
    mask_new = flat > 0
    min_new = flat[mask_new].min()
    label_po = l_po.max(dim=1)[1].view(-1).to(flat.dtype)
    label_mix = torch.where(flat == 0, label_po, flat)
    valid = label_mix > 0

    lbl_a = label_mix[valid].clone()
    lbl_c = torch.cat((lbl_a, label_mix[valid & ~mask_new]))
    A = F.normalize(f_n_[valid], dim=1)
    # the reference detaches the WHOLE contrast concat — including its
    # anchor copy (utils/utils.py:366) — so gradients flow only through the
    # anchor operand of the loss; the composed train-step parity test
    # compares at the gradient level and depends on this
    Cf = torch.cat((A, F.normalize(f_o_[valid & ~mask_new], dim=1)),
                   dim=0).detach()

    p = torch.softmax(l_po.permute(0, 2, 3, 1), dim=-1).reshape(-1, l_po.shape[1])
    p_a = p[valid]
    p_c = torch.cat((p[valid], p[valid & ~mask_new]))
    JM = p_a @ p_c.T
    is_new_a = (lbl_a >= min_new).float().unsqueeze(1)
    is_new_c = (lbl_c >= min_new).float().unsqueeze(1)
    M = is_new_a @ is_new_c.T
    JM[M == 1] = 1
    return A, Cf, lbl_a, lbl_c, JM


def torch_loss_oracle(A, Cf, lbl_a, lbl_c, P, tau, bug_compatible):
    """Reference PixelConLossV2 formula (utils/loss.py:412-466)."""
    n_a = A.shape[0]
    R = (lbl_a.view(-1, 1) == lbl_c.view(1, -1)).float()
    mask_p = R.clone()
    mask_p[:, :n_a] -= torch.eye(n_a)
    mask_n = 1 - R
    adc = (A @ Cf.T) / tau
    if bug_compatible:
        neg = (torch.exp(adc) * mask_n).sum(dim=1, keepdim=True)
        m = adc.max(dim=1, keepdim=True)[0]
        adc = adc - m
        pos = adc * mask_p * P - torch.log(torch.exp(adc) + neg) * mask_p * P
    else:
        m = adc.max(dim=1, keepdim=True)[0]
        s = adc - m
        neg = (torch.exp(s) * mask_n).sum(dim=1, keepdim=True)
        pos = (s - torch.log(torch.exp(s) + neg)) * mask_p * P
    num = mask_p.sum(dim=1)
    loss = -(pos.sum(dim=1)[num != 0] / num[num != 0])
    return loss.mean()


@pytest.fixture
def inputs(rng):
    f_n = rng.randn(B, h, w, N).astype(np.float32)
    f_o = rng.randn(B, h, w, N).astype(np.float32)
    l_po = rng.randn(B, h, w, C).astype(np.float32) * 3
    labels = rng.randint(0, MAX_LABEL + 1, size=(B, H, W)).astype(np.int32)
    labels[0, :4, :4] = 255  # ignored region
    return f_n, labels, l_po, f_o


def to_torch(x):
    if x.ndim == 4:
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    return torch.from_numpy(x.copy())


def test_downsample_labels(inputs):
    _, labels, _, _ = inputs
    ours = np.asarray(downsample_labels(jnp.array(labels), (h, w), MAX_LABEL))
    ref = F.interpolate(torch.from_numpy(labels).float().unsqueeze(1),
                        size=(h, w), mode="bilinear",
                        align_corners=False).to(torch.int8)
    ref[ref < 0] = 0
    ref[ref > MAX_LABEL] = 0
    np.testing.assert_array_equal(ours, ref.squeeze(1).numpy())


@pytest.mark.parametrize("bug_compatible", [False, True])
def test_loss_parity_full(inputs, bug_compatible):
    f_n, labels, l_po, f_o = inputs
    batch = build_contrastive_batch(jnp.array(f_n), jnp.array(labels),
                                    jnp.array(l_po), jnp.array(f_o), MAX_LABEL)
    ours = pixel_contrastive_loss(batch, TAU, bug_compatible=bug_compatible)

    A, Cf, la, lc, JM = torch_prep_oracle(
        to_torch(f_n), to_torch(labels), to_torch(l_po), to_torch(f_o),
        MAX_LABEL)
    ref = torch_loss_oracle(A, Cf, la, lc, JM, TAU, bug_compatible)
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_compact_matches_full(inputs):
    """Compaction with capacity >= #valid anchors must not change the loss."""
    f_n, labels, l_po, f_o = inputs
    batch = build_contrastive_batch(jnp.array(f_n), jnp.array(labels),
                                    jnp.array(l_po), jnp.array(f_o), MAX_LABEL)
    n_valid = int(np.asarray(batch.anchor_valid).sum())
    small = compact_batch(batch, n_valid)
    full = pixel_contrastive_loss(batch, TAU)
    compacted = pixel_contrastive_loss(small, TAU)
    np.testing.assert_allclose(float(full), float(compacted), rtol=1e-5)


def test_batch_layout(inputs):
    f_n, labels, l_po, f_o = inputs
    batch = build_contrastive_batch(jnp.array(f_n), jnp.array(labels),
                                    jnp.array(l_po), jnp.array(f_o), MAX_LABEL)
    P = B * h * w
    assert batch.anchor_feat.shape == (P, N)
    assert batch.contrast_feat.shape == (2 * P, N)
    av = np.asarray(batch.anchor_valid)
    cv = np.asarray(batch.contrast_valid)
    # contrast slot j mirrors anchor j; old-feature slots exclude GT-new pixels
    np.testing.assert_array_equal(cv[:P], av)
    assert (cv[P:] <= av).all()
    # normalized features
    norms = np.linalg.norm(np.asarray(batch.anchor_feat), axis=1)
    np.testing.assert_allclose(norms[av], 1.0, rtol=1e-5)


def test_grad_flows_only_through_anchor(inputs):
    import jax
    f_n, labels, l_po, f_o = inputs

    def loss_fn(fn, fo):
        return ucd_contrastive_loss(fn, jnp.array(labels), jnp.array(l_po),
                                    fo, MAX_LABEL, TAU)

    g_fn, g_fo = jax.grad(loss_fn, argnums=(0, 1))(jnp.array(f_n),
                                                   jnp.array(f_o))
    assert float(jnp.abs(g_fn).sum()) > 0
    # contrast set is detached (reference utils/utils.py:366): no grad to f_o
    assert float(jnp.abs(g_fo).sum()) == 0


def test_no_new_pixels_no_nan(rng):
    """Batch whose downsampled labels are all background must not NaN."""
    f_n = rng.randn(B, h, w, N).astype(np.float32)
    f_o = rng.randn(B, h, w, N).astype(np.float32)
    l_po = rng.randn(B, h, w, C).astype(np.float32)
    labels = np.zeros((B, H, W), np.int32)
    loss = ucd_contrastive_loss(jnp.array(f_n), jnp.array(labels),
                                jnp.array(l_po), jnp.array(f_o), MAX_LABEL, TAU)
    assert np.isfinite(float(loss))


def test_dense_grad_finite_with_invalid_anchor_rows(rng):
    """Regression: an anchor row whose pairs are ALL invalid used to get
    row_max=-1e30 -> exp overflow -> nan leaking into the gradient through
    the final where (forward was masked, backward was not)."""
    import jax
    from ucd_tpu.ops.contrastive import build_contrastive_batch

    f_n = rng.randn(2, 8, 8, 8).astype(np.float32)
    f_o = rng.randn(2, 8, 8, 8).astype(np.float32)
    l_po = rng.randn(2, 8, 8, 9).astype(np.float32) * 3
    labels = rng.randint(0, 9, size=(2, 32, 32)).astype(np.int32)
    labels[0] = 0          # an entire image of background -> invalid anchors
    batch = build_contrastive_batch(jnp.array(f_n), jnp.array(labels),
                                    jnp.array(l_po), jnp.array(f_o), 8)
    assert not bool(jnp.all(batch.anchor_valid))
    loss, g = jax.value_and_grad(
        lambda af: pixel_contrastive_loss(batch._replace(anchor_feat=af),
                                          0.07))(batch.anchor_feat)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all(), "nan/inf in dense grad"
