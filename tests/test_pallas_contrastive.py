"""Pallas contrastive kernel vs the dense jnp reference implementation
(interpret mode on CPU; SURVEY.md §7 testing strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu.ops.contrastive import (
    build_contrastive_batch,
    pixel_contrastive_loss,
)
from ucd_tpu.ops.pallas_contrastive import pixel_contrastive_loss_pallas

TAU = 0.07


def make_batch(rng, B=2, H=32, W=32, h=8, w=8, N=16, C=6, max_label=5,
               with_ignore=True):
    f_n = rng.randn(B, h, w, N).astype(np.float32)
    f_o = rng.randn(B, h, w, N).astype(np.float32)
    l_po = rng.randn(B, h, w, C).astype(np.float32) * 3
    labels = rng.randint(0, max_label + 1, size=(B, H, W)).astype(np.int32)
    if with_ignore:
        labels[0, :6, :6] = 255
    return build_contrastive_batch(jnp.array(f_n), jnp.array(labels),
                                   jnp.array(l_po), jnp.array(f_o), max_label)


def test_forward_matches_dense(rng):
    batch = make_batch(rng)
    dense = pixel_contrastive_loss(batch, TAU)
    kernel = pixel_contrastive_loss_pallas(batch, TAU, interpret=True)
    np.testing.assert_allclose(float(kernel), float(dense), rtol=1e-5)


def test_forward_matches_dense_nonaligned_sizes(rng):
    # P=2*5*5=50 (not a multiple of the 256 tile), C=7 (not 128-aligned)
    batch = make_batch(rng, B=2, H=20, W=20, h=5, w=5, N=8, C=7)
    dense = pixel_contrastive_loss(batch, TAU)
    kernel = pixel_contrastive_loss_pallas(batch, TAU, interpret=True)
    np.testing.assert_allclose(float(kernel), float(dense), rtol=1e-5)


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_gradient_matches_dense(rng):
    batch = make_batch(rng, B=1, H=16, W=16, h=4, w=4, N=8, C=5)

    g_dense = jax.grad(
        lambda af: pixel_contrastive_loss(batch._replace(anchor_feat=af), TAU)
    )(batch.anchor_feat)
    g_kernel = jax.grad(
        lambda af: pixel_contrastive_loss_pallas(
            batch._replace(anchor_feat=af), TAU, interpret=True)
    )(batch.anchor_feat)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-6)


def test_no_valid_anchors_finite(rng):
    f = jnp.zeros((1, 4, 4, 8))
    l_po = jnp.array(rng.randn(1, 4, 4, 5), jnp.float32)
    labels = jnp.zeros((1, 16, 16), jnp.int32)
    batch = build_contrastive_batch(f, labels, l_po, f, 5)
    # old-model argmax can still pseudo-label pixels; just require finiteness
    loss = pixel_contrastive_loss_pallas(batch, TAU, interpret=True)
    assert np.isfinite(float(loss))


def test_under_jit_and_grad(rng):
    batch = make_batch(rng, B=1, H=16, W=16, h=4, w=4, N=8, C=5)

    @jax.jit
    def f(af):
        return pixel_contrastive_loss_pallas(
            batch._replace(anchor_feat=af), TAU, interpret=True)

    loss, grad = jax.value_and_grad(f)(batch.anchor_feat)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()


def test_ade_scale_class_count(rng):
    """ADE configuration: C=151 old-logit channels cross the 128-wide prob
    tile boundary in the kernel's _prep padding (VERDICT round-2 weak #5)."""
    batch = make_batch(rng, B=1, H=32, W=32, h=8, w=8, N=16, C=151,
                       max_label=150)
    dense = pixel_contrastive_loss(batch, TAU)
    kernel = pixel_contrastive_loss_pallas(batch, TAU, interpret=True)
    np.testing.assert_allclose(float(kernel), float(dense), rtol=1e-5)


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_capacity_compaction_nonaligned(rng):
    """Capacity compaction to a non-tile-multiple anchor budget (P=100,
    M=200) still matches the dense loss on the same compacted batch."""
    from ucd_tpu.ops.contrastive import compact_batch
    batch = make_batch(rng, B=2, H=32, W=32, h=8, w=8, N=8, C=9, max_label=8)
    batch = compact_batch(batch, 100)  # P: 128 -> 100 (not tile-aligned)
    assert batch.anchor_feat.shape[0] == 100
    dense = pixel_contrastive_loss(batch, TAU)
    kernel = pixel_contrastive_loss_pallas(batch, TAU, interpret=True)
    np.testing.assert_allclose(float(kernel), float(dense), rtol=1e-5)


def test_pallas_bug_compatible_is_an_error(rng):
    """use_pallas + bug_compatible must raise, not silently fall back to the
    dense path (VERDICT round-2 weak #5)."""
    from ucd_tpu.ops.contrastive import ucd_contrastive_loss
    f = jnp.array(rng.randn(1, 4, 4, 8), jnp.float32)
    l_po = jnp.array(rng.randn(1, 4, 4, 5), jnp.float32)
    labels = jnp.zeros((1, 16, 16), jnp.int32)
    with pytest.raises(ValueError, match="bug_compatible"):
        ucd_contrastive_loss(f, labels, l_po, f, max_label=5,
                             use_pallas=True, bug_compatible=True)

    from ucd_tpu import config
    with pytest.raises(ValueError, match="no_pallas"):
        config.make_config(dataset="voc", task="15-5s", step=1, method="UCD",
                           contrastive_bug_compatible=True)


def test_bf16_mode_close_to_dense(rng):
    """compute_dtype=bfloat16 (the bf16-training fast path: bf16 tiles,
    TC_BF16 contrast tile) stays within bf16 rounding of the dense f32
    loss, fwd and bwd."""
    batch = make_batch(rng, B=2, H=32, W=32, h=8, w=8, N=8, C=9, max_label=8)
    dense = pixel_contrastive_loss(batch, TAU)
    kernel = pixel_contrastive_loss_pallas(batch, TAU, interpret=True,
                                           compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(float(kernel), float(dense), rtol=3e-2)

    g_dense = jax.grad(
        lambda af: pixel_contrastive_loss(batch._replace(anchor_feat=af), TAU)
    )(batch.anchor_feat)
    g_kernel = jax.grad(
        lambda af: pixel_contrastive_loss_pallas(
            batch._replace(anchor_feat=af), TAU, interpret=True,
            compute_dtype=jnp.bfloat16)
    )(batch.anchor_feat)
    scale = np.abs(np.asarray(g_dense)).max()
    relerr = np.abs(np.asarray(g_kernel) - np.asarray(g_dense)).max() / scale
    assert relerr < 5e-2, f"bf16 grad relerr {relerr:.3e}"
