"""Auxiliary parity components: non-local block, Sinkhorn-Knopp,
group_images, GroupNorm ABN variant, native host ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu.data.incremental import group_images
from ucd_tpu.models.nonlocal_block import NonLocalBlock2D
from ucd_tpu.ops.assignment import shoot_infs, sinkhorn_knopp


def test_nonlocal_block_shapes(rng):
    x = jnp.array(rng.randn(2, 8, 8, 16), jnp.float32)
    block = NonLocalBlock2D()
    variables = block.init(jax.random.key(0), x, train=False)
    y = block.apply(variables, x, train=False)
    assert y.shape == x.shape
    # zero-init BN scale -> identity at init (reference zero-init W intent)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_shoot_infs():
    x = jnp.array([1.0, jnp.inf, 3.0])
    out = np.asarray(shoot_infs(x))
    np.testing.assert_allclose(out, [1.0, 3.0, 3.0])


def test_sinkhorn_doubly_stochastic(rng):
    logits = jnp.array(rng.randn(27, 3), jnp.float32)
    q = sinkhorn_knopp(logits, num_iters=10)
    assert q.shape == (27, 3)
    # output convention (Q / Q.sum(0)).T: each row is a normalized
    # prototype-assignment distribution
    np.testing.assert_allclose(np.asarray(q).sum(axis=1), 27 * [1.0],
                               rtol=1e-4)


def test_sinkhorn_jits(rng):
    logits = jnp.array(rng.randn(9, 3), jnp.float32)
    q = jax.jit(sinkhorn_knopp)(logits)
    assert np.isfinite(np.asarray(q)).all()


def test_group_images():
    masks = [np.array([1, 0]), np.array([1, 2]), np.array([1, 7])]
    groups = group_images(masks, [1, 2])
    assert groups[1] == [0, 1]       # mask 2 contains 7 (not allowed)
    assert groups[2] == [1]


def test_abn_groupnorm_variant(rng):
    from ucd_tpu.models.layers import ABN
    x = jnp.array(rng.randn(2, 4, 4, 32), jnp.float32)
    abn = ABN(norm_type="gn")
    variables = abn.init(jax.random.key(0), x, True)
    assert "gn" in variables["params"]
    y = abn.apply(variables, x, True)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_native_ops_parity(rng):
    from ucd_tpu.data import native

    lut = np.arange(256, dtype=np.int32)
    lut[200:] = 0
    lbl8 = rng.randint(0, 256, size=(33, 17)).astype(np.uint8)
    expect = lut[lbl8.astype(np.int64)]
    np.testing.assert_array_equal(native.remap_labels(lbl8, lut), expect)

    img = rng.randint(0, 256, size=(21, 13, 3)).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (img.astype(np.float32) / 255 - mean) / std
    np.testing.assert_allclose(native.normalize_image(img, mean, std), ref,
                               rtol=1e-4, atol=1e-6)

    hist = np.zeros((5, 5), np.int64)
    lbl = rng.randint(0, 7, size=200).astype(np.int32)
    lbl[::11] = 255
    pred = rng.randint(0, 5, size=200).astype(np.int32)
    native.confusion_update(hist, lbl, pred)
    mask = (lbl >= 0) & (lbl < 5)
    ref_hist = np.bincount(5 * lbl[mask].astype(np.int64) + pred[mask],
                           minlength=25).reshape(5, 5)
    np.testing.assert_array_equal(hist, ref_hist)


def test_native_pil_resample_parity(rng):
    """The native geometric kernel is BIT-IDENTICAL to Pillow
    (crop-then-resize, BILINEAR image / NEAREST label) over randomized
    shapes, crops and flips — the product train pipeline routes
    RandomResizedCrop/Resize through it."""
    from PIL import Image

    from ucd_tpu.data import native
    assert native.has_native()
    for _ in range(25):
        h = int(rng.randint(4, 80))
        w = int(rng.randint(4, 80))
        oh = int(rng.randint(1, 100))
        ow = int(rng.randint(1, 100))
        ch = int(rng.randint(2, h + 1))
        cw = int(rng.randint(2, w + 1))
        top = int(rng.randint(0, h - ch + 1))
        left = int(rng.randint(0, w - cw + 1))
        flip = bool(rng.randint(0, 2))
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        lbl = rng.randint(0, 256, size=(h, w)).astype(np.uint8)

        io, lo = native.pil_resize_pair(img, lbl, oh, ow,
                                        crop=(top, left, ch, cw), flip=flip)
        ref_i = np.asarray(Image.fromarray(
            img[top:top + ch, left:left + cw]).resize((ow, oh),
                                                      Image.BILINEAR))
        ref_l = np.asarray(Image.fromarray(
            lbl[top:top + ch, left:left + cw]).resize((ow, oh),
                                                      Image.NEAREST))
        if flip:
            ref_i, ref_l = ref_i[:, ::-1], ref_l[:, ::-1]
        np.testing.assert_array_equal(io, ref_i)
        np.testing.assert_array_equal(lo, ref_l)


def test_transforms_use_native_path(rng):
    """RandomResizedCrop through the product pipeline == the PIL reference
    for the same RNG stream (native kernel live in the product path)."""
    from ucd_tpu.data.transforms import RandomResizedCrop
    img = rng.randint(0, 256, size=(37, 53, 3)).astype(np.uint8)
    lbl = rng.randint(0, 21, size=(37, 53)).astype(np.uint8)
    t = RandomResizedCrop(32, (0.5, 2.0))
    io, lo = t(img, lbl, np.random.default_rng(5))
    assert io.shape == (32, 32, 3) and lo.shape == (32, 32)
    assert set(np.unique(lo)) <= set(np.unique(lbl))


def test_confusion_matrix_figure(tmp_path, rng):
    """Confusion heatmap PNG export (reference stream_metrics.py:124-137)."""
    from ucd_tpu.engine.metrics import confusion_matrix_figure
    h = rng.randint(0, 50, (21, 21))
    p = str(tmp_path / "cm.png")
    confusion_matrix_figure(h, save_path=p)
    import os
    assert os.path.getsize(p) > 1000
