"""Parity tests for the fused upsample+CE/KD Pallas kernel (ops/fused_loss.py)
against the dense composition it replaces: f32 bilinear upsample
(models.segmentation.resize_bilinear == torch F.interpolate
align_corners=False, reference segmentation_module.py:133) followed by the
ops.losses criterion/KD terms (reference train.py:112-133).

Interpret mode on CPU; the on-device Mosaic parity gate runs in bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucd_tpu.ops.fused_loss import (fused_ce_kd, fused_ce_kd_dense,
                                    interp_matrix, supported)

MODES = [("ce", "none"), ("ce", "kd"), ("ce", "unkd"),
         ("unce", "none"), ("unce", "kd"), ("unce", "unkd")]


@pytest.mark.parametrize("n_out,n_in", [(64, 4), (64, 8), (48, 6), (512, 32),
                                        (44, 4), (33, 8)])
def test_interp_matrix_matches_jax_resize(n_out, n_in, rng):
    x = jnp.asarray(rng.randn(n_in, 5), jnp.float32)
    got = jnp.asarray(interp_matrix(n_out, n_in)) @ x
    want = jax.image.resize(x, (n_out, 5), method="linear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _case(rng, B, h, w, C, Co, H, W):
    z = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
    t = jnp.asarray(rng.randn(B, h, w, max(Co, 1)), jnp.float32)
    lab = jnp.asarray(rng.randint(0, C + 1, (B, H, W)), jnp.int32)
    lab = jnp.where(lab == C, 255, lab)  # sprinkle ignore pixels
    return z, t, lab


def _assert_parity(z, t, lab, old_cl, ce_mode, kd_mode, alpha=1.0):
    kw = dict(old_cl=old_cl, ce_mode=ce_mode, kd_mode=kd_mode, alpha=alpha)

    def f(zz):
        return fused_ce_kd(zz, lab, t, interpret=True, **kw)

    def d(zz):
        return fused_ce_kd_dense(zz, lab, t, **kw)

    (lc, lk), (lcd, lkd) = f(z), d(z)
    np.testing.assert_allclose(float(lc), float(lcd), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(lk), float(lkd), rtol=1e-5, atol=1e-6)
    # grad through BOTH outputs with distinct weights so a CE/KD gradient
    # cross-wiring bug cannot cancel
    gf = jax.grad(lambda zz: f(zz)[0] + 2.5 * f(zz)[1])(z)
    gd = jax.grad(lambda zz: d(zz)[0] + 2.5 * d(zz)[1])(z)
    scale = float(jnp.max(jnp.abs(gd))) + 1e-12
    np.testing.assert_allclose(np.asarray(gf) / scale, np.asarray(gd) / scale,
                               rtol=0, atol=2e-4)


@pytest.mark.parametrize("ce_mode,kd_mode", MODES)
def test_mode_matrix_voc_shape(ce_mode, kd_mode, rng):
    z, t, lab = _case(rng, B=2, h=4, w=4, C=17, Co=16, H=32, W=32)
    _assert_parity(z, t, lab, old_cl=(16 if ce_mode == "unce" else 0),
                   ce_mode=ce_mode, kd_mode=kd_mode)


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_ade_scale_class_count(rng):
    """C=151 crosses several 8-sublane class tiles; Co=101 exercises the
    unbiased-KD class partition at a non-multiple boundary."""
    z, t, lab = _case(rng, B=1, h=4, w=4, C=151, Co=101, H=32, W=32)
    _assert_parity(z, t, lab, old_cl=101, ce_mode="unce", kd_mode="unkd")


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_non_divisible_height_and_narrow_width(rng):
    """H=44 is not a multiple of the 8-row tile (padded rows must contribute
    nothing) and W=40 < the 128 lane tile (in-bounds masking)."""
    z, t, lab = _case(rng, B=2, h=4, w=4, C=11, Co=6, H=44, W=40)
    _assert_parity(z, t, lab, old_cl=6, ce_mode="unce", kd_mode="unkd")


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_alpha_scaling(rng):
    z, t, lab = _case(rng, B=1, h=4, w=4, C=11, Co=6, H=32, W=32)
    _assert_parity(z, t, lab, old_cl=6, ce_mode="unce", kd_mode="unkd",
                   alpha=2.0)


def test_all_ignore_labels_give_zero_ce(rng):
    z, t, _ = _case(rng, B=1, h=4, w=4, C=11, Co=6, H=32, W=32)
    lab = jnp.full((1, 32, 32), 255, jnp.int32)
    lc, _ = fused_ce_kd(z, lab, t, old_cl=6, ce_mode="unce", kd_mode="none",
                        interpret=True)
    assert float(lc) == 0.0


def test_supported_gates():
    assert supported((2, 4, 4, 11), (2, 32, 32), "unce", "unkd")
    assert not supported((2, 64, 4, 11), (2, 32, 32), "unce", "unkd")  # down
    assert not supported((2, 4, 4, 11), (2, 32, 32), "bce", "none")


def test_train_step_integration_fused_vs_dense(rng):
    """compute_train_losses with cfg.fused_loss on/off agrees on the loss
    terms and the gradient w.r.t. the low-res logits (the fused path must be
    a drop-in for criterion+KD inside the jitted step)."""
    import dataclasses

    from ucd_tpu import config
    from ucd_tpu.engine.train import compute_train_losses
    from ucd_tpu.models.segmentation import resize_bilinear

    cfg = config.make_config(dataset="voc", task="15-5s", step=1,
                             method="UCD", crop_size=32, batch_size=2,
                             dtype="float32")
    cfg = dataclasses.replace(cfg, contrastive=False)  # isolate CE+KD
    C, Co = cfg.tot_classes, cfg.old_classes
    sem = jnp.asarray(rng.randn(2, 4, 4, C), jnp.float32)
    sem_old = jnp.asarray(rng.randn(2, 4, 4, Co), jnp.float32)
    lab = jnp.asarray(rng.randint(0, C, (2, 32, 32)), jnp.int32)
    fz = jnp.zeros((2, 4, 4, 8), jnp.float32)

    def terms(s, fused):
        c = dataclasses.replace(cfg, fused_loss=fused)
        feats = {"sem": s, "pre_logits": fz, "body": fz}
        feats_old = {"sem": sem_old, "pre_logits": fz, "body": fz}
        outputs = resize_bilinear(s, (32, 32), dtype=jnp.float32)
        outputs_old = resize_bilinear(sem_old, (32, 32), dtype=jnp.float32)
        return compute_train_losses(c, outputs, feats, lab, outputs_old,
                                    feats_old)

    tf, td = terms(sem, True), terms(sem, False)
    np.testing.assert_allclose(float(tf["loss"]), float(td["loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(tf["lkd"]), float(td["lkd"]),
                               rtol=1e-5, atol=1e-6)
    gf = jax.grad(lambda s: terms(s, True)["loss_tot"])(sem)
    gd = jax.grad(lambda s: terms(s, False)["loss_tot"])(sem)
    scale = float(jnp.max(jnp.abs(gd))) + 1e-12
    np.testing.assert_allclose(np.asarray(gf) / scale, np.asarray(gd) / scale,
                               rtol=0, atol=2e-4)
