"""Fused upsample+argmax kernel (ops/fused_eval.py) vs the dense
f32 upsample+argmax composition (reference eval semantics:
train.py:215 outputs.max(dim=1) on segmentation_module.py:133 upsampled
logits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucd_tpu.models.segmentation import resize_bilinear
from ucd_tpu.ops.fused_eval import (fused_argmax, fused_argmax_dense,
                                    supported)


def _check(z, H, W, gap_tol=1e-4, rate_tol=1e-3, **kw):
    """Fused vs dense argmax; mismatches allowed only at near-exact ties
    (summation order differs between the tiled and dense interpolation;
    bf16 interpolation widens the tie window to bf16 rounding scale)."""
    got = np.asarray(fused_argmax(z, (H, W), interpret=True, **kw))
    want = np.asarray(fused_argmax_dense(z, (H, W)))
    assert got.shape == want.shape == (z.shape[0], H, W)
    mism = got != want
    if mism.any():
        up = np.asarray(resize_bilinear(z, (H, W), dtype=jnp.float32))
        top2 = np.sort(up, axis=-1)
        gap = top2[..., -1] - top2[..., -2]
        assert gap[mism].max() < gap_tol, (
            f"{mism.sum()} real argmax mismatches, max gap {gap[mism].max()}")
        assert mism.mean() < rate_tol
    return got


@pytest.mark.parametrize("C", [21, 151])
def test_random_logits_parity(C):
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 8, 8, C), jnp.float32)
    _check(z, 128, 128)


def test_non_multiple_shapes():
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(1, 13, 17, 21), jnp.float32)
    _check(z, 100, 132)


def test_nan_pixels_stay_in_class_range():
    """NaN logits must yield an IN-RANGE class, never the padded class
    count — an out-of-range pred lands in the wrong ROW of the confusion
    matrix (idx = label*n_cls + pred) and silently corrupts mIoU for runs
    that hit non-finite logits (cfg.nan_guard anticipates exactly those).
    Exact NaN placement is unspecified in BOTH paths (the dense oracle's
    interp matmul spreads 0*NaN everywhere), so only the range invariant
    is pinned; all-NaN pixels resolve to 0 like jnp.argmax."""
    rng = np.random.RandomState(7)
    C = 5
    z = rng.randn(1, 4, 4, C).astype(np.float32)
    z[0, 1, 2, :] = np.nan  # one fully-NaN source pixel
    got = np.asarray(fused_argmax(jnp.asarray(z), (8, 8), interpret=True))
    assert got.min() >= 0 and got.max() < C, got
    # a fully-NaN input resolves to class 0 everywhere, like jnp.argmax
    z_all = np.full((1, 4, 4, C), np.nan, np.float32)
    got_all = np.asarray(fused_argmax(jnp.asarray(z_all), (8, 8),
                                      interpret=True))
    np.testing.assert_array_equal(got_all, 0)


def test_identity_resolution():
    """H == h (no upsampling, To=1) still matches."""
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(1, 16, 16, 5), jnp.float32)
    got = _check(z, 16, 16)
    want = np.asarray(jnp.argmax(z, axis=-1))
    np.testing.assert_array_equal(got, want)


def test_separated_logits_exact():
    """Well-separated classes: exact equality (no tie ambiguity)."""
    rng = np.random.RandomState(3)
    lab = rng.randint(0, 21, (2, 8, 8))
    z = np.full((2, 8, 8, 21), -10.0, np.float32)
    np.put_along_axis(z, lab[..., None], 10.0, axis=-1)
    z = jnp.asarray(z + rng.randn(2, 8, 8, 21).astype(np.float32) * 0.01)
    got = np.asarray(fused_argmax(z, (64, 64), interpret=True))
    want = np.asarray(fused_argmax_dense(z, (64, 64)))
    np.testing.assert_array_equal(got, want)


def test_bf16_input():
    """bf16 low-res logits (the model's compute dtype) take the bf16
    interpolation fast path: mismatches vs the f32 dense oracle only
    within bf16 rounding of the top-2 gap."""
    rng = np.random.RandomState(4)
    z = jnp.asarray(rng.randn(1, 8, 8, 21), jnp.bfloat16)
    _check(z, 96, 96, gap_tol=0.08, rate_tol=0.02)


def test_bf16_input_f32_override():
    """compute_dtype=f32 on bf16 inputs restores exact-f32 interpolation."""
    rng = np.random.RandomState(5)
    z = jnp.asarray(rng.randn(1, 8, 8, 21), jnp.bfloat16)
    _check(z, 96, 96, compute_dtype=jnp.float32)


def test_supported_gate():
    assert supported((1, 8, 8, 21), (128, 128))
    assert supported((1, 8, 8, 21), (8, 8))
    assert not supported((1, 16, 16, 21), (8, 8))  # downsampling


# ---------------------------------------------------------------------------
# integration: fused eval step == dense eval step; predictor fast path
# ---------------------------------------------------------------------------

def _eval_setup(fused_loss):
    from ucd_tpu import config
    from ucd_tpu.models import make_model

    cfg = config.make_config(dataset="voc", task="15-5", step=1,
                             backbone="resnet50", crop_size=32,
                             method="UCD", dtype="float32",
                             fused_loss=fused_loss)
    model = make_model(cfg)
    model_old = make_model(cfg, classes=cfg.classes_per_step[:-1])
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    vo_shape = model_old.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)),
                              train=False)
    return cfg, model, model_old, v, vo_shape


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_eval_step_fused_matches_dense():
    """make_eval_step with fused_loss=True produces the same confusion
    matrix and loss/kd values (to f32 tolerance) as the dense eval path —
    full donor configuration (UnbiasedCE + UnbiasedKD)."""
    from ucd_tpu.engine.metrics import empty_confusion
    from ucd_tpu.engine.train import make_eval_step

    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    labels = rng.randint(0, 21, (2, 32, 32))
    labels[0, :4] = 255
    batch = {"image": images, "label": jnp.asarray(labels, jnp.int32)}

    outs = {}
    for fused in (False, True):
        cfg, model, model_old, v, vo = _eval_setup(fused)
        step = jax.jit(make_eval_step(cfg, model, model_old))
        hist, losses, preds = step(v, batch, empty_confusion(cfg.tot_classes),
                                   vo)
        outs[fused] = (np.asarray(hist), {k: float(x)
                                          for k, x in losses.items()},
                       np.asarray(preds))

    hist_d, loss_d, preds_d = outs[False]
    hist_f, loss_f, preds_f = outs[True]
    assert (preds_d != preds_f).mean() < 1e-3
    assert abs(hist_d - hist_f).sum() <= 2 * (preds_d != preds_f).sum()
    for k in ("loss", "lkd", "lde"):
        np.testing.assert_allclose(loss_f[k], loss_d[k], rtol=2e-5,
                                   atol=1e-6, err_msg=k)


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_predictor_labels_fast_path():
    """Predictor.predict_labels (fused single-view path) == the dense
    __call__ predictions."""
    from ucd_tpu import config
    from ucd_tpu.engine.predictor import Predictor
    from ucd_tpu.models import make_model

    cfg = config.make_config(dataset="voc", task="19-1", step=0,
                             backbone="resnet50", crop_size=32,
                             dtype="float32")
    model = make_model(cfg)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    pred = Predictor(model, v, fusion_mode="mean", flip=False)
    fast = np.asarray(pred.predict_labels(x))
    dense, _ = pred(x)
    assert (fast != np.asarray(dense)).mean() < 1e-3
    # TTA configuration falls back to the full fusion path
    pred_tta = Predictor(model, v, fusion_mode="mean", flip=True)
    tta = np.asarray(pred_tta.predict_labels(x))
    tta_ref, _ = pred_tta(x)
    np.testing.assert_array_equal(tta, np.asarray(tta_ref))
