"""uint8 input pipeline: raw RGB ships to the device and the model (or
Predictor) applies the ImageNet normalization there — 4x less host->device
transfer than the reference's host-side ToTensor+Normalize (run.py:51-54),
with identical f32 math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucd_tpu import config
from ucd_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                     train_transform, val_transform)
from ucd_tpu.models import make_model
from ucd_tpu.models.segmentation import normalize_uint8

SIZE = 32


def _model_and_vars():
    cfg = config.make_config(dataset="voc", task="19-1", step=0,
                             backbone="resnet50", crop_size=SIZE,
                             dtype="float32")
    model = make_model(cfg)
    v = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                   train=False)
    return model, v


def test_normalize_uint8_matches_host():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (2, 8, 8, 3), np.uint8)
    host = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    dev = np.asarray(normalize_uint8(jnp.asarray(u8)))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-7)


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_model_uint8_input_equals_normalized_f32():
    """model(uint8) == model(host-normalized f32) — logits and features."""
    model, v = _model_and_vars()
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (1, SIZE, SIZE, 3), np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    lo_u, fe_u = model.apply(v, jnp.asarray(u8), train=False)
    lo_f, fe_f = model.apply(v, jnp.asarray(f32), train=False)
    np.testing.assert_allclose(np.asarray(lo_u), np.asarray(lo_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fe_u["sem"]),
                               np.asarray(fe_f["sem"]), rtol=1e-5, atol=1e-5)


def test_transform_pipelines_dtype():
    rng = np.random.default_rng(2)
    img = np.random.RandomState(3).randint(0, 256, (48, 48, 3), np.uint8)
    lbl = np.random.RandomState(4).randint(0, 21, (48, 48)).astype(np.uint8)
    for build in (train_transform, val_transform):
        i8, l8 = build(SIZE, device_normalize=True)(img, lbl, rng)
        # uint8 labels stay uint8 through the pipeline (round 5: 4x less
        # host->device label traffic; the jitted steps widen on device)
        assert i8.dtype == np.uint8 and l8.dtype == np.uint8
        assert i8.shape == (SIZE, SIZE, 3)
        i32, l32 = build(SIZE, device_normalize=False)(img, lbl, rng)
        assert i32.dtype == np.float32
        # host-normalized pipeline stays within the normalized range
        assert abs(i32).max() < 4.0


@pytest.mark.slow
def test_predictor_uint8_multiscale():
    """Predictor normalizes uint8 BEFORE the multi-scale pyramid; a raw-RGB
    resized view must never bypass normalization."""
    from ucd_tpu.engine.predictor import Predictor
    model, v = _model_and_vars()
    rng = np.random.RandomState(5)
    u8 = rng.randint(0, 256, (1, SIZE, SIZE, 3), np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    for kwargs in (dict(fusion_mode="mean", scales=(1.0, 0.5)),
                   dict(fusion_mode="mean", flip=True)):
        p = Predictor(model, v, **kwargs)
        pred_u, fused_u = p(jnp.asarray(u8))
        pred_f, fused_f = p(jnp.asarray(f32))
        np.testing.assert_allclose(np.asarray(fused_u), np.asarray(fused_f),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(pred_u), np.asarray(pred_f))


@pytest.mark.slow
def test_experiment_uint8_end_to_end(tmp_path):
    """Experiment with the default uint8 pipeline trains and evals; batches
    reaching the device are uint8."""
    from ucd_tpu.data import SyntheticSegmentation
    from ucd_tpu.engine.experiment import Experiment

    cfg = config.make_config(dataset="voc", task="19-1", step=0, method="FT",
                             epochs=1, batch_size=4, crop_size=SIZE,
                             backbone="resnet50", dtype="float32",
                             pretrained=False, overlap=True,
                             use_pallas_contrastive=False,
                             logdir=str(tmp_path / "logs"),
                             ckpt_dir=str(tmp_path / "ckpt"), name="u8")
    assert cfg.device_normalize
    tr = SyntheticSegmentation(n=8, size=SIZE, n_classes=21, seed=0)
    va = SyntheticSegmentation(n=4, size=SIZE, n_classes=21, seed=1)
    exp = Experiment(cfg, base_train=tr, base_val=va)
    b = next(iter(exp.train_loader.epoch(0)))
    assert b["image"].dtype == np.uint8
    exp.run()
    score = exp.final_test()
    assert np.isfinite(score["Mean IoU"])
    exp.close()
