"""Predictor / serving entry with TTA fusion modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.engine.predictor import Predictor
from ucd_tpu.models import make_model

SIZE = 32


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = config.make_config(dataset="voc", task="19-1", step=0,
                             backbone="resnet50", crop_size=SIZE,
                             dtype="float32")
    model = make_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                           train=False)
    return model, variables


@pytest.mark.parametrize("mode", ["mean", "voting", "max"])
def test_fusion_modes(rng, model_and_vars, mode):
    model, variables = model_and_vars
    pred = Predictor(model, variables, fusion_mode=mode, flip=True)
    x = jnp.array(rng.randn(2, SIZE, SIZE, 3), jnp.float32)
    preds, fused = pred(x)
    assert preds.shape == (2, SIZE, SIZE)
    assert fused.shape == (2, SIZE, SIZE, 20)
    assert np.isfinite(np.asarray(fused)).all()
    assert int(preds.max()) < 20


def test_single_view_equals_argmax(rng, model_and_vars):
    model, variables = model_and_vars
    pred = Predictor(model, variables, fusion_mode="mean", flip=False)
    x = jnp.array(rng.randn(1, SIZE, SIZE, 3), jnp.float32)
    preds, _ = pred(x)
    logits, _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_multiscale(rng, model_and_vars):
    model, variables = model_and_vars
    pred = Predictor(model, variables, fusion_mode="mean",
                     scales=(1.0, 0.5))
    x = jnp.array(rng.randn(1, SIZE, SIZE, 3), jnp.float32)
    preds, fused = pred(x)
    assert preds.shape == (1, SIZE, SIZE)
