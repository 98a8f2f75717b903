"""End-to-end training smoke tests on synthetic data (tiny model/shapes).

The reference has no tests; these stand in for its implicit contract: a full
FT step-0 run (BASELINE.md config 1), then a step-1 incremental run with the
frozen donor, MiB imprinting and the UCD loss stack, asserting classifier
growth, donor freezing and finite losses (SURVEY.md §7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.engine import (
    build_train_state,
    empty_confusion,
    make_eval_step,
    make_train_step,
    results_from_confusion,
)
from ucd_tpu.models import make_model

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

SIZE = 32
B = 4


def tiny_cfg(**kw):
    base = dict(dataset="voc", task="19-1", backbone="resnet50",
                crop_size=SIZE, batch_size=B, dtype="float32", lr=0.01,
                use_pallas_contrastive=False)
    base.update(kw)
    return config.make_config(**base)


def synth_batch(rng, n_classes, size=SIZE, b=B):
    return {
        "image": jnp.array(rng.randn(b, size, size, 3).astype(np.float32)),
        "label": jnp.array(rng.randint(0, n_classes, size=(b, size, size),
                                       dtype=np.int32)),
    }


def run_steps(cfg, state, train_step, batches, old_vars=None):
    metrics = None
    for batch in batches:
        state, metrics = train_step(state, batch, old_vars)
    return state, metrics


def test_ft_step0_trains(rng):
    cfg = tiny_cfg(step=0, method="FT")
    model = make_model(cfg)
    state, old_vars = build_train_state(
        cfg, model, jax.random.key(0), total_iters=10,
        input_shape=(1, SIZE, SIZE, 3))
    assert old_vars is None
    train_step = jax.jit(make_train_step(cfg, model, None, total_iters=10))

    batch = synth_batch(rng, cfg.tot_classes)
    p0 = state.params["cls_0"]["kernel"].copy()
    state, m = run_steps(cfg, state, train_step, [batch, batch])
    assert np.isfinite(float(m["loss"]))
    assert float(m["lkd"]) == 0 and float(m["l_con"]) == 0
    # step 0: cls_0 must TRAIN (reference froze it always — defect §2.6-4)
    assert float(jnp.abs(state.params["cls_0"]["kernel"] - p0).sum()) > 0
    assert int(state.step) == 2


def test_loss_decreases_overfit(rng):
    cfg = tiny_cfg(step=0, method="FT", lr=0.05)
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0),
                                 total_iters=1000,
                                 input_shape=(1, SIZE, SIZE, 3))
    train_step = jax.jit(make_train_step(cfg, model, None, total_iters=1000))
    batch = synth_batch(rng, 4, size=SIZE, b=2)
    first = None
    for i in range(8):
        state, m = train_step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


@pytest.mark.parametrize("method", ["UCD", "LWF", "ILT", "LWF-MC"])
def test_incremental_step1(rng, method):
    # step 0 model (19 + bkg classes), then step 1 with 1 new class
    cfg0 = tiny_cfg(step=0, method="FT")
    model0 = make_model(cfg0)
    state0, _ = build_train_state(cfg0, model0, jax.random.key(0),
                                  total_iters=4,
                                  input_shape=(1, SIZE, SIZE, 3))
    ts0 = jax.jit(make_train_step(cfg0, model0, None, total_iters=4))
    state0, _ = run_steps(cfg0, state0, ts0, [synth_batch(rng, cfg0.tot_classes)])

    cfg1 = tiny_cfg(step=1, method=method, contrastive_capacity=64)
    model1 = make_model(cfg1)
    prev = {"params": jax.device_get(state0.params),
            "batch_stats": jax.device_get(state0.batch_stats)}
    state1, old_vars = build_train_state(
        cfg1, model1, jax.random.key(1), total_iters=4,
        prev_model_state=prev, input_shape=(1, SIZE, SIZE, 3))
    assert old_vars is not None
    # restored body matches step-0 body
    l0 = state0.params["body"]["mod1_conv1"]["kernel"]
    l1 = state1.params["body"]["mod1_conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))
    # classifier grew
    assert "cls_1" in state1.params
    assert state1.params["cls_1"]["kernel"].shape[-1] == 1

    if method == "UCD":
        # MiB imprinting: new cls kernel == bkg column of cls_0
        np.testing.assert_allclose(
            np.asarray(state1.params["cls_1"]["kernel"][..., 0]),
            np.asarray(state1.params["cls_0"]["kernel"][..., 0]), rtol=1e-6)
        expect_bias = float(prev["params"]["cls_0"]["bias"][0]) - np.log(2.0)
        np.testing.assert_allclose(float(state1.params["cls_1"]["bias"][0]),
                                   expect_bias, rtol=1e-5)
        np.testing.assert_allclose(float(state1.params["cls_0"]["bias"][0]),
                                   expect_bias, rtol=1e-5)

    ts1 = jax.jit(make_train_step(cfg1, model1, make_model(cfg0),
                                  total_iters=4))
    batch = synth_batch(rng, cfg1.tot_classes)
    cls0_before = state1.params["cls_0"]["kernel"].copy()
    state1, m = run_steps(cfg1, state1, ts1, [batch, batch],
                          old_vars=old_vars)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    if method == "UCD":
        assert float(m["lkd"]) != 0 and float(m["l_con"]) != 0
    if method == "ILT":
        assert float(m["lde"]) != 0 and float(m["lkd"]) != 0
    if method == "LWF-MC":
        assert float(m["l_icarl"]) != 0
    # cls_0 frozen at step > 0 (reference segmentation_module.py:75-78)
    np.testing.assert_allclose(np.asarray(state1.params["cls_0"]["kernel"]),
                               np.asarray(cls0_before))


def test_eval_step_and_metrics(rng):
    cfg = tiny_cfg(step=0, method="FT")
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0), total_iters=4,
                                 input_shape=(1, SIZE, SIZE, 3))
    eval_step = jax.jit(make_eval_step(cfg, model))
    hist = empty_confusion(cfg.tot_classes)
    batch = synth_batch(rng, cfg.tot_classes)
    hist, losses, preds = eval_step(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, hist)
    assert float(hist.sum()) == B * SIZE * SIZE
    res = results_from_confusion(np.asarray(hist))
    assert 0.0 <= res["Mean IoU"] <= 1.0
    assert preds.shape == (B, SIZE, SIZE)


def test_confusion_matrix_ignores_255(rng):
    from ucd_tpu.engine import confusion_matrix_update
    labels = jnp.array([[0, 1, 255], [2, 255, 1]], jnp.int32)
    preds = jnp.array([[0, 1, 2], [2, 0, 0]], jnp.int32)
    hist = confusion_matrix_update(empty_confusion(3), labels, preds, 3)
    h = np.asarray(hist)
    assert h.sum() == 4  # two 255 pixels dropped
    assert h[0, 0] == 1 and h[1, 1] == 1 and h[2, 2] == 1 and h[1, 0] == 1


def test_output_stride_8(rng):
    """os=8 path: dilation [1,1,2,4], ASPP rates 12/24/32; 4x4 smaller
    feature grid than os16 at the same input."""
    cfg = tiny_cfg(step=0, method="FT", output_stride=8)
    model = make_model(cfg)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    logits, feats = model.apply(variables, x, train=False)
    assert logits.shape == (1, SIZE, SIZE, cfg.tot_classes)
    assert feats["body"].shape[1] == SIZE // 8
    assert np.isfinite(np.asarray(logits)).all()


def test_nan_guard_skips_poisoned_step(rng):
    """cfg.nan_guard: a batch producing non-finite gradients must leave the
    params untouched; the next clean batch updates normally."""
    cfg = tiny_cfg(step=0, method="FT", nan_guard=True)
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0),
                                 total_iters=10,
                                 input_shape=(1, SIZE, SIZE, 3))
    step = jax.jit(make_train_step(cfg, model, None, total_iters=10))

    bad = synth_batch(rng, cfg.tot_classes)
    bad["image"] = bad["image"].at[0, 0, 0, 0].set(jnp.nan)
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state2, m = step(state, bad, None)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]),
        np.asarray(p0))

    good = synth_batch(rng, cfg.tot_classes)
    state3, m = step(state2, good, None)
    assert np.isfinite(float(m["loss"]))
    assert not np.array_equal(
        np.asarray(jax.tree_util.tree_leaves(state3.params)[0]),
        np.asarray(p0))
