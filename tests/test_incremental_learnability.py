"""THE core functional claim of the framework, tested end-to-end: a model
trained incrementally (step 0: classes 1,2 -> step 1: class 3) with the UCD
method (unbiased CE/KD + contrastive distillation from the frozen donor)
RETAINS the old classes while learning the new one, on a learnable
color-coded task. Pure shape tests cannot catch forgetting-path bugs
(donor wiring, unbiased-loss index math, classifier growth)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.data import DataLoader, make_incremental_dataset
from ucd_tpu.data.datasets import LearnableSynthetic
from ucd_tpu.data.transforms import train_transform, val_transform
from ucd_tpu.engine import (build_train_state, empty_confusion,
                            make_eval_step, make_train_step,
                            results_from_confusion)
from ucd_tpu.models import make_model

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

SIZE = 64
N_CLS = 4  # bkg + classes 1,2 (step 0) + class 3 (step 1)
# Trajectory lengths and accuracy bars were measured under the EXACT test
# environment (conftest's 8-virtual-device CPU backend — its reduction
# order shifts small-run trajectories by ~0.1 IoU vs plain 1-device CPU,
# so probes must replicate it). Step 0 at 25 epochs lands 0.42/0.43 on
# classes 1/2; step 1 stays at 15 epochs because retention decays with
# incremental-step length (class-1 IoU 0.22 at 15 epochs vs 0.14 at 25).
# Every bar below keeps >=0.10 margin to the measured value; the
# catastrophic-forgetting alternative (FT, no donor) measures 0.000 old-IoU
# (BASELINE.md), so the bars stay decisive.
EPOCHS = 25
STEP1_EPOCHS = 15
STEP1_KD = 20.0  # class-1 retention: 0.14 at kd=10, 0.22 at kd=20


def _train(cfg, model, state, loader, step_fn, old_vars=None, epochs=EPOCHS):
    for epoch in range(epochs):
        for batch in loader.epoch(epoch):
            state, m = step_fn(state, {k: jnp.asarray(v)
                                       for k, v in batch.items()}, old_vars)
    return state, m


def _loader(labels, labels_old, seed, train=True):
    base = LearnableSynthetic(n=24, size=SIZE, n_classes=N_CLS, seed=seed)
    dst = make_incremental_dataset(
        "voc", "data", train=train,
        transform=(train_transform(SIZE) if train else val_transform(SIZE)),
        labels=labels, labels_old=labels_old, idxs_path=None,
        masking=True, overlap=True, base=base)
    return DataLoader(dst, 8, seed=0, shuffle=train, drop_last=train)


def _eval_class_iou(cfg, model, state):
    ev = jax.jit(make_eval_step(cfg, model))
    hist = empty_confusion(cfg.tot_classes)
    base = LearnableSynthetic(n=8, size=SIZE, n_classes=N_CLS, seed=99)
    dst = make_incremental_dataset(
        "voc", "data", train=False, transform=val_transform(SIZE),
        labels=[1, 2, 3], labels_old=None, idxs_path=None,
        masking=True, overlap=True, base=base)
    for batch in DataLoader(dst, 8, shuffle=False, drop_last=False,
                            seed=0).epoch(0):
        hist, _, _ = ev({"params": state.params,
                         "batch_stats": state.batch_stats},
                        {k: jnp.asarray(v) for k, v in batch.items()},
                        hist, None)
    return results_from_confusion(np.asarray(hist))["Class IoU"]


def test_ucd_incremental_retains_old_classes():
    base_kw = dict(dataset="voc", task="offline", backbone="resnet50",
                   crop_size=SIZE, batch_size=8, dtype="float32",
                   output_stride=8, pretrained=False,
                   num_classes_override=N_CLS,
                   use_pallas_contrastive=False, contrastive_capacity=128)

    # ---- step 0: classes {1,2} ----
    cfg0 = config.make_config(step=0, method="FT", lr=0.1, **base_kw)
    model0 = make_model(cfg0, classes=[3])
    loader0 = _loader([1, 2], [], seed=0)
    n0 = EPOCHS * len(loader0)
    state0, _ = build_train_state(cfg0, model0, jax.random.key(0),
                                  total_iters=n0,
                                  input_shape=(1, SIZE, SIZE, 3))
    step0 = jax.jit(make_train_step(cfg0, model0, None, total_iters=n0,
                                    step_idx=0))
    state0, _ = _train(cfg0, model0, state0, loader0, step0)

    iou0 = _eval_class_iou(cfg0, model0, state0)
    assert iou0[1] > 0.3 and iou0[2] > 0.3, f"step-0 didn't learn: {iou0}"

    # ---- step 1: add class {3}; donor = step-0 model ----
    # explicit loss flags instead of the UCD preset: the custom [3]+[1]
    # class split bypasses the task registry, so registry-derived fields
    # (old_classes for unbiased CE, new_classes for imprinting) don't apply;
    # KD + contrastive distillation are the donor-coupled paths under test
    cfg1 = config.make_config(step=0, method=None, lr=0.02,
                              loss_kd=STEP1_KD, contrastive=True, **base_kw)
    model1 = make_model(cfg1, classes=[3, 1])
    model_old = make_model(cfg1, classes=[3])
    prev = {"params": state0.params, "batch_stats": state0.batch_stats}
    loader1 = _loader([3], [1, 2], seed=5)
    n1 = STEP1_EPOCHS * len(loader1)
    state1, old_vars = build_train_state(cfg1, model1, jax.random.key(1),
                                         total_iters=n1,
                                         prev_model_state=prev,
                                         input_shape=(1, SIZE, SIZE, 3))
    step1 = jax.jit(make_train_step(cfg1, model1, model_old,
                                    total_iters=n1, step_idx=1))
    state1, m1 = _train(cfg1, model1, state1, loader1, step1,
                        old_vars=old_vars, epochs=STEP1_EPOCHS)
    assert float(m1["lkd"]) != 0.0 and float(m1["l_con"]) != 0.0

    iou1 = _eval_class_iou(cfg1, model1, state1)
    # old classes retained through distillation (FT measures 0.000 on both),
    # new class learned. Measured: 0.22/0.38 old, 0.40 new.
    old_mean = (iou1[1] + iou1[2]) / 2
    assert old_mean > 0.2 and min(iou1[1], iou1[2]) > 0.1, \
        f"catastrophic forgetting: step0 {iou0} -> step1 {iou1}"
    assert iou1[3] > 0.25, f"new class not learned: {iou1}"
