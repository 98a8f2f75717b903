"""Accuracy check for the `--contrastive_capacity` knob (VERDICT r2 weak #2):
the bounded-anchor fast path must preserve the method's learnability, not
just its throughput. Trains step 0 once, then runs the SAME step-1 UCD
distillation twice — full pixel set (capacity=0, the exact reference
semantics) vs a bounded anchor budget — with identical data/seeds, and
asserts both retain the old classes and that the bounded run's old-class
retention is within tolerance of the full run's.

Reference semantics: the contrastive batch only ever uses labeled pixels
(utils/utils.py:349-393); capacity compacts to the first N valid anchors
(ops/contrastive.compact_batch), so at capacities >= the typical labeled
count the two paths coincide exactly, and below it the loss becomes a
subsample — this test pins that the subsample still teaches retention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.engine import build_train_state, make_train_step
from ucd_tpu.models import make_model

# tests/ is not a package; pytest puts this directory on sys.path
from test_incremental_learnability import (
    EPOCHS, N_CLS, SIZE, STEP1_EPOCHS, STEP1_KD,
    _eval_class_iou, _loader, _train)

pytestmark = pytest.mark.slow


def test_bounded_capacity_preserves_retention():
    base_kw = dict(dataset="voc", task="offline", backbone="resnet50",
                   crop_size=SIZE, batch_size=8, dtype="float32",
                   output_stride=8, pretrained=False,
                   num_classes_override=N_CLS,
                   use_pallas_contrastive=False)

    # ---- step 0 (shared): classes {1,2} ----
    cfg0 = config.make_config(step=0, method="FT", lr=0.1,
                              contrastive_capacity=0, **base_kw)
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

    # ---- step 1 twice: full pixel set vs bounded anchor budget ----
    # at 64^2 os8 the feature map is 8x8 -> 512 anchor slots per batch of 8;
    # capacity 64 is a genuine 8x subsample, not a no-op
    def run_step1(capacity):
        cfg1 = config.make_config(step=0, method=None, lr=0.02,
                                  loss_kd=STEP1_KD, contrastive=True,
                                  contrastive_capacity=capacity, **base_kw)
        model1 = make_model(cfg1, classes=[3, 1])
        model_old = make_model(cfg1, classes=[3])
        prev = {"params": state0.params, "batch_stats": state0.batch_stats}
        loader1 = _loader([3], [1, 2], seed=5)
        n1 = STEP1_EPOCHS * len(loader1)
        state1, old_vars = build_train_state(
            cfg1, model1, jax.random.key(1), total_iters=n1,
            prev_model_state=prev, input_shape=(1, SIZE, SIZE, 3))
        step1 = jax.jit(make_train_step(cfg1, model1, model_old,
                                        total_iters=n1, step_idx=1))
        state1, m1 = _train(cfg1, model1, state1, loader1, step1,
                            old_vars=old_vars, epochs=STEP1_EPOCHS)
        assert float(m1["l_con"]) != 0.0
        return _eval_class_iou(cfg1, model1, state1)

    iou_full = run_step1(capacity=0)
    iou_cap = run_step1(capacity=64)

    for iou, tag in ((iou_full, "full"), (iou_cap, "capacity=64")):
        # same noise-robust bars as test_incremental_learnability (FT
        # measures 0.000 old-IoU; measured UCD values 0.22/0.38 old, 0.40 new)
        assert (iou[1] + iou[2]) / 2 > 0.2 and min(iou[1], iou[2]) > 0.1, \
            f"{tag}: catastrophic forgetting: {iou}"
        assert iou[3] > 0.25, f"{tag}: new class not learned: {iou}"

    old_full = (iou_full[1] + iou_full[2]) / 2
    old_cap = (iou_cap[1] + iou_cap[2]) / 2
    assert old_cap > old_full - 0.10, (
        f"bounded capacity degraded old-class retention: "
        f"full={old_full:.3f} cap64={old_cap:.3f}")
