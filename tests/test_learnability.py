"""Functional learning test: the end-to-end stack (data pipeline -> jitted
train step -> metrics) must actually LEARN a color-separable segmentation
task, not merely run. Catches wiring bugs that shape-level tests cannot
(dead gradients, label/logit misalignment, LR schedule errors)."""

import numpy as np

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
import pytest

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

SIZE = 64
N_CLS = 4  # bkg + 3 paint classes


def test_ft_learns_color_task():
    cfg = config.make_config(
        dataset="voc", task="offline", step=0, method="FT",
        backbone="resnet50", crop_size=SIZE, batch_size=8, dtype="float32",
        output_stride=8, lr=0.1, pretrained=False,
        num_classes_override=N_CLS)

    base = LearnableSynthetic(n=32, size=SIZE, n_classes=N_CLS, seed=0)
    dst = make_incremental_dataset(
        "voc", "data", train=True, transform=train_transform(SIZE),
        labels=list(range(1, N_CLS)), labels_old=[], idxs_path=None,
        masking=False, overlap=True, base=base)
    loader = DataLoader(dst, 8, seed=0)

    model = make_model(cfg, classes=[N_CLS])
    EPOCHS = 20
    n_iters = EPOCHS * len(loader)
    state, _ = build_train_state(cfg, model, jax.random.key(0),
                                 total_iters=n_iters,
                                 input_shape=(1, SIZE, SIZE, 3))
    step = jax.jit(make_train_step(cfg, model, None, total_iters=n_iters))

    first = last = None
    for epoch in range(EPOCHS):
        for batch in loader.epoch(epoch):
            state, m = step(state, {k: jnp.asarray(v)
                                    for k, v in batch.items()}, None)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < 0.3 * first, f"loss did not learn: {first} -> {last}"

    # eval mIoU on held-out samples of the same distribution
    val_base = LearnableSynthetic(n=8, size=SIZE, n_classes=N_CLS, seed=7)
    val = make_incremental_dataset(
        "voc", "data", train=False, transform=val_transform(SIZE),
        labels=list(range(1, N_CLS)), labels_old=[], idxs_path=None,
        masking=False, overlap=True, base=val_base)
    ev = jax.jit(make_eval_step(cfg, model))
    # eval_step bins over cfg.tot_classes; preds only occupy rows 0..3 and
    # absent classes are masked out of the mean
    hist = empty_confusion(cfg.tot_classes)
    for batch in DataLoader(val, 8, shuffle=False, drop_last=False,
                            seed=0).epoch(0):
        hist, _, _ = ev({"params": state.params,
                         "batch_stats": state.batch_stats},
                        {k: jnp.asarray(v) for k, v in batch.items()},
                        hist, None)
    res = results_from_confusion(np.asarray(hist))
    assert res["Mean IoU"] > 0.6, f"mIoU too low: {res['Mean IoU']}"
