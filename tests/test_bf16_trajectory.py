"""bf16 dtype-policy regression guard (VERDICT r4 next #9).

The composed f64 oracle (test_train_step_parity.py) pins the MATH of the
train step but runs the model at a test-only float64 dtype — a regression in
the production mixed-precision policy (bf16 compute + f32 masters, SURVEY
§2.4 apex-amp analog) is invisible to it. This test runs N steps of the
production bf16 config and the same steps at float64 on the SAME synthetic
task and asserts the trajectories stay inside an empirically-set band:

  * per-step loss_tot relative divergence, and
  * per-step global update-norm ratio.

What the band catches: a loss term accidentally computed/reduced in bf16
(the loss chain is specified f32 — ops/losses.py casts logits up), bf16
master weights (small updates quantize to zero and the update norm
collapses), momentum or weight-decay accumulating in bf16, a missing f32
cast in the contrastive prep.

Band calibration (measured on this exact task/seed, 2026-08-20, CPU):
correct-policy bf16-vs-f64 divergence was per-step loss relerr
[0.16%, 0.19%, 1.9%, 2.1%, 0.33%, 1.2%] and update-norm ratio
[0.97, 1.21, 1.26, 1.60, 1.22, 1.65] — the trajectory is chaotic at
random init, so divergence compounds after the first step. The FIRST step
has no compounding and gets the tight band (loss 2%, ratio 0.85-1.18 =
~12x/6x the measured point); later steps get a loose tripwire
(loss 10%, ratio 0.4-2.5 = ~1.5x the measured excursion) that still
catches order-of-magnitude policy signatures."""

import numpy as np
import pytest

import jax

from ucd_tpu import config
from ucd_tpu.engine import build_train_state, make_train_step
from ucd_tpu.models import make_model

pytestmark = pytest.mark.slow

SIZE = 48
B = 2
N_STEPS = 6


@pytest.fixture
def x64():
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def _trajectory(dtype, batches, rng_seed=0):
    """N UCD steps at the given model dtype; returns (losses, update_norms)."""
    import jax.numpy as jnp

    cfg0 = config.make_config(dataset="voc", task="19-1", step=0,
                              method="FT", backbone="resnet50",
                              crop_size=SIZE, batch_size=B, dtype=dtype,
                              use_pallas_contrastive=False, fused_loss=False)
    cfg = config.make_config(dataset="voc", task="19-1", step=1,
                             method="UCD", backbone="resnet50",
                             crop_size=SIZE, batch_size=B, dtype=dtype,
                             contrastive_capacity=128,
                             use_pallas_contrastive=False, fused_loss=False)
    model_old = make_model(cfg, classes=cfg.classes_per_step[:-1])
    state0, _ = build_train_state(cfg0, model_old, jax.random.key(0),
                                  total_iters=N_STEPS,
                                  input_shape=(1, SIZE, SIZE, 3))
    prev = {"params": state0.params, "batch_stats": state0.batch_stats}
    model = make_model(cfg)
    state, old_vars = build_train_state(cfg, model, jax.random.key(1),
                                        total_iters=N_STEPS,
                                        prev_model_state=prev,
                                        input_shape=(1, SIZE, SIZE, 3))
    step = jax.jit(make_train_step(cfg, model, model_old,
                                   total_iters=N_STEPS))
    losses, unorms = [], []
    params_prev = jax.tree_util.tree_map(np.asarray, state.params)
    for batch in batches:
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                        old_vars)
        losses.append(float(m["loss_tot"]))
        params_now = jax.tree_util.tree_map(np.asarray, state.params)
        un = np.sqrt(sum(
            float(np.sum((np.asarray(a, np.float64)
                          - np.asarray(b, np.float64)) ** 2))
            for a, b in zip(jax.tree_util.tree_leaves(params_now),
                            jax.tree_util.tree_leaves(params_prev))))
        unorms.append(un)
        params_prev = params_now
    return np.asarray(losses), np.asarray(unorms)


def test_bf16_trajectory_stays_in_band(rng, x64):
    batches = []
    for _ in range(N_STEPS):
        img = rng.randn(B, SIZE, SIZE, 3).astype(np.float32)
        lab = rng.randint(0, 21, size=(B, SIZE, SIZE)).astype(np.int32)
        batches.append({"image": img, "label": lab})

    loss_bf, un_bf = _trajectory("bfloat16", batches)
    loss_64, un_64 = _trajectory("float64", batches)

    assert np.all(np.isfinite(loss_bf)) and np.all(np.isfinite(un_bf))
    rel_loss = np.abs(loss_bf - loss_64) / np.abs(loss_64)
    ratio = un_bf / un_64
    # first step: no chaotic compounding — tight band (see module docstring)
    assert rel_loss[0] <= 0.02, f"step-1 bf16 loss relerr {rel_loss[0]:.4f}"
    assert 0.85 < ratio[0] < 1.18, f"step-1 update-norm ratio {ratio[0]:.4f}"
    # full trajectory: loose tripwire over the measured chaotic excursion
    assert rel_loss.max() <= 0.10, (
        f"bf16 loss trajectory diverged: per-step relerr {rel_loss}")
    assert np.all((ratio > 0.4) & (ratio < 2.5)), (
        f"bf16 update-norm trajectory diverged: ratios {ratio}")
