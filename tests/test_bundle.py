"""K-step dispatch bundling (cfg.steps_per_call, engine/train.py
make_train_bundle): one lax.scan device call must train EXACTLY like K
sequential per-step dispatches — same parameter trajectory, same per-step
metrics — and the Experiment loop's bundled path (full bundles + per-step
epoch tail) must match the per-step loop end to end.

Equivalence runs at float64 (the composed-parity precedent,
test_train_step_parity.py): in f32, scan-body fusion reassociates vs the
standalone step at ~1e-5, and through train-mode BatchNorms at random init
that grows chaotically across steps (measured: 1e-5 at step 0 -> 4e-3 on
step-2 loss), so no f32 tolerance separates "same math" from a real bug.
At f64 the trajectories agree to ~1e-9 and the assertions are TIGHT.

The reference's torch hot loop (train.py:100-151) has no counterpart: it
necessarily dispatches eagerly every step. Bundling is the XLA-native
equivalent of CUDA-graph capture and exists purely to amortize host
dispatch latency. On v5e it measured PARITY with per-step dispatch (151.5
vs 152.7 img/s at K=8 — async dispatch already hides the gap; BASELINE.md
round 4), so the default is steps_per_call=1; the mechanism is kept for
hosts with real dispatch latency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.engine import build_train_state, make_train_bundle, \
    make_train_step
from ucd_tpu.models import make_model
from ucd_tpu.parallel import bundle_sharding, make_mesh, replicated

SIZE = 32
B = 4
K = 3


@pytest.fixture
def x64():
    """Enable 64-bit jax for this test only (restored afterwards)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def _build(batch=B, steps_per_call=K):
    cfg = config.make_config(dataset="voc", task="19-1", step=0,
                             method="FT", backbone="resnet50",
                             crop_size=SIZE, batch_size=batch,
                             dtype="float64", pretrained=False,
                             steps_per_call=steps_per_call)
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0),
                                 total_iters=16,
                                 input_shape=(1, SIZE, SIZE, 3))
    return cfg, model, state


def _batches(rng, cfg, n, batch=B):
    return [{
        "image": rng.randn(batch, SIZE, SIZE, 3).astype(np.float64),
        "label": rng.randint(0, cfg.tot_classes,
                             size=(batch, SIZE, SIZE)).astype(np.int32),
    } for _ in range(n)]


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_bundle_matches_per_step_sequence(rng, x64):
    cfg, model, state = _build()
    batches = _batches(rng, cfg, K)

    step_fn = jax.jit(make_train_step(cfg, model, None, total_iters=16))
    s_ref = state
    per_step_metrics = []
    for b in batches:
        s_ref, m = step_fn(s_ref, jax.tree_util.tree_map(jnp.asarray, b))
        per_step_metrics.append(jax.device_get(m))

    bundle_fn = jax.jit(make_train_bundle(cfg, model, None, total_iters=16,
                                          k=K))
    stacked = {key: np.stack([b[key] for b in batches]) for key in batches[0]}
    s_bun, m_bun = bundle_fn(state, stacked)
    m_bun = jax.device_get(m_bun)

    # per-step metrics stacked (K,) and equal to the sequential run's
    for i, m_i in enumerate(per_step_metrics):
        for key in ("loss_tot", "loss", "lr"):
            np.testing.assert_allclose(
                float(np.asarray(m_bun[key])[i]), float(m_i[key]),
                rtol=1e-6, atol=1e-9, err_msg=f"step {i} metric {key}")

    # identical parameter trajectory (same program, scan-carried)
    flat_ref = jax.tree_util.tree_leaves(s_ref.params)
    flat_bun = jax.tree_util.tree_leaves(s_bun.params)
    for a, b in zip(flat_ref, flat_bun):
        # params are STORED f32 (param_dtype) even in f64 compute mode, so
        # the comparison floor is f32 ULP (~2e-7 rel), not f64
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-9)
    # optimizer step count advanced K times
    assert int(s_bun.step) == int(s_ref.step)


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_bundle_sharded_matches_unsharded(rng, x64):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg, model, state = _build(batch=8)
    batches = _batches(rng, cfg, K, batch=8)
    stacked = {key: np.stack([b[key] for b in batches]) for key in batches[0]}

    mesh = make_mesh(8)
    rep, bsh = replicated(mesh), bundle_sharding(mesh)
    state8 = jax.device_put(state, rep)
    stacked8 = {k: jax.device_put(v, bsh) for k, v in stacked.items()}
    bundle8 = jax.jit(make_train_bundle(cfg, model, None, total_iters=16,
                                        k=K),
                      in_shardings=(rep, {"image": bsh, "label": bsh}),
                      out_shardings=(rep, rep))
    s8, m8 = bundle8(state8, stacked8)
    losses = np.asarray(m8["loss_tot"])
    assert losses.shape == (K,) and np.all(np.isfinite(losses))

    # sharded bundle == unsharded bundle (grad allreduce + sync-BN under
    # scan; f64 keeps the K-step trajectory comparison well-conditioned)
    bundle1 = jax.jit(make_train_bundle(cfg, model, None, total_iters=16,
                                        k=K))
    s1, m1 = bundle1(state, stacked)
    # metric terms reduce in f32 regardless of compute dtype -> f32 floor
    np.testing.assert_allclose(np.asarray(m1["loss_tot"]), losses,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.params["cls_0"]["kernel"]),
                               np.asarray(s8.params["cls_0"]["kernel"]),
                               rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_bundled_epoch_short_batch_keeps_order(tmp_path, x64):
    """A drop_last=False-style loader can yield a SHORT batch mid-epoch.
    The bundled loop must flush its buffered full batches before training
    the short one, or the optimizer trajectory silently reorders vs the
    per-step path (buffered batch 1 trained AFTER the later short batch 2).
    Sequence [full, short, full, full] with K=2 exercises exactly that:
    flush-of-one + short + one full bundle."""
    from ucd_tpu.data import SyntheticSegmentation
    from ucd_tpu.engine.experiment import Experiment

    rng = np.random.RandomState(5)
    cfg0 = config.make_config(dataset="voc", task="19-1", step=0,
                              method="FT", backbone="resnet50",
                              crop_size=SIZE, batch_size=B, dtype="float64",
                              pretrained=False)
    seq = [_batches(rng, cfg0, 1, batch=b)[0] for b in (B, 2, B, B)]

    class _SeqLoader:
        batch_size = B

        def __len__(self):
            return len(seq)

        def epoch(self, epoch):
            return iter([dict(b) for b in seq])

    def run(spc, tag):
        cfg = config.make_config(
            dataset="voc", task="19-1", step=0, method="FT", epochs=1,
            batch_size=B, crop_size=SIZE, backbone="resnet50",
            dtype="float64", pretrained=False, overlap=True,
            steps_per_call=spc, logdir=str(tmp_path / f"slog{tag}"),
            ckpt_dir=str(tmp_path / f"sck{tag}"), name=f"short{tag}")
        tr = SyntheticSegmentation(n=2 * B, size=SIZE, n_classes=21, seed=0)
        va = SyntheticSegmentation(n=B, size=SIZE, n_classes=21, seed=1)
        exp = Experiment(cfg, base_train=tr, base_val=va)
        exp.train_loader = _SeqLoader()
        return exp, exp.train_epoch(0)

    exp1, m1 = run(1, "a")
    exp2, m2 = run(2, "b")
    for key in ("loss_tot", "loss", "lr"):
        assert abs(m1[key] - m2[key]) <= 1e-4 * max(abs(m1[key]), 1e-3), \
            (key, m1[key], m2[key])
    for a, b in zip(jax.tree_util.tree_leaves(exp1.state.params),
                    jax.tree_util.tree_leaves(exp2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_experiment_bundled_epoch_matches_per_step(tmp_path, x64):
    """Full product-loop equivalence incl. the epoch tail: 3 batches with
    steps_per_call=2 -> one bundle + one per-step tail dispatch, identical
    params/metrics to the steps_per_call=1 run on the same seeded data.

    Kept to 3 steps deliberately: per-step divergence sits at the f32
    param-storage floor (~1e-7 rel), but train-mode BN gradients amplify it
    chaotically with trajectory length (5 steps already reaches 1e-4 of
    small biases — measured) — 3 steps is the longest well-conditioned
    window, and it covers every mechanic (bundle dispatch, tail fallback,
    step accounting, metric summation)."""
    from ucd_tpu.data import SyntheticSegmentation
    from ucd_tpu.engine.experiment import Experiment

    def run(spc, tag):
        cfg = config.make_config(
            dataset="voc", task="19-1", step=0, method="FT", epochs=1,
            batch_size=4, crop_size=SIZE, backbone="resnet50",
            dtype="float64", pretrained=False, overlap=True,
            steps_per_call=spc, logdir=str(tmp_path / f"log{tag}"),
            ckpt_dir=str(tmp_path / f"ck{tag}"), name=f"bundle{tag}")
        tr = SyntheticSegmentation(n=12, size=SIZE, n_classes=21, seed=0)
        va = SyntheticSegmentation(n=4, size=SIZE, n_classes=21, seed=1)
        exp = Experiment(cfg, base_train=tr, base_val=va)
        m = exp.train_epoch(0)
        return exp, m

    exp1, m1 = run(1, "a")
    exp2, m2 = run(2, "b")

    # 12 imgs / batch 4 = 3 steps either way (1 bundle + 1 tail at spc=2)
    for key in ("loss_tot", "loss", "lr"):
        assert abs(m1[key] - m2[key]) <= 1e-4 * max(abs(m1[key]), 1e-3), \
            (key, m1[key], m2[key])
    flat1 = jax.tree_util.tree_leaves(exp1.state.params)
    flat2 = jax.tree_util.tree_leaves(exp2.state.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
