"""SPMD data-parallel correctness on the 8-device virtual CPU mesh:
the jitted train step under a sharded batch must match the single-device
result (gradient all-reduce + sync-BN equivalence; SURVEY.md §7)."""

import numpy as np

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.engine import build_train_state, make_train_step
from ucd_tpu.models import make_model
from ucd_tpu.parallel import batch_sharding, make_mesh, replicated
import pytest

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

SIZE = 32
B = 8


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_step_matches_single_device(rng):
    cfg = config.make_config(dataset="voc", task="19-1", step=0, method="FT",
                             backbone="resnet50", crop_size=SIZE,
                             batch_size=B, dtype="float32")
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0), total_iters=8,
                                 input_shape=(1, SIZE, SIZE, 3))
    batch = {
        "image": rng.randn(B, SIZE, SIZE, 3).astype(np.float32),
        "label": rng.randint(0, cfg.tot_classes,
                             size=(B, SIZE, SIZE)).astype(np.int32),
    }

    # single device
    step_fn = jax.jit(make_train_step(cfg, model, None, total_iters=8))
    s1, m1 = step_fn(state, jax.tree_util.tree_map(jnp.asarray, batch))

    # 8-device mesh
    mesh = make_mesh(8)
    rep, dsh = replicated(mesh), batch_sharding(mesh)
    state8 = jax.device_put(state, rep)
    batch8 = {k: jax.device_put(v, dsh) for k, v in batch.items()}
    step8 = jax.jit(make_train_step(cfg, model, None, total_iters=8),
                    in_shardings=(rep, {"image": dsh, "label": dsh}),
                    out_shardings=(rep, rep))
    s8, m8 = step8(state8, batch8)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    # params identical after one update (gradient allreduce == full-batch grad)
    l1 = np.asarray(s1.params["cls_0"]["kernel"])
    l8 = np.asarray(s8.params["cls_0"]["kernel"])
    np.testing.assert_allclose(l1, l8, rtol=1e-3, atol=1e-6)
    # sync-BN: batch stats match
    b1 = np.asarray(s1.batch_stats["body"]["mod1_bn1"]["bn"]["mean"])
    b8 = np.asarray(s8.batch_stats["body"]["mod1_bn1"]["bn"]["mean"])
    np.testing.assert_allclose(b1, b8, rtol=1e-4, atol=1e-6)


def test_graft_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_2d_mesh_matches_single_device(rng):
    """data x model (4x2) mesh: batch sharded over data, wide conv channels
    sharded over model (TP analog) — numerically equal to single-device.
    The reference is DP-only (SURVEY §2.4); the model axis is extra
    capability for wide-channel regimes (ADE 151-class head)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ucd_tpu.parallel import DATA_AXIS, channel_sharding, make_mesh_2d

    cfg = config.make_config(dataset="voc", task="19-1", step=0, method="FT",
                             backbone="resnet50", crop_size=SIZE,
                             batch_size=B, dtype="float32")
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0), total_iters=8,
                                 input_shape=(1, SIZE, SIZE, 3))
    batch = {
        "image": rng.randn(B, SIZE, SIZE, 3).astype(np.float32),
        "label": rng.randint(0, cfg.tot_classes,
                             size=(B, SIZE, SIZE)).astype(np.int32),
    }
    step_fn = jax.jit(make_train_step(cfg, model, None, total_iters=8))
    s1, m1 = step_fn(state, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh = make_mesh_2d(4, 2)
    state2 = jax.tree_util.tree_map(jax.device_put, state,
                                    channel_sharding(mesh, state,
                                                     min_size=64))
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    batch2 = {k: jax.device_put(v, dsh) for k, v in batch.items()}
    step2 = jax.jit(make_train_step(cfg, model, None, total_iters=8))
    s2, m2 = step2(state2, batch2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s1.params["cls_0"]["kernel"]),
                               np.asarray(s2.params["cls_0"]["kernel"]),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.batch_stats["body"]["mod3_block1"]["bn1"]["bn"]["mean"]),
        np.asarray(s2.batch_stats["body"]["mod3_block1"]["bn1"]["bn"]["mean"]),
        rtol=1e-4, atol=1e-6)
