"""End-to-end regularizer carry across a THREE-step incremental chain
(15-5s steps 0->1->2) through the real checkpoint path: fisher/score
accumulated at step 0, exported in the step checkpoint (reference
Trainer.state_dict, train.py:377-384), restored at step 1 where the
quadratic penalty activates, RE-accumulated during step 1, and restored
again at step 2 where the step-1 classifier joins the penalized set.

Each method runs in a subprocess: three Experiments x jitted ResNet
programs per case accumulate enough XLA state to abort the single-core CI
host when run back-to-back in one process."""

import os
import subprocess
import sys

import pytest

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

SCENARIO = r'''
import os, sys
import numpy as np, jax
from ucd_tpu import config
from ucd_tpu.data import SyntheticSegmentation
from ucd_tpu.engine import load_reg_saved
from ucd_tpu.engine.experiment import Experiment

method = sys.argv[1]
tmp = sys.argv[2]
SIZE = 32

def make_cfg(step):
    # 15-5s has 6 steps -> exercises the carry through a >2-step chain
    # (reference: one torch.distributed.launch per step, Trainer.state_dict
    # re-exported each step). overlap: random synthetic labels contain
    # future classes, which disjoint filtering would drop entirely.
    return config.make_config(
        dataset="voc", task="15-5s", step=step, method=method,
        backbone="resnet50", crop_size=SIZE, batch_size=4, dtype="float32",
        lr=0.01, epochs=1, overlap=True,
        logdir=f"{tmp}/logs", ckpt_dir=f"{tmp}/ckpt",
        pretrained=False)

bt = SyntheticSegmentation(n=8, size=SIZE, n_classes=21, seed=0)
bv = SyntheticSegmentation(n=4, size=SIZE, n_classes=21, seed=1)
exp0 = Experiment(make_cfg(0), base_train=bt, base_val=bv)
assert exp0.state.reg_state is not None
assert not exp0.state.reg_state.penalize  # nothing to anchor to yet
exp0.run()

saved = load_reg_saved(exp0.cfg.ckpt_path())
assert saved is not None
key = "fisher" if method in ("EWC", "RW") else "score"
assert key in saved, list(saved)
saved0_leaf = np.asarray(jax.tree_util.tree_leaves(saved[key])[0])

exp1 = Experiment(make_cfg(1), base_train=bt, base_val=bv)
rs = exp1.state.reg_state
assert rs is not None and rs.penalize, "penalty must activate at step 1"
# penalty weights cover the grown tree; new classifier leaves weigh 0
assert "cls_1" in rs.penalty_w
assert float(np.abs(np.asarray(rs.penalty_w["cls_1"]["kernel"])).sum()) == 0

batch = next(exp1.train_loader.epoch(0))
state, m = exp1.train_step(exp1.state, exp1._put_batch(batch), exp1.old_vars)
l_reg = float(m["l_reg"])
assert np.isfinite(l_reg) and l_reg >= 0
exp1.run()  # full epoch + checkpoint: re-exports the importance tensors

# step 2: the chain continues — anchors move to step-1 params, the step-1
# classifier joins the penalized set, and the importance tensors must be the
# RE-ACCUMULATED ones (not a stale step-0 copy).
saved1 = load_reg_saved(exp1.cfg.ckpt_path())
assert saved1 is not None and key in saved1
saved1_leaf = np.asarray(jax.tree_util.tree_leaves(saved1[key])[0])
assert saved1_leaf.shape == saved0_leaf.shape
assert not np.array_equal(saved1_leaf, saved0_leaf), \
    "step-1 export must re-accumulate importance, not carry step-0 verbatim"

exp2 = Experiment(make_cfg(2), base_train=bt, base_val=bv)
rs2 = exp2.state.reg_state
assert rs2 is not None and rs2.penalize
assert "cls_2" in rs2.penalty_w
assert float(np.abs(np.asarray(rs2.penalty_w["cls_2"]["kernel"])).sum()) == 0
# cls_1 trained during step 1 -> its importance is now nonzero: the step-1
# classifier is protected at step 2
assert float(np.abs(np.asarray(rs2.penalty_w["cls_1"]["kernel"])).sum()) > 0
batch2 = next(exp2.train_loader.epoch(0))
_, m2 = exp2.train_step(exp2.state, exp2._put_batch(batch2), exp2.old_vars)
l_reg2 = float(m2["l_reg"])
assert np.isfinite(l_reg2) and l_reg2 >= 0
print(f"SCENARIO-OK {method} l_reg={l_reg} l_reg2={l_reg2}")
'''


@pytest.mark.parametrize("method", ["EWC", "PI", "RW"])
def test_regularizer_carries_across_steps(tmp_path, method):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # single virtual device: a multi-device mesh in the child hits XLA's 40s
    # cross-device rendezvous timeout when the lone physical core is shared
    # with the pytest parent (collectives are covered by test_sharding.py)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", SCENARIO, method, str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert f"SCENARIO-OK {method}" in out.stdout
