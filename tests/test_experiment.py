"""Experiment orchestration end-to-end on synthetic data: full step-0 run
(train/val/ckpt/test), then step 1 picking up the step-0 checkpoint — the
reference's run.py flow in one process (SURVEY.md §7)."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from ucd_tpu import config
from ucd_tpu.data import SyntheticSegmentation
from ucd_tpu.engine.experiment import Experiment, get_datasets
from ucd_tpu.utils.reporting import aggregate_csv, format_report, write_step_csv

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

SIZE = 32


def make_cfg(tmp_path, step=0, method="FT", **kw):
    base = dict(dataset="voc", task="19-1", step=step, method=method,
                backbone="resnet50", crop_size=SIZE, batch_size=4,
                dtype="float32", lr=0.01, epochs=1, print_interval=2,
                logdir=str(tmp_path / "logs"),
                ckpt_dir=str(tmp_path / "ckpt"),
                pretrained=False,
                use_pallas_contrastive=False, contrastive_capacity=32)
    base.update(kw)
    return config.make_config(**base)


@pytest.fixture
def bases():
    return (SyntheticSegmentation(n=24, size=SIZE, n_classes=20, seed=0),
            SyntheticSegmentation(n=8, size=SIZE, n_classes=20, seed=1))


def test_two_step_experiment(tmp_path, bases):
    base_train, base_val = bases
    cfg0 = make_cfg(tmp_path, step=0)
    exp0 = Experiment(cfg0, base_train=base_train, base_val=base_val)
    exp0.run()
    score0 = exp0.final_test()
    assert 0.0 <= score0["Mean IoU"] <= 1.0
    assert os.path.exists(cfg0.ckpt_path())

    # metrics stream written
    mfile = os.path.join(cfg0.logdir, cfg0.task_name, cfg0.name,
                         "metrics.jsonl")
    assert os.path.exists(mfile) and os.path.getsize(mfile) > 0

    # step 1: UCD picks up the step-0 checkpoint automatically
    base_train1 = SyntheticSegmentation(n=24, size=SIZE, n_classes=21, seed=2)
    cfg1 = make_cfg(tmp_path, step=1, method="UCD")
    exp1 = Experiment(cfg1, base_train=base_train1, base_val=base_val)
    assert exp1.old_vars is not None
    assert "cls_1" in exp1.state.params
    exp1.run()
    score1 = exp1.final_test()
    assert np.isfinite(score1["Mean IoU"])

    # per-step CSV + aggregation (average_csv equivalent)
    csv_path = str(tmp_path / "results.csv")
    write_step_csv(csv_path, 0, score0["Class IoU"])
    write_step_csv(csv_path, 1, score1["Class IoU"])
    agg = aggregate_csv(csv_path, first_classes=19)
    assert "final_miou" in agg and len(agg["per_step_miou"]) == 2
    assert "Final mIoU" in format_report(agg)


def test_missing_step_ckpt_raises(tmp_path, bases):
    _, base_val = bases
    # step-1 data must contain the new class 20, otherwise the empty-loader
    # guard fires before the donor restore is attempted
    base_train = SyntheticSegmentation(n=24, size=SIZE, n_classes=21, seed=2)
    cfg1 = make_cfg(tmp_path, step=1, method="UCD")
    with pytest.raises(FileNotFoundError):
        Experiment(cfg1, base_train=base_train, base_val=base_val)


def test_get_datasets_split(bases):
    base_train, base_val = bases
    # default: val comes from the val image set (reference argparser.py:41
    # no_cross_val inversion — the 80/20 split only under --cross_val)
    cfg = config.make_config(dataset="voc", task="19-1", step=0,
                             crop_size=SIZE, cross_val=False)
    tr, va, te, n_cum = get_datasets(cfg, base_train=base_train,
                                     base_val=base_val)
    assert len(tr) <= 24 and len(va) <= 8
    assert n_cum == 21

    cfg_cv = config.make_config(dataset="voc", task="19-1", step=0,
                                crop_size=SIZE, cross_val=True)
    tr2, va2, te2, _ = get_datasets(cfg_cv, base_train=base_train,
                                    base_val=base_val)
    # 80/20 split of the filtered train set
    assert len(tr2) + len(va2) <= 24 and len(va2) >= 1


def test_cli_config_roundtrip():
    from ucd_tpu.cli import build_parser, config_from_args
    args = build_parser().parse_args(
        ["train", "--dataset", "voc", "--task", "15-5s", "--step", "1",
         "--method", "UCD", "--batch_size", "8", "--overlap"])
    cfg = config_from_args(args)
    assert cfg.step == 1 and cfg.contrastive and cfg.unce and cfg.unkd
    assert cfg.loss_kd == 10.0 and cfg.overlap
    assert cfg.batch_size == 8


def _tree_equal(a, b, what):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb), what
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=what)


def test_same_step_resume_is_complete(tmp_path, bases):
    """--ckpt resume restores model + SGD momentum + schedule position + EWC
    fisher (reference run.py:249-260 restores all of it): a 2-epoch run +
    resume for 1 more is BIT-IDENTICAL to an uninterrupted 3-epoch run."""
    base_train, base_val = bases
    cfgA = make_cfg(tmp_path, step=0, method="EWC", epochs=3, name="A")
    expA = Experiment(cfgA, base_train=base_train, base_val=base_val)
    expA.run()

    # B: same 3-epoch schedule (PolyLR total_iters must match A's), but
    # "crashes" after the epoch-1 checkpoint
    cfgB = make_cfg(tmp_path, step=0, method="EWC", epochs=3, name="B")
    expB = Experiment(cfgB, base_train=base_train, base_val=base_val)
    for ep in range(2):
        expB.train_epoch(ep)
        expB.cur_epoch += 1
    expB.save(1, 0.0)

    cfgC = dataclasses.replace(cfgB, ckpt=cfgB.ckpt_path())
    expC = Experiment(cfgC, base_train=base_train, base_val=base_val)
    assert expC.cur_epoch == 2  # saved epoch 1 -> resume at 2
    # restored momentum trace, schedule count and fisher are bit-identical
    # to the in-process state they were saved from
    _tree_equal(expB.state.opt_state, expC.state.opt_state, "opt_state")
    _tree_equal(expB.state.reg_state.fisher, expC.state.reg_state.fisher,
                "ewc fisher")
    assert int(expC.state.step) == int(expB.state.step)

    expC.run()  # epoch 2 only
    _tree_equal(expA.state.params, expC.state.params, "params after resume")
    _tree_equal(expA.state.opt_state, expC.state.opt_state,
                "opt_state after resume")
    _tree_equal(expA.state.reg_state.fisher, expC.state.reg_state.fisher,
                "fisher after resume")


def test_resume_schema_error(tmp_path, bases):
    """A checkpoint that predates the schema fails with an actionable error,
    not a KeyError (VERDICT weak #6)."""
    import orbax.checkpoint as ocp
    base_train, base_val = bases
    bad = str(tmp_path / "bad_ckpt")
    ocp.PyTreeCheckpointer().save(
        bad, {"model_state": {"params": {"x": np.zeros(1)}}}, force=True)
    cfg = make_cfg(tmp_path, step=0, ckpt=bad)
    with pytest.raises(ValueError, match="schema"):
        Experiment(cfg, base_train=base_train, base_val=base_val)
