"""Reference CLI flags with behavior attached (VERDICT round-1 item 6):
--val_on_trainset, --ckpt_interval, --visualize, --num_classes,
--fusion-mode/--tta, --dataset city_domain."""

import dataclasses
import os

import numpy as np
import pytest

from ucd_tpu import config
from ucd_tpu.cli import build_parser, config_from_args
from ucd_tpu.data import SyntheticSegmentation
from ucd_tpu.engine.experiment import Experiment, get_datasets

# heavy end-to-end file: excluded from the default fast selection (pytest.ini);
# run via scripts/run_tests.sh or -m 'slow or not slow'
pytestmark = pytest.mark.slow

SIZE = 32


def test_cli_parse_new_flags():
    args = build_parser().parse_args(
        ["test", "--dataset", "city_domain", "--task", "11-5", "--step", "1",
         "--val_on_trainset", "--ckpt_interval", "3", "--visualize",
         "--num_classes", "19", "--fusion-mode", "voting", "--tta",
         "--test_scales", "0.75,1.0,1.25", "--test_flip"])
    cfg = config_from_args(args)
    assert cfg.dataset == "city_domain" and cfg.step == 1
    assert cfg.val_on_trainset and cfg.ckpt_interval == 3
    assert cfg.visualize is False  # reference store_false semantics
    assert cfg.num_classes == 19
    assert cfg.fusion_mode == "voting"
    assert cfg.test_scales == (0.75, 1.0, 1.25) and cfg.test_flip
    assert args.tta


def test_torch_launcher_compat_flags():
    """--local_rank and --opt_level (torch.distributed.launch / apex AMP
    plumbing, reference argparser.py:199 + run.py:196-201) parse for drop-in
    script compatibility: local_rank is ignored, opt_level maps to the dtype
    policy, and an explicit --dtype wins."""
    base = ["train", "--dataset", "voc", "--task", "19-1"]
    cfg = config_from_args(build_parser().parse_args(
        base + ["--local_rank", "0", "--opt_level", "O0"]))
    assert cfg.dtype == "float32"
    cfg = config_from_args(build_parser().parse_args(
        base + ["--opt_level", "O1"]))
    assert cfg.dtype == "bfloat16"
    cfg = config_from_args(build_parser().parse_args(
        base + ["--opt_level", "O0", "--dtype", "bfloat16"]))
    assert cfg.dtype == "bfloat16"
    # defaults unchanged when neither flag is passed
    assert config_from_args(build_parser().parse_args(base)).dtype == \
        "bfloat16"


def test_num_classes_override():
    cfg = config.make_config(dataset="voc", task="19-1",
                             num_classes_override=42)
    assert cfg.num_classes == 42
    assert config.make_config(dataset="voc", task="19-1").num_classes == 21


def test_val_on_trainset_uses_train_split():
    """reference run.py:108-109: the test dataset comes from the train
    image set when --val_on_trainset is passed."""
    bt = SyntheticSegmentation(n=24, size=SIZE, n_classes=20, seed=0)
    bv = SyntheticSegmentation(n=8, size=SIZE, n_classes=20, seed=1)
    cfg = config.make_config(dataset="voc", task="19-1", step=0,
                             crop_size=SIZE, val_on_trainset=True)
    _, _, test_dst, _ = get_datasets(cfg, base_train=bt, base_val=bv)
    # drawn from the 24-image train pool, not the 8-image val pool
    assert len(test_dst) > 8


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cliflags")
    cfg = config.make_config(
        dataset="voc", task="19-1", step=0, method="FT",
        backbone="resnet50", crop_size=SIZE, batch_size=4, dtype="float32",
        epochs=2, pretrained=False, sample_num=2,
        logdir=str(tmp / "logs"), ckpt_dir=str(tmp / "ckpt"),
        ckpt_interval=5)  # > epochs: no mid-run saves
    bt = SyntheticSegmentation(n=16, size=SIZE, n_classes=20, seed=0)
    bv = SyntheticSegmentation(n=8, size=SIZE, n_classes=20, seed=1)
    return Experiment(cfg, base_train=bt, base_val=bv)


def test_ckpt_interval_and_sample_logging(exp, monkeypatch):
    saves = []
    orig = Experiment.save
    monkeypatch.setattr(Experiment, "save",
                        lambda self, e, s: saves.append(e) or orig(self, e, s))
    exp.run()
    # ckpt_interval=5 > epochs=2: only the final end-of-training save fires
    assert saves == [exp.cfg.epochs - 1]
    # validation sample panels collected (visualize=True, sample_num=2)
    assert len(exp.last_val_samples) == 2
    img, tgt, pred = exp.last_val_samples[0]
    assert pred.shape == tgt.shape


def test_tta_predict_path(exp):
    """--tta --fusion-mode reaches engine.predictor.Predictor."""
    for mode in ("mean", "voting", "max"):
        exp.cfg = dataclasses.replace(exp.cfg, fusion_mode=mode,
                                      test_flip=(mode == "mean"))
        score = exp.predict_test()
        assert 0.0 <= score["Mean IoU"] <= 1.0


def test_visualize_false_skips_samples(exp):
    exp.cfg = dataclasses.replace(exp.cfg, visualize=False)
    exp.validate()
    assert exp.last_val_samples == []
    exp.cfg = dataclasses.replace(exp.cfg, visualize=True)


def test_auto_resume(exp, tmp_path_factory):
    """--auto_resume picks up this step's own checkpoint without --ckpt."""
    # exp (module fixture) has already run and saved a checkpoint
    cfg = dataclasses.replace(exp.cfg, auto_resume=True, visualize=True)
    bt = SyntheticSegmentation(n=16, size=SIZE, n_classes=20, seed=0)
    bv = SyntheticSegmentation(n=8, size=SIZE, n_classes=20, seed=1)
    exp2 = Experiment(cfg, base_train=bt, base_val=bv)
    assert exp2.cur_epoch == exp.cfg.epochs  # resumed past the final save


def test_visualize_dumps_reference_layout(exp, tmp_path_factory):
    """visualize() writes the reference test.py per-image file set
    (pre.png/gt.jpg/pre_clo.png/gt_clo.jpg/rgb.jpg, test.py:232-238) plus
    the composed panel and attention map."""
    out = str(tmp_path_factory.mktemp("viz"))
    n = exp.visualize(out, max_images=2)
    assert n == 2
    for k in range(2):
        for suffix in ("_panel.png", "_attention.png", "pre.png", "gt.jpg",
                       "pre_clo.png", "gt_clo.jpg", "rgb.jpg"):
            assert os.path.exists(os.path.join(out, f"{k:04d}{suffix}")), \
                suffix
