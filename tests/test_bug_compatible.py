"""--bug_compatible preset (VERDICT r3 item 6): one switch that reproduces
every as-shipped reference quirk the defaults deliberately fix
(SURVEY.md §2.6): cls[0] frozen even at step 0
(segmentation_module.py:75-78), contrastive for every method at step > 0
(train.py:110-116), and the shipped unstabilized contrastive formula
(utils/loss.py:444-452)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.cli import build_parser, config_from_args
from ucd_tpu.models.segmentation import trainable_mask


def test_preset_expansion_step1_non_ucd():
    """At step>0 the preset turns the contrastive term on for EVERY method,
    exactly as the reference's `model_old is not None` guard did."""
    cfg = config.make_config(dataset="voc", task="19-1", step=1,
                             method="LWF", bug_compatible=True)
    assert cfg.contrastive            # reference train.py:110-116
    assert cfg.contrastive_bug_compatible
    assert not cfg.use_pallas_contrastive  # dense path required
    assert cfg.freeze_cls0_always
    assert cfg.loss_kd == 100.0       # LWF preset itself unaffected


def test_preset_expansion_step0():
    cfg = config.make_config(dataset="voc", task="19-1", step=0,
                             method="FT", bug_compatible=True)
    assert not cfg.contrastive        # no donor at step 0, even as shipped
    assert cfg.freeze_cls0_always
    assert cfg.contrastive_bug_compatible


def test_preset_off_by_default():
    cfg = config.make_config(dataset="voc", task="19-1", step=1,
                             method="LWF")
    assert not cfg.contrastive and not cfg.freeze_cls0_always
    assert not cfg.contrastive_bug_compatible


def test_cli_flag_roundtrip():
    args = build_parser().parse_args(
        ["train", "--dataset", "voc", "--task", "15-5s", "--step", "1",
         "--method", "UCD", "--bug_compatible"])
    cfg = config_from_args(args)
    assert cfg.bug_compatible and cfg.freeze_cls0_always
    assert cfg.contrastive and cfg.contrastive_bug_compatible
    assert not cfg.use_pallas_contrastive


def test_trainable_mask_freezes_cls0_at_step0():
    params = {"body": {"kernel": np.zeros(3)},
              "cls_0": {"kernel": np.zeros(3), "bias": np.zeros(3)}}
    default = trainable_mask(params, step=0)
    assert default["cls_0"]["kernel"]      # fixed behavior: trainable
    bug = trainable_mask(params, step=0, freeze_cls0_always=True)
    assert not bug["cls_0"]["kernel"] and not bug["cls_0"]["bias"]
    assert bug["body"]["kernel"]


@pytest.mark.slow
def test_step0_train_leaves_cls0_untouched_in_bug_mode():
    """Behavioral: one real jitted step at step 0 under the preset must not
    move cls_0 (the reference's always-frozen quirk), while the default
    config does move it."""
    from ucd_tpu.engine import build_train_state, make_train_step
    from ucd_tpu.models import make_model

    SIZE, B = 32, 2
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(B, SIZE, SIZE, 3), jnp.float32),
             "label": jnp.asarray(rng.randint(0, 20, (B, SIZE, SIZE)),
                                  jnp.int32)}
    for bug, expect_frozen in ((True, True), (False, False)):
        cfg = config.make_config(dataset="voc", task="19-1", step=0,
                                 method="FT", backbone="resnet50",
                                 crop_size=SIZE, batch_size=B,
                                 dtype="float32", bug_compatible=bug,
                                 use_pallas_contrastive=False)
        model = make_model(cfg)
        state, _ = build_train_state(cfg, model, jax.random.key(0),
                                     total_iters=5,
                                     input_shape=(1, SIZE, SIZE, 3))
        before = np.asarray(state.params["cls_0"]["kernel"])
        step_fn = jax.jit(make_train_step(cfg, model, None, total_iters=5))
        state, _ = step_fn(state, batch, None)
        after = np.asarray(state.params["cls_0"]["kernel"])
        moved = bool(np.any(after != before))
        assert moved != expect_frozen, f"bug={bug}"
