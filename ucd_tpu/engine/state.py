"""Train-state construction: init, pretrained restore, cross-step growth.

Covers the reference's model/optimizer setup (run.py:161-260):
  * fresh init (fixing the --no_pretrained NameError,
    segmentation_module.py:25-49);
  * cross-step restore of the previous step's params into both the new model
    (extra classifier keeps its init, optionally MiB-imprinted) and the frozen
    donor (run.py:207-233);
  * optimizer + regularizer state wiring.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.segmentation import init_new_classifier, merge_old_params
from ..ops import regularizers as R
from .train import TrainState, make_optimizer


def init_variables(cfg: Config, model, rng, input_shape=None):
    """Initialize model variables ({'params','batch_stats'})."""
    if input_shape is None:
        input_shape = (1, cfg.crop_size, cfg.crop_size, 3)
    x = jnp.zeros(input_shape, jnp.float32)
    return model.init(rng, x, train=False)


def build_train_state(cfg: Config, model, rng, total_iters: int,
                      prev_model_state: Optional[dict] = None,
                      prev_reg_saved: Optional[dict] = None,
                      pretrained_body: Optional[dict] = None,
                      input_shape=None):
    """Build (state, old_vars):

    * step 0: fresh init (+ optional pretrained backbone), no donor;
    * step>0: previous step's {'params','batch_stats'} merged into the fresh
      tree (new classifier leaves keep their init), optional MiB imprinting
      (run.py:218-220), donor = previous step's variables verbatim.
    """
    variables = init_variables(cfg, model, rng, input_shape)
    params, batch_stats = variables["params"], variables["batch_stats"]

    if pretrained_body is not None:
        params = merge_old_params(params, {"body": pretrained_body["params"]})
        batch_stats = merge_old_params(
            batch_stats, {"body": pretrained_body["batch_stats"]})

    old_vars = None
    if prev_model_state is not None:
        params = merge_old_params(params, prev_model_state["params"])
        batch_stats = merge_old_params(batch_stats,
                                       prev_model_state["batch_stats"])
        if cfg.init_balanced:
            params = init_new_classifier(params, cfg.new_classes)
        old_vars = {"params": prev_model_state["params"],
                    "batch_stats": prev_model_state["batch_stats"]}

    tx = make_optimizer(cfg, total_iters)
    opt_state = tx.init(params)

    reg_state = None
    if cfg.regularizer is not None:
        reg_state = R.init_reg_state(
            cfg.regularizer, params,
            old_params=(old_vars["params"] if old_vars is not None else None),
            saved=prev_reg_saved, alpha=cfg.reg_alpha,
            iterations=cfg.reg_iterations, normalize=cfg.reg_normalize)

    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=opt_state, reg_state=reg_state,
                       step=jnp.zeros((), jnp.int32))
    return state, old_vars
