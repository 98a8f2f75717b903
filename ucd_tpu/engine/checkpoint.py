"""Orbax checkpointing with the reference's logical schema.

Rebuild of save_ckpt / the three load paths (reference run.py:32-43, 207-260;
SURVEY.md §5.4): each step checkpoint stores
{epoch, model_state{params,batch_stats}, optimizer_state, best_score,
trainer_state{regularizer accumulators}, schedule position}. Cross-step
restore is a param-tree merge (engine/state.py) instead of strict=False.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, epoch: int, best_score: float,
                    reg_saved: Optional[dict] = None) -> None:
    """Write the step checkpoint (reference run.py:32-43)."""
    path = os.path.abspath(path)
    payload = {
        "epoch": np.asarray(epoch),
        "best_score": np.asarray(best_score),
        "model_state": {
            "params": _to_numpy(state.params),
            "batch_stats": _to_numpy(state.batch_stats),
        },
        "optimizer_state": _to_numpy(state.opt_state),
        "step": np.asarray(state.step),
    }
    if reg_saved is not None:
        payload["trainer_state"] = {"regularizer": _to_numpy(reg_saved)}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def load_checkpoint(path: str) -> Optional[dict]:
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)


def load_model_state(path: str) -> Optional[dict]:
    ckpt = load_checkpoint(path)
    return None if ckpt is None else ckpt["model_state"]


def load_reg_saved(path: str) -> Optional[dict]:
    ckpt = load_checkpoint(path)
    if ckpt is None:
        return None
    ts = ckpt.get("trainer_state")
    return None if ts is None else ts.get("regularizer")
