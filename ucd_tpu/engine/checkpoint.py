"""Orbax checkpointing with the reference's logical schema.

Rebuild of save_ckpt / the three load paths (reference run.py:32-43, 207-260;
SURVEY.md §5.4): each step checkpoint stores
{epoch, model_state{params,batch_stats}, optimizer_state, best_score,
trainer_state{regularizer accumulators}, schedule position}. Cross-step
restore is a param-tree merge (engine/state.py) instead of strict=False.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# ---------------------------------------------------------------------------
# async write machinery: the payload is snapshotted to host numpy up front
# (cheap: one device fetch), then the orbax serialization + disk write — the
# slow part — runs on a background thread so the train loop resumes
# immediately. One write in flight at a time; a failed write re-raises on the
# next save/load/wait so errors cannot pass silently.
# ---------------------------------------------------------------------------

_pending_lock = threading.Lock()
_pending: Optional[threading.Thread] = None
_pending_error: Optional[BaseException] = None


def wait_pending() -> None:
    """Block until any in-flight async checkpoint write completes; re-raise
    its error if it failed. Called automatically before every save/load and
    by Experiment.close()."""
    global _pending, _pending_error
    with _pending_lock:
        t, _pending = _pending, None
    if t is not None:
        t.join()
    with _pending_lock:
        err, _pending_error = _pending_error, None
    if err is not None:
        raise RuntimeError("async checkpoint write failed") from err


def _write(path: str, payload: dict) -> None:
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def save_checkpoint(path: str, state, epoch: int, best_score: float,
                    reg_saved: Optional[dict] = None,
                    reg_full: Optional[dict] = None,
                    async_write: bool = False) -> None:
    """Write the step checkpoint (reference run.py:32-43). `reg_saved` is the
    cross-step export (next step's importance weights); `reg_full` is the raw
    mid-step accumulator snapshot for same-step --ckpt resume.

    With `async_write`, the device->host snapshot happens eagerly (so the
    saved state is the state at call time) but serialization + disk I/O run
    on a background non-daemon thread — training continues during the write
    and the interpreter waits for durability at exit. NEW vs the reference,
    whose torch.save blocks the epoch loop (run.py:317-322)."""
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
    trainer_state = {}
    if reg_saved is not None:
        trainer_state["regularizer"] = _to_numpy(reg_saved)
    if reg_full is not None:
        trainer_state["regularizer_full"] = _to_numpy(reg_full)
    if trainer_state:
        payload["trainer_state"] = trainer_state
    wait_pending()  # serialize writes; surface any prior failure here
    if not async_write:
        _write(path, payload)
        return

    def run():
        global _pending_error
        try:
            _write(path, payload)
        except BaseException as e:  # surfaced by the next wait_pending()
            with _pending_lock:
                _pending_error = e

    global _pending
    t = threading.Thread(target=run, name="ucd-ckpt-write", daemon=False)
    with _pending_lock:
        _pending = t
    t.start()


_SCHEMA = ("epoch", "best_score", "model_state", "optimizer_state", "step")


def check_schema(ckpt: dict, path: str) -> dict:
    """Actionable failure on schema drift instead of a bare KeyError deep in
    Experiment init."""
    missing = [k for k in _SCHEMA if k not in ckpt]
    if missing or not isinstance(ckpt.get("model_state"), dict) \
            or "params" not in ckpt["model_state"] \
            or "batch_stats" not in ckpt["model_state"]:
        raise ValueError(
            f"checkpoint at {path!r} does not match the ucd_tpu schema "
            f"(missing keys: {missing or ['model_state.params/batch_stats']}; "
            f"found: {sorted(ckpt)}). It may come from an older build — "
            f"re-save it or pass a different --ckpt.")
    return ckpt


def restore_like(template, raw):
    """Rebuild `template`'s pytree structure (tuples, namedtuples such as
    optax states) from an orbax raw restore, which returns nested dicts with
    stringified indices / field names. Shape-checks every leaf."""
    if template is None:
        return None
    if isinstance(template, dict):
        extra = set(raw) - set(template) if isinstance(raw, dict) else set()
        missing = set(template) - set(raw) if isinstance(raw, dict) else set()
        if not isinstance(raw, dict) or extra or missing:
            raise ValueError(
                f"checkpoint subtree mismatch: expected dict keys "
                f"{sorted(template)}, got "
                f"{sorted(raw) if isinstance(raw, dict) else type(raw)}")
        return {k: restore_like(v, raw[k]) for k, v in template.items()}
    if isinstance(template, (tuple, list)):
        fields = getattr(template, "_fields", None)
        if len(template) == 0:
            return template  # e.g. optax EmptyState (orbax restores as None)
        if raw is None:
            raise ValueError(
                f"checkpoint is missing a subtree expected to match "
                f"{type(template).__name__} with {len(template)} children")
        def child(i):
            if isinstance(raw, dict):
                if fields is not None and fields[i] in raw:
                    return raw[fields[i]]
                return raw[str(i)]
            return raw[i]
        vals = [restore_like(v, child(i)) for i, v in enumerate(template)]
        if fields is not None:
            return type(template)(*vals)
        return type(template)(vals)
    # leaf
    arr = np.asarray(raw)
    tshape = tuple(np.shape(template))
    if arr.shape != tshape:
        raise ValueError(
            f"checkpoint leaf shape {arr.shape} != expected {tshape}")
    return jax.numpy.asarray(arr)


def load_checkpoint(path: str) -> Optional[dict]:
    wait_pending()  # a restore must see the completed in-flight write
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


def load_reg_full(ckpt: Optional[dict]) -> Optional[dict]:
    """Mid-step accumulator snapshot from an already-restored checkpoint."""
    if ckpt is None:
        return None
    ts = ckpt.get("trainer_state")
    return None if ts is None else ts.get("regularizer_full")
