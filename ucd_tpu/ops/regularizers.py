"""EWC / PI (path integral, SI) / RW (Riemannian walk) regularizers as pure
functional transforms on gradient pytrees.

Rebuild of /root/reference/utils/regularizer.py:59-313. The reference mutates
fisher/score dicts in-place on rank 0 and backwards the penalty as a *second*
backward (train.py:141-147); here the state lives in the jitted train state,
the update is a tree_map over the (already all-reduced under SPMD) gradients,
and the penalty gradient is added analytically:

    d/dθ [ w * (θ - θ_old)^2 ] = 2 w (θ - θ_old)

so the whole method costs one elementwise pass, no second backward.

Cross-step flow: at the end of step k the *raw* accumulators (fisher / score /
delta) are exported via `export_state` into the checkpoint (reference
Trainer.state_dict, train.py:377-384); at step k+1 `init_reg_state` turns them
into the (optionally min-max normalized, reference utils/regularizer.py:37-38)
penalty weights against the frozen old parameters.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

EPS = 1e-8
tmap = jax.tree_util.tree_map


def normalize_tree(tree):
    """Per-leaf min-max normalization (reference utils/regularizer.py:37-38)."""
    def norm(x):
        lo, hi = jnp.min(x), jnp.max(x)
        return (x - lo) / (hi - lo + EPS)
    return tmap(norm, tree)


@struct.dataclass
class RegState:
    """Jit-carried regularizer state. Pytrees mirror the param tree."""
    kind: str = struct.field(pytree_node=False, default="none")
    alpha: float = struct.field(pytree_node=False, default=0.9)
    iterations: int = struct.field(pytree_node=False, default=10)
    penalize: bool = struct.field(pytree_node=False, default=False)
    fisher: Any = None        # ewc / rw online fisher
    delta: Any = None         # pi path-integral accumulator
    score: Any = None         # rw score accumulator
    prev_params: Any = None   # params at last update() ("model_temp")
    count: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    penalty_w: Any = None     # precomputed weights for the quadratic penalty
    old_params: Any = None    # θ_old anchor for the penalty
    saved_score: Any = None   # previous-step score (pi/rw averaging)
    saved_mask: Any = None    # per-leaf 0/1 scalars: leaf present in the
                              # saved score (rw export averages ONLY those,
                              # reference utils/regularizer.py:285-286)


def _presence(sub_tree, full_tree):
    """Params-structured tree of Python bools: True where the leaf exists in
    `sub_tree`."""
    if isinstance(full_tree, dict):
        return {k: _presence(sub_tree.get(k) if isinstance(sub_tree, dict)
                             else None, v)
                for k, v in full_tree.items()}
    return sub_tree is not None


def _mask_missing(tree, presence):
    """Zero leaves whose presence flag is False."""
    return tmap(lambda x, p: x if p else jnp.zeros_like(x), tree, presence)


def init_reg_state(kind: Optional[str], params, old_params=None,
                   saved: Optional[dict] = None, alpha: float = 0.9,
                   iterations: int = 10, normalize: bool = True) -> Optional[RegState]:
    """Build the state for a new step.

    `saved` is the dict exported by `export_state` at the previous step (None
    for a fresh run, in which case no penalty applies — reference 'we miss an
    information', utils/regularizer.py:87-89). All carried trees are grown to
    the full (current) param structure: new classifier leaves get a fill value
    in the accumulators (ones for fisher, reference regularizer.py:92-94,
    255-257; zeros elsewhere) and ZERO penalty weight — the reference penalty
    loops skip params absent from the old model/saved importance
    (regularizer.py:106-108, 180-182, 293-295).
    """
    if kind is None or kind == "none":
        return None
    zeros = tmap(jnp.zeros_like, params)
    ones = tmap(jnp.ones_like, params)

    def grow(saved_tree, fill_tree):
        if saved_tree is None:
            return None
        return _merge_with_fill(saved_tree, fill_tree,
                                lambda leaf, fill: fill if leaf is None else
                                jnp.asarray(leaf))

    penalize = saved is not None and old_params is not None
    # anchor for the penalty: old params grown with current params (Δ = 0 for
    # new leaves; combined with zero weight they contribute nothing)
    if old_params is not None:
        anchor = _merge_with_fill(old_params, params,
                                  lambda leaf, fill: fill if leaf is None
                                  else jnp.asarray(leaf))
    else:
        # no old model: anchor at the starting params (reference deepcopies
        # model.state_dict() at init, regularizer.py:147,228)
        anchor = params

    def finalize_pw(saved_tree, do_norm):
        """Grow + normalize + zero weights for leaves missing in saved/old."""
        grown = grow(saved_tree, zeros)
        pw = normalize_tree(grown) if do_norm else grown
        pres_saved = _presence(saved_tree, params)
        pres_old = _presence(old_params, params)
        both = tmap(lambda a, b: a and b, pres_saved, pres_old)
        return _mask_missing(pw, both)

    if kind == "ewc":
        fisher = grow(saved.get("fisher") if saved else None, ones)
        pw = None
        if penalize and saved.get("fisher") is not None:
            pw = finalize_pw(saved["fisher"], normalize)
        return RegState(kind="ewc", alpha=alpha, penalize=pw is not None,
                        fisher=fisher if fisher is not None else ones,
                        penalty_w=pw, old_params=anchor)

    if kind == "pi":
        score_prev = saved.get("score") if saved else None
        pw = None
        if penalize and score_prev is not None:
            pw = finalize_pw(score_prev, normalize)
        return RegState(kind="pi", penalize=pw is not None,
                        delta=zeros, prev_params=params,
                        penalty_w=pw, old_params=anchor,
                        saved_score=grow(score_prev, zeros))

    if kind == "rw":
        fisher = grow(saved.get("fisher") if saved else None, ones)
        score_prev = saved.get("score") if saved else None
        pw = None
        if penalize and saved.get("fisher") is not None \
                and score_prev is not None:
            f = finalize_pw(saved["fisher"], normalize)
            s = finalize_pw(score_prev, normalize)
            pw = tmap(lambda a, b: a + b, f, s)
        saved_mask = None
        if score_prev is not None:
            saved_mask = tmap(lambda p, q: jnp.asarray(1.0 if q else 0.0,
                                                       jnp.float32),
                              params, _presence(score_prev, params))
        return RegState(kind="rw", alpha=alpha, iterations=iterations,
                        penalize=pw is not None,
                        fisher=fisher if fisher is not None else ones,
                        score=zeros, prev_params=params,
                        penalty_w=pw, old_params=anchor,
                        saved_score=grow(score_prev, zeros),
                        saved_mask=saved_mask)

    raise NotImplementedError(kind)


def _merge_with_fill(saved_tree, fill_tree, pick):
    """Overlay `saved_tree` onto the structure of `fill_tree` (new keys get the
    fill leaf)."""
    if isinstance(fill_tree, dict):
        out = {}
        for k, v in fill_tree.items():
            sub = saved_tree.get(k) if isinstance(saved_tree, dict) else None
            out[k] = _merge_with_fill(sub, v, pick)
        return out
    return pick(saved_tree, fill_tree)


def update(state: RegState, grads, params) -> RegState:
    """Per-iteration accumulator update with the main-loss gradients
    (the reference calls regularizer.update() after the first backward,
    train.py:141-143)."""
    if state is None:
        return None
    if state.kind == "ewc":
        # F <- alpha g^2 + (1-alpha) F (reference utils/regularizer.py:96-99)
        fisher = tmap(lambda f, g: state.alpha * g**2 + (1 - state.alpha) * f,
                      state.fisher, grads)
        return state.replace(fisher=fisher)

    if state.kind == "pi":
        # delta += g * (θ_prev - θ); θ_prev <- θ (utils/regularizer.py:164-174)
        is_first = state.count == 0
        delta = tmap(
            lambda d, g, pp, p: d + jnp.where(is_first, 0.0, g * (pp - p)),
            state.delta, grads, state.prev_params, params)
        return state.replace(delta=delta, prev_params=params,
                             count=state.count + 1)

    if state.kind == "rw":
        # every `iterations` iters: score += delta/den (utils/regularizer.py:261-274)
        do_score = (state.count % state.iterations) == 0
        not_first = state.count > 0

        def upd_score(s, g, pp, p, f):
            delta = g * (pp - p)
            den = 0.5 * f * (p - pp) ** 2 + EPS
            inc = jnp.where(do_score & not_first, delta / den, 0.0)
            return s + inc

        score = tmap(upd_score, state.score, grads, state.prev_params, params,
                     state.fisher)
        prev = tmap(lambda pp, p: jnp.where(do_score, p, pp),
                    state.prev_params, params)
        # online fisher every iteration (utils/regularizer.py:276-279)
        fisher = tmap(lambda f, g: state.alpha * g**2 + (1 - state.alpha) * f,
                      state.fisher, grads)
        return state.replace(score=score, fisher=fisher, prev_params=prev,
                             count=state.count + 1)

    raise NotImplementedError(state.kind)


def penalty(state: Optional[RegState], params) -> jnp.ndarray:
    """Quadratic penalty  Σ w (θ - θ_old)^2  (utils/regularizer.py:101-109,
    176-183, 289-297)."""
    if state is None or not state.penalize:
        return jnp.zeros((), jnp.float32)
    terms = tmap(lambda w, p, po: jnp.sum(w * (p - po) ** 2),
                 state.penalty_w, params, state.old_params)
    return jax.tree_util.tree_reduce(lambda a, b: a + b, terms,
                                     jnp.zeros((), jnp.float32))


def penalty_grad(state: Optional[RegState], params, importance: float):
    """Analytic gradient of importance * penalty wrt params."""
    if state is None or not state.penalize:
        return None
    return tmap(lambda w, p, po: 2.0 * importance * w * (p - po),
                state.penalty_w, params, state.old_params)


_FULL_FIELDS = ("fisher", "delta", "score", "prev_params", "saved_score")


def export_full(state: Optional[RegState]) -> Optional[dict]:
    """Complete mid-step snapshot of the accumulators for SAME-step resume
    (reference run.py:249-260 restores trainer_state verbatim). Unlike
    `export_state` (the cross-step handoff, which bakes score/delta into the
    next step's importance), this keeps the raw in-flight fields + count so a
    resumed run is bit-identical to an uninterrupted one."""
    if state is None:
        return None
    out: dict = {"count": state.count}
    for f in _FULL_FIELDS:
        v = getattr(state, f)
        if v is not None:
            out[f] = v
    return out


def restore_full(state: Optional[RegState],
                 saved: Optional[dict]) -> Optional[RegState]:
    """Overlay a mid-step snapshot onto a freshly-initialized RegState.
    penalty_w / old_params are derived deterministically at init from the
    previous step's export and need no restore."""
    if state is None or saved is None:
        return state
    kw: dict = {"count": jnp.asarray(saved["count"], jnp.int32)}
    for f in _FULL_FIELDS:
        if saved.get(f) is not None:
            kw[f] = saved[f]
    return state.replace(**kw)


def export_state(state: Optional[RegState], params) -> Optional[dict]:
    """Raw accumulators for the checkpoint (reference Trainer.state_dict,
    regularizer .state_dict / .get methods). Unlike the reference, the
    regularizer *name* is not stored (orbax trees hold arrays only); the kind
    is re-derived from the config at restore."""
    if state is None:
        return None
    if state.kind == "ewc":
        return {"fisher": state.fisher}
    if state.kind == "pi":
        # score = clamp(delta / (θ-θ_start)^2, min 0), averaged with previous
        # (utils/regularizer.py:185-193; note: reference SUMS with the old
        # score here and halves inside RW only — reproduced: plain sum)
        def score_leaf(d, p, po):
            s = d / ((p - po) ** 2 + 1e-20)
            return jnp.maximum(s, 0.0)
        score = tmap(score_leaf, state.delta, params, state.old_params)
        if state.saved_score is not None:
            score = tmap(lambda a, b: a + b, score, state.saved_score)
        return {"score": score, "delta": state.delta}
    if state.kind == "rw":
        # score clamped >= 0; leaves PRESENT in the previous step's score are
        # averaged 0.5*(new+old), new-classifier leaves carry their raw clamp
        # (utils/regularizer.py:281-287 averages only `n in self.score_old`)
        score = tmap(lambda s: jnp.maximum(s, 0.0), state.score)
        if state.saved_score is not None:
            mask = state.saved_mask
            if mask is None:  # snapshot restored onto a maskless init:
                mask = tmap(lambda s: jnp.ones((), jnp.float32), score)
            score = tmap(lambda a, b, m: jnp.where(m > 0, 0.5 * (a + b), a),
                         score, state.saved_score, mask)
        return {"score": score, "fisher": state.fisher}
    raise NotImplementedError(state.kind)
