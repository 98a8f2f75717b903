"""COMPOSED full-train-step update parity for the PI and RW regularizer
families (completing the family set: UCD/iCaRL/ILT/EWC already have composed
f64 oracles), plus the cross-step export carry each one ships in the
checkpoint.

Reference composition per iteration (/root/reference/train.py:141-147):
main backward -> regularizer.update() with the main-loss grads -> penalty as
a REAL second backward -> nesterov SGD. The accumulators:

  * PI (path integral / SI, utils/regularizer.py:126-206): delta += g_t *
    (theta_{t-1} - theta_t) against the params captured at the PREVIOUS
    update() (no accumulation at the first call); penalty = sum over saved
    score keys of normalize(score_saved) * (theta - theta_anchor)^2, where
    the anchor is the old model grown with the new classifiers' INIT values
    (regularizer.py:139-145). Export (get(), regularizer.py:185-193):
    clamp(delta / ((theta_final - anchor)^2 + 1e-20), min 0) + saved score
    (keys present in the save only).
  * RW (Riemannian walk, utils/regularizer.py:209-313): every
    `reg_iterations` iters score += delta / (0.5 * fisher * (theta -
    theta_prev)^2 + 1e-8) with the fisher BEFORE this iteration's own
    update; online fisher update EVERY iter; penalty weight =
    normalize(saved fisher) + normalize(saved score). Export (get_score,
    regularizer.py:281-287): clamp(score, 0), averaged 0.5*(new+old) ONLY
    for leaves present in the previous step's score — new-classifier leaves
    carry their raw clamp (the round-5 export fix in ops/regularizers.py).

Same float64 rationale and tolerances as the other composed oracles.
"""

import numpy as np
import pytest
import torch

import jax

from ucd_tpu.ops import regularizers as R

from test_train_step_parity import flat_leaves, x64  # noqa: F401 (fixture)
from test_train_step_parity_families import (_run_and_compare,
                                             t_ce_mean_all, t_normalize)

pytestmark = pytest.mark.slow


def _t64(np_arr):
    return torch.from_numpy(np.asarray(np_arr, np.float64).copy())


def _close(got, want, msg, rtol=1e-4, atol_scale=1e-6):
    """Scale-aware comparison for the exported accumulators: delta/score
    leaves are PRODUCTS of two small quantities (g * step-update), so their
    near-zero elements amplify the composed-oracle's ~1e-7 gradient
    agreement into large RELATIVE error; bound those by the leaf's own
    magnitude instead."""
    scale = float(np.max(np.abs(want))) + 1e-30
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol_scale * scale,
                               err_msg=msg)


def _grad_of(v):
    return (v.grad.detach() if v.grad is not None
            else torch.zeros_like(v.detach()))


def _ce_term_fn(cfg, logits, feats3, logits_old, feats3_old, labels):
    """PI/RW presets keep the plain-CE criterion (no unce/bce flags)."""
    return {"loss": t_ce_mean_all(logits, labels)}


def _pi_factory(cfg, params_before, old_vars, saved_reg):
    """Torch-f64 PI oracle closure (reference utils/regularizer.py:126-206)."""
    assert cfg.regularizer == "pi" and cfg.reg_importance == 500.0
    leaves0 = flat_leaves(params_before)
    old_flat = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                                  old_vars["params"]))
    score_saved = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                                     saved_reg["score"]))
    # anchor: old params, grown with the new classifiers' INIT values
    # (regularizer.py:139-145 starting_new)
    anchor = {k: _t64(old_flat.get(k, leaves0[k])) for k in leaves0}
    score_actual = {k: t_normalize(_t64(v)) for k, v in score_saved.items()}
    st = {"delta": {k: torch.zeros(tuple(v.shape), dtype=torch.float64)
                    for k, v in leaves0.items()},
          "model_temp": None, "anchor": anchor, "saved": score_saved}

    def hook(leaves):
        if st["model_temp"] is not None:
            for k, v in leaves.items():
                st["delta"][k] += _grad_of(v) * (st["model_temp"][k]
                                                 - v.detach())
        st["model_temp"] = {k: v.detach().clone() for k, v in leaves.items()}
        pen = sum((score_actual[k] * (leaves[k] - anchor[k]) ** 2).sum()
                  for k in score_actual)
        l_reg = cfg.reg_importance * pen
        l_reg.backward()
        return float(l_reg)

    return hook, st


def _rw_factory(cfg, params_before, old_vars, saved_reg):
    """Torch-f64 RW oracle closure (reference utils/regularizer.py:209-313)."""
    assert cfg.regularizer == "rw" and cfg.reg_importance == 100.0
    leaves0 = flat_leaves(params_before)
    old_flat = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                                  old_vars["params"]))
    f_saved = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                                 saved_reg["fisher"]))
    s_saved = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                                 saved_reg["score"]))
    # penalty weight over saved keys; anchor = old model only (RW never
    # grows model_old_dict: regularizer.py:225-228, penalty guard :293-295)
    spf = {k: t_normalize(_t64(f_saved[k])) + t_normalize(_t64(s_saved[k]))
           for k in f_saved if k in old_flat}
    anchor = {k: _t64(old_flat[k]) for k in spf}
    st = {"fisher": {k: (_t64(f_saved[k]).clone() if k in f_saved
                         else torch.ones(tuple(v.shape),
                                         dtype=torch.float64))
                     for k, v in leaves0.items()},
          "score": {k: torch.zeros(tuple(v.shape), dtype=torch.float64)
                    for k, v in leaves0.items()},
          "model_temp": None, "count": 0, "saved_score": s_saved}

    def hook(leaves):
        # score update (with the PRE-update fisher) every reg_iterations
        # iters, then online fisher update every iter (regularizer.py:261-279)
        if st["count"] % cfg.reg_iterations == 0:
            if st["model_temp"] is not None:
                for k, v in leaves.items():
                    g = _grad_of(v)
                    delta = g * (st["model_temp"][k] - v.detach())
                    den = (0.5 * st["fisher"][k]
                           * (v.detach() - st["model_temp"][k]) ** 2 + 1e-8)
                    st["score"][k] += delta / den
            st["model_temp"] = {k: v.detach().clone()
                                for k, v in leaves.items()}
        st["count"] += 1
        for k, v in leaves.items():
            g = _grad_of(v)
            st["fisher"][k] = (cfg.reg_alpha * g ** 2
                               + (1 - cfg.reg_alpha) * st["fisher"][k])
        pen = sum((spf[k] * (leaves[k] - anchor[k]) ** 2).sum() for k in spf)
        l_reg = cfg.reg_importance * pen
        l_reg.backward()
        return float(l_reg)

    return hook, st


def test_composed_pi_step_parity(rng, x64):
    """PI: CE + path-integral accumulation + normalized-score penalty second
    backward, two iterations from a saved step-0 score; the exported
    score/delta (the carry to the NEXT incremental step) is pinned too."""
    cfg, state, st = _run_and_compare(
        "PI", rng, _ce_term_fn, ("loss", "l_reg", "loss_tot"),
        reg_hook_factory=_pi_factory)

    exported = R.export_state(state.reg_state, state.params)
    got_delta = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                                   exported["delta"]))
    got_score = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                                   exported["score"]))
    final = flat_leaves(jax.tree_util.tree_map(np.asarray, state.params))
    for k, want_d in st["delta"].items():
        _close(got_delta[k], want_d.numpy(),
               f"exported delta diverged at {k}")
        # get(): clamp(delta / ((theta_final - anchor)^2 + 1e-20), 0)
        # + saved score where present (regularizer.py:185-193). The
        # denominator uses the JAX final params (what export_state saw) so
        # the comparison isolates the numerator's bounded oracle error
        # instead of the ill-conditioned g/dtheta ratio at tiny dtheta.
        want_s = np.maximum(
            want_d.numpy() / ((final[k] - st["anchor"][k].numpy()) ** 2
                              + 1e-20), 0.0)
        if k in st["saved"]:
            want_s = want_s + st["saved"][k]
        _close(got_score[k], want_s, f"exported score diverged at {k}",
               rtol=1e-2, atol_scale=1e-5)


def test_composed_rw_step_parity(rng, x64):
    """RW: CE + fisher-normalized path-integral score (reg_iterations=1 so
    the score path fires within two steps) + (norm fisher + norm score)
    penalty second backward; the exported fisher AND the averaged-only-where-
    present exported score are pinned (the round-5 export fix)."""
    cfg, state, st = _run_and_compare(
        "RW", rng, _ce_term_fn, ("loss", "l_reg", "loss_tot"),
        cfg_extra={"reg_iterations": 1}, reg_hook_factory=_rw_factory)
    # the score path must actually have fired
    assert any(float(v.abs().sum()) > 0 for v in st["score"].values())

    exported = R.export_state(state.reg_state, state.params)
    got_f = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                               exported["fisher"]))
    got_s = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                               exported["score"]))
    for k, want_f in st["fisher"].items():
        _close(got_f[k], want_f.numpy(),
               f"exported fisher diverged at {k}")
        want_s = np.maximum(st["score"][k].numpy(), 0.0)
        if k in st["saved_score"]:  # averaged ONLY where previously present
            want_s = 0.5 * (want_s + st["saved_score"][k])
        _close(got_s[k], want_s, f"exported score diverged at {k}",
               rtol=1e-2, atol_scale=1e-4)
