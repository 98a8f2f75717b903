"""EWC / PI / RW regularizer math vs the reference formulas
(utils/regularizer.py:59-313), on tiny param trees."""

import numpy as np

import jax
import jax.numpy as jnp

from ucd_tpu.ops import regularizers as R


def tree(*vals):
    return {"a": {"kernel": jnp.array(vals[0], jnp.float32)},
            "b": jnp.array(vals[1], jnp.float32)}


def test_ewc_update_and_penalty():
    params = tree([1.0, 2.0], [3.0])
    old_params = tree([0.5, 1.0], [2.0])
    fisher_saved = tree([4.0, 2.0], [8.0])

    st = R.init_reg_state("ewc", params, old_params=old_params,
                          saved={"fisher": fisher_saved}, alpha=0.9,
                          normalize=False)
    assert st.penalize
    # penalty = sum F_old (θ-θ_old)^2 (utils/regularizer.py:101-109)
    expect = 4 * 0.25 + 2 * 1.0 + 8 * 1.0
    np.testing.assert_allclose(float(R.penalty(st, params)), expect, rtol=1e-6)

    # analytic penalty grad == autodiff grad
    g_auto = jax.grad(lambda p: 500.0 * R.penalty(st, p))(params)
    g_ana = R.penalty_grad(st, params, 500.0)
    for ka in ("a", "b"):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(g_auto[ka])[0]),
            np.asarray(jax.tree_util.tree_leaves(g_ana[ka])[0]), rtol=1e-6)

    # online fisher: F <- a g^2 + (1-a) F (utils/regularizer.py:96-99)
    grads = tree([2.0, 2.0], [1.0])
    st2 = R.update(st, grads, params)
    np.testing.assert_allclose(
        np.asarray(st2.fisher["a"]["kernel"]),
        0.9 * 4.0 + 0.1 * np.array([4.0, 2.0]), rtol=1e-6)


def test_ewc_normalization():
    params = tree([1.0, 2.0], [3.0])
    old_params = tree([0.0, 0.0], [0.0])
    fisher_saved = tree([0.0, 2.0], [4.0])
    st = R.init_reg_state("ewc", params, old_params=old_params,
                          saved={"fisher": fisher_saved}, normalize=True)
    # per-leaf min-max (utils/regularizer.py:37-38)
    np.testing.assert_allclose(np.asarray(st.penalty_w["a"]["kernel"]),
                               [0.0, 1.0], atol=1e-6)


def test_ewc_no_saved_no_penalty():
    params = tree([1.0], [1.0])
    st = R.init_reg_state("ewc", params)
    assert not st.penalize
    assert float(R.penalty(st, params)) == 0.0
    assert R.penalty_grad(st, params, 1.0) is None


def test_pi_delta_accumulation():
    params0 = tree([1.0, 1.0], [1.0])
    st = R.init_reg_state("pi", params0)
    grads = tree([0.5, -0.5], [1.0])
    # first update: only records prev_params (utils/regularizer.py:164-174)
    st = R.update(st, grads, params0)
    np.testing.assert_allclose(np.asarray(st.delta["a"]["kernel"]), [0, 0])
    params1 = tree([0.8, 1.2], [0.5])
    st = R.update(st, grads, params1)
    # delta += g * (θ_prev − θ)
    np.testing.assert_allclose(np.asarray(st.delta["a"]["kernel"]),
                               [0.5 * 0.2, -0.5 * -0.2], rtol=1e-6)
    np.testing.assert_allclose(float(st.delta["b"][0]), 1.0 * 0.5, rtol=1e-6)

    # export: score = clamp(delta/((θ−θ_start)^2+eps), 0)
    st_export = st.replace(old_params=params0)
    saved = R.export_state(st_export, params1)
    d = 0.5 * 0.2
    np.testing.assert_allclose(float(saved["score"]["a"]["kernel"][0]),
                               d / (0.2**2 + 1e-20), rtol=1e-4)
    assert float(saved["score"]["a"]["kernel"][1]) >= 0  # clamped


def test_rw_fisher_every_iter_score_periodic():
    params = tree([1.0, 1.0], [1.0])
    st = R.init_reg_state("rw", params, iterations=2, alpha=0.5)
    grads = tree([1.0, 1.0], [1.0])
    st = R.update(st, grads, params)  # count 0: temp recorded, fisher updated
    f1 = np.asarray(st.fisher["a"]["kernel"]).copy()
    np.testing.assert_allclose(f1, 0.5 * 1 + 0.5 * 1)
    params2 = tree([0.5, 0.5], [0.5])
    st = R.update(st, grads, params2)  # count 1: no score update (1 % 2 != 0)
    np.testing.assert_allclose(np.asarray(st.score["a"]["kernel"]), [0, 0])
    st = R.update(st, grads, params2)  # count 2: score update fires
    assert float(np.abs(np.asarray(st.score["a"]["kernel"])).sum()) > 0


def test_rw_penalty_weights():
    params = tree([1.0, 3.0], [2.0])
    old = tree([0.0, 0.0], [0.0])
    saved = {"fisher": tree([0.0, 1.0], [1.0]),
             "score": tree([1.0, 0.0], [1.0])}
    st = R.init_reg_state("rw", params, old_params=old, saved=saved,
                          normalize=False)
    # penalty_w = fisher + score (utils/regularizer.py:231-243)
    np.testing.assert_allclose(np.asarray(st.penalty_w["a"]["kernel"]),
                               [1.0, 1.0])
    expect = 1 * 1 + 1 * 9 + 2 * 4
    np.testing.assert_allclose(float(R.penalty(st, params)), expect)


def test_grown_params_get_fill():
    """New classifier leaves appear in the fisher with ones
    (utils/regularizer.py:92-94)."""
    params = {"body": jnp.ones((2,)), "cls_1": jnp.ones((3,))}
    old_params = {"body": jnp.zeros((2,)), "cls_1": jnp.zeros((3,))}
    saved = {"fisher": {"body": jnp.full((2,), 5.0)}}
    st = R.init_reg_state("ewc", params, old_params=old_params, saved=saved,
                          normalize=False)
    np.testing.assert_allclose(np.asarray(st.fisher["cls_1"]), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(st.fisher["body"]), [5, 5])
