"""COMPOSED full-train-step update parity for the NON-UCD method families
(VERDICT r4 next #2): iCaRL combined, iCaRL disjoint, ILT, and EWC, each run
through `make_train_step` and through a float64 torch oracle assembled from
the reference's composition:

  * iCaRL combined (LWF-MC, /root/reference/train.py:119-124 +
    utils/loss.py:31-54): BCE-with-ignore criterion at the Trainer's
    reduction='none' -> .mean() call-site semantics, PLUS
    icarl_importance * n_cl_old * BCE(new old-class logits, sigmoid(old));
  * iCaRL disjoint (utils/loss.py:57-86): IcarlLoss as the criterion
    (the reference train loop leaves `loss` undefined on this path,
    train.py:110-116 — a latent NameError; the rebuild computes it the way
    the reference's own validate loop does, train.py:213-216);
  * ILT (train.py:127-133): plain CE + 100*KD + 100*(MSE(body_att) +
    MSE(pre_logits_att));
  * EWC (train.py:141-147 + utils/regularizer.py:59-123): fisher update
    from the MAIN-loss gradients between the two backwards, the penalty as
    a real second backward against min-max-normalized saved fisher, the
    combined gradient through masked SGD — TWO iterations, and the
    exported fisher (the carry to the next incremental step) pinned too.

Same float64 rationale, re-seeding discipline and tolerances as the UCD
composed oracle (test_train_step_parity.py): at f64 the composed gradient
agrees to ~1e-7, so any composition bug (term scaling, reduction
denominator, mask/decay ordering, update-vs-penalty grad interleave) fails
by orders of magnitude.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ucd_tpu import config
from ucd_tpu.engine import build_train_state, make_train_step
from ucd_tpu.models import make_model
from ucd_tpu.models.resnet import STRUCTURES
from ucd_tpu.ops import regularizers as R

from test_model_parity_full import torch_full_forward
from test_train_step_parity import (TOTAL_ITERS, flat_leaves, to_nchw_t,
                                    torch_tree, x64)  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow

SIZE = 64
B = 2


# ---- torch loss oracles (reference utils/loss.py semantics) ----------------

def t_bce_ignore_mean_all(logits, labels, ignore=255):
    """BCEWithLogitsLossWithIgnoreIndex(reduction='none') -> .mean(), the
    Trainer call-site composition (reference train.py:30,36,112): per-pixel
    class-sum BCE, zero at ignored pixels, mean over ALL pixels."""
    n_cl = logits.shape[1]
    lab = torch.where(labels != ignore, labels, torch.full_like(labels, n_cl))
    t = F.one_hot(lab.long(), n_cl + 1).double().permute(0, 3, 1, 2)
    t = t[:, :n_cl]
    loss = F.binary_cross_entropy_with_logits(logits, t, reduction="none")
    loss = loss.sum(dim=1)
    return (loss * (t.sum(dim=1) != 0)).mean()


def t_icarl_combined(logits, logits_old, importance):
    """reference train.py:119-124."""
    n_old = logits_old.shape[1]
    bce = F.binary_cross_entropy_with_logits(
        logits.narrow(1, 0, n_old), torch.sigmoid(logits_old),
        reduction="mean")
    return importance * n_old * bce


def t_icarl_disjoint(logits, labels, logits_old, ignore=255, bkg=False):
    """IcarlLoss(reduction='mean') (reference utils/loss.py:57-86)."""
    n_cl = logits.shape[1]
    lab = torch.where(labels != ignore, labels, torch.full_like(labels, n_cl))
    t = F.one_hot(lab.long(), n_cl + 1).double().permute(0, 3, 1, 2)
    t = t[:, :n_cl].clone()
    old_sig = torch.sigmoid(logits_old)
    n_old = logits_old.shape[1]
    if bkg:
        t[:, 1:n_old] = old_sig[:, 1:]
    else:
        t[:, :n_old] = old_sig
    loss = F.binary_cross_entropy_with_logits(logits, t, reduction="none")
    return loss.sum(dim=1).mean()


def t_ce_mean_all(logits, labels, ignore=255):
    """nn.CrossEntropyLoss(ignore_index=255, reduction='none') -> .mean()
    (reference train.py:40,112): zero at ignored pixels, ALL-pixel mean."""
    ce = F.cross_entropy(logits, labels.long(), reduction="none",
                         ignore_index=ignore)
    return ce.mean()


def t_kd(logits, targets, alpha=1.0):
    """KnowledgeDistillationLoss (reference utils/loss.py:112-136)."""
    inputs = logits.narrow(1, 0, targets.shape[1])
    out = torch.log_softmax(inputs, dim=1)
    lab = torch.softmax(targets * alpha, dim=1)
    return -(out * lab).mean(dim=1).mean()


def t_normalize(mat):
    """reference utils/regularizer.py:37-38."""
    return (mat - mat.min()) / (mat.max() - mat.min() + 1e-8)


# ---- the generalized composed oracle step ----------------------------------

def family_oracle_step(cfg, params_start, batch_stats, old_vars, batch, it,
                       momentum_buf, term_fn, ewc=None, reg_hook=None):
    """ONE reference train step in torch float64 from the given start params.

    `term_fn(cfg, logits, feats3, logits_old, feats3_old, labels)` returns
    the loss-term dict (feats3 = (body_att, pre_logits_att, sem)).

    `ewc`, when given, is {'fisher': dict, 'penalty_w': dict|None} carried
    across calls and mutated: after the MAIN backward the fisher is updated
    from .grad (reference regularizer.update(), train.py:141-143), then the
    penalty runs as a REAL second backward (train.py:144-147) so the
    combined .grad reaches SGD exactly the way the reference composes it.

    `reg_hook(leaves) -> float`, when given (PI/RW), runs the same
    update-then-penalty-backward composition with the family's own
    accumulator semantics, mutating its own closed-over state.

    Returns (terms, post-step leaves, new momentum buffers)."""
    structure, _ = STRUCTURES[cfg.backbone]
    p_new = torch_tree(params_start, requires_grad=True)
    s_new = torch_tree(batch_stats, requires_grad=False)
    p_old = torch_tree(old_vars["params"], requires_grad=False)
    s_old = torch_tree(old_vars["batch_stats"], requires_grad=False)

    from flax import traverse_util
    leaves = {"/".join(k): v for k, v in
              traverse_util.flatten_dict(p_new).items()}
    frozen = {k: k.startswith("cls_0/") for k in leaves}

    x = to_nchw_t(batch["image"])
    labels_t = torch.from_numpy(np.asarray(batch["label"]).copy())

    with torch.no_grad():
        logits_old, xb_old, xpl_old, sem_old = torch_full_forward(
            x, p_old, s_old, structure,
            cfg.classes_per_step[:-1], cfg.pooling, training=False)

    logits, xb, xpl, sem = torch_full_forward(
        x, p_new, s_new, structure, cfg.classes_per_step,
        cfg.pooling, training=True)

    terms = term_fn(cfg, logits, (xb, xpl, sem), logits_old,
                    (xb_old, xpl_old, sem_old), labels_t)
    loss_tot = sum(terms.values())
    loss_tot.backward()

    l_reg = 0.0
    if ewc is not None:
        # fisher from the MAIN-loss grads, between the two backwards
        # (reference utils/regularizer.py:96-99 called at train.py:141-143)
        for k, v in leaves.items():
            g = v.grad if v.grad is not None else torch.zeros_like(v)
            ewc["fisher"][k] = (cfg.reg_alpha * g.detach() ** 2
                                + (1 - cfg.reg_alpha) * ewc["fisher"][k])
        if ewc.get("penalty_w"):
            pen = sum((ewc["penalty_w"][k]
                       * (leaves[k] - ewc["old_anchor"][k]) ** 2).sum()
                      for k in ewc["penalty_w"])
            l_reg = cfg.reg_importance * pen
            l_reg.backward()  # the reference's second backward
            l_reg = float(l_reg)
    elif reg_hook is not None:
        l_reg = reg_hook(leaves)

    lr_t = cfg.lr * (1.0 - it / TOTAL_ITERS) ** cfg.lr_power
    new_buf = {}
    with torch.no_grad():
        for k, v in leaves.items():
            if frozen[k]:
                continue
            g = v.grad if v.grad is not None else torch.zeros_like(v)
            g = g + cfg.weight_decay * v
            buf = (g.clone() if momentum_buf is None
                   else torch.from_numpy(momentum_buf[k]).double()
                   .mul_(cfg.momentum).add_(g))
            new_buf[k] = buf.numpy()
            d = g + cfg.momentum * buf  # nesterov
            v -= lr_t * d

    out_terms = {k: float(t) for k, t in terms.items()}
    out_terms["loss_tot"] = float(loss_tot)
    out_terms["l_reg"] = float(l_reg)
    after = {k: v.detach().numpy() for k, v in leaves.items()}
    return out_terms, after, new_buf


# ---- shared harness ---------------------------------------------------------

def _build(method, rng, **cfg_extra):
    """(cfg, state, old_vars, train_step, batches, params_before,
    batch_stats_np) for a step-1 run of `method` seeded by a step-0 FT
    state."""
    cfg0 = config.make_config(dataset="voc", task="19-1", step=0,
                              method="FT", backbone="resnet50",
                              crop_size=SIZE, batch_size=B, dtype="float64",
                              use_pallas_contrastive=False, fused_loss=False)
    cfg = config.make_config(dataset="voc", task="19-1", step=1,
                             method=method, backbone="resnet50",
                             crop_size=SIZE, batch_size=B, dtype="float64",
                             use_pallas_contrastive=False, fused_loss=False,
                             **cfg_extra)

    model_old = make_model(cfg, classes=cfg.classes_per_step[:-1])
    state0, _ = build_train_state(cfg0, model_old, jax.random.key(0),
                                  total_iters=TOTAL_ITERS,
                                  input_shape=(1, SIZE, SIZE, 3))
    prev = {"params": state0.params, "batch_stats": state0.batch_stats}
    model = make_model(cfg)

    saved_reg = None
    if cfg.regularizer is not None:
        # a synthetic saved accumulator over the OLD param structure stands
        # in for the step-0 export: strictly positive, non-trivially scaled
        # so the min-max normalization (utils/regularizer.py:37-38) matters
        fr = np.random.RandomState(11)

        def synth(scale, base):
            return jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    np.abs(fr.randn(*np.shape(p))) * scale + base,
                    jnp.float64),
                prev["params"])

        if cfg.regularizer == "ewc":
            saved_reg = {"fisher": synth(0.5, 0.05)}
        elif cfg.regularizer == "pi":
            saved_reg = {"score": synth(0.5, 0.05)}
        elif cfg.regularizer == "rw":
            saved_reg = {"fisher": synth(0.5, 0.05),
                         "score": synth(0.3, 0.02)}

    state, old_vars = build_train_state(cfg, model, jax.random.key(1),
                                        total_iters=TOTAL_ITERS,
                                        prev_model_state=prev,
                                        prev_reg_saved=saved_reg,
                                        input_shape=(1, SIZE, SIZE, 3))

    batches = []
    for i in range(2):
        img = rng.randn(B, SIZE, SIZE, 3).astype(np.float32)
        lab = rng.randint(0, cfg.tot_classes,
                          size=(B, SIZE, SIZE)).astype(np.int32)
        lab[0, :8, :8] = 255  # exercised ignore region
        batches.append({"image": jnp.array(img), "label": jnp.array(lab)})

    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    batch_stats_np = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    train_step = jax.jit(make_train_step(cfg, model, model_old,
                                         total_iters=TOTAL_ITERS))
    return (cfg, state, old_vars, train_step, batches, params_before,
            batch_stats_np, saved_reg)


def _run_and_compare(method, rng, term_fn, metric_keys, cfg_extra=None,
                     with_ewc=False, reg_hook_factory=None):
    """`reg_hook_factory(cfg, params_before, old_vars, saved_reg)` returns
    `(hook, reg_obj)`: the per-step oracle hook and its mutable state (for
    post-run export-carry assertions)."""
    (cfg, state, old_vars, train_step, batches, params_before,
     batch_stats_np, saved_reg) = _build(method, rng, **(cfg_extra or {}))

    reg_hook = reg_obj = None
    if reg_hook_factory is not None:
        reg_hook, reg_obj = reg_hook_factory(cfg, params_before, old_vars,
                                             saved_reg)

    jax_terms, jax_params = [], []
    for batch in batches:
        state, metrics = train_step(state, batch, old_vars)
        jax_terms.append({k: float(metrics[k]) for k in metric_keys})
        jax_params.append(jax.tree_util.tree_map(np.asarray, state.params))

    ewc = None
    if with_ewc:
        fisher_saved = flat_leaves(saved_reg["fisher"])
        # grown accumulator: saved fisher for old leaves, ONES for new ones
        # (reference utils/regularizer.py:92-94); penalty weights = per-leaf
        # min-max normalized saved fisher over leaves present in BOTH the
        # saved fisher and the old model (regularizer.py:79-85,106-108)
        fisher0 = {k: (torch.from_numpy(fisher_saved[k]).double()
                       if k in fisher_saved else torch.ones(
                           tuple(np.shape(v)), dtype=torch.float64))
                   for k, v in flat_leaves(params_before).items()}
        pw = {k: t_normalize(torch.from_numpy(v).double())
              for k, v in fisher_saved.items()}
        anchor = {k: torch.from_numpy(np.asarray(v, np.float64))
                  for k, v in flat_leaves(jax.tree_util.tree_map(
                      np.asarray, old_vars["params"])).items()}
        ewc = {"fisher": fisher0, "penalty_w": pw, "old_anchor": anchor}

    buf = None
    starts = [params_before, jax_params[0]]
    for step_i, batch in enumerate(batches):
        t6, after64, buf = family_oracle_step(
            cfg, starts[step_i], batch_stats_np, old_vars, batch, step_i,
            buf, term_fn, ewc=ewc, reg_hook=reg_hook)
        jt = jax_terms[step_i]
        for key in metric_keys:
            np.testing.assert_allclose(
                jt[key], t6.get(key, 0.0), rtol=2e-5, atol=1e-9,
                err_msg=f"{method}: loss term {key} diverged at "
                        f"step {step_i}")

        before = flat_leaves(starts[step_i])
        after = flat_leaves(jax_params[step_i])
        assert set(before) == set(after64) == set(after)

        g_err = g_ref = 0.0
        scale = max(np.linalg.norm(after64[k] - before[k]) for k in before)
        for k in before:
            d_jax = after[k] - before[k]
            if k.startswith("cls_0/"):
                np.testing.assert_array_equal(
                    d_jax, 0.0, err_msg=f"{k} should be frozen")
                continue
            d_64 = after64[k] - before[k]
            err = float(np.linalg.norm(d_jax - d_64))
            ref = float(np.linalg.norm(d_64))
            g_err += err ** 2
            g_ref += ref ** 2
            assert err <= 2e-4 * ref + 3e-6 * scale, (
                f"{method} step {step_i} update mismatch at {k}: "
                f"|e|={err:.3e}, ref {ref:.3e}")
        g_err, g_ref = np.sqrt(g_err), np.sqrt(g_ref)
        assert g_err <= 1e-4 * g_ref, (
            f"{method} step {step_i} global update error {g_err:.3e} vs "
            f"ref {g_ref:.3e}")

    return cfg, state, (ewc if ewc is not None else reg_obj)


# ---- the four family tests --------------------------------------------------

def test_composed_icarl_combined_step_parity(rng, x64):
    """LWF-MC: BCE-ignore criterion + icarl distillation term, composed with
    masked nesterov-SGD over two steps (reference train.py:110-124)."""
    def term_fn(cfg, logits, feats3, logits_old, feats3_old, labels):
        assert cfg.icarl and not cfg.icarl_disjoint
        return {"loss": t_bce_ignore_mean_all(logits, labels),
                "l_icarl": t_icarl_combined(logits, logits_old,
                                            cfg.icarl_importance)}
    cfg, _, _ = _run_and_compare("LWF-MC", rng, term_fn,
                                 ("loss", "l_icarl", "loss_tot"))
    assert cfg.icarl_importance == 10.0


def test_composed_icarl_disjoint_step_parity(rng, x64):
    """iCaRL disjoint: IcarlLoss as the whole criterion (the semantics the
    reference's validate loop defines at train.py:213-216; its train loop
    never assigns `loss` on this path)."""
    def term_fn(cfg, logits, feats3, logits_old, feats3_old, labels):
        return {"loss": t_icarl_disjoint(logits, labels, logits_old,
                                         bkg=cfg.icarl_bkg)}
    _run_and_compare("LWF-MC", rng, term_fn, ("loss", "loss_tot"),
                     cfg_extra={"icarl_disjoint": True})


def test_composed_ilt_step_parity(rng, x64):
    """ILT: plain CE + 100*KD + 100*(MSE over attention-mapped body and
    pre_logits features), composed over two steps (train.py:127-133)."""
    def term_fn(cfg, logits, feats3, logits_old, feats3_old, labels):
        assert cfg.loss_kd == 100.0 and cfg.loss_de == 100.0
        xb, xpl, _ = feats3
        xb_o, xpl_o, _ = feats3_old
        return {"loss": t_ce_mean_all(logits, labels),
                "lkd": cfg.loss_kd * t_kd(logits, logits_old,
                                          alpha=cfg.alpha),
                "lde": cfg.loss_de * (F.mse_loss(xb, xb_o)
                                      + F.mse_loss(xpl, xpl_o))}
    _run_and_compare("ILT", rng, term_fn,
                     ("loss", "lkd", "lde", "loss_tot"))


def test_composed_ewc_step_parity(rng, x64):
    """EWC: main backward -> fisher update from main grads -> penalty second
    backward -> masked SGD, two iterations from a saved step-0 fisher; the
    exported fisher (the carry to the NEXT incremental step) is pinned too
    (reference train.py:141-147 + utils/regularizer.py:59-123)."""
    def term_fn(cfg, logits, feats3, logits_old, feats3_old, labels):
        assert cfg.regularizer == "ewc" and cfg.reg_importance == 500.0
        return {"loss": t_ce_mean_all(logits, labels)}

    cfg, state, ewc = _run_and_compare(
        "EWC", rng, term_fn, ("loss", "l_reg", "loss_tot"), with_ewc=True)

    # cross-step fisher carry: the accumulator the framework would export
    # into the checkpoint equals the torch-accumulated one
    exported = R.export_state(state.reg_state, state.params)
    got = flat_leaves(jax.tree_util.tree_map(np.asarray,
                                             exported["fisher"]))
    for k, want in ewc["fisher"].items():
        np.testing.assert_allclose(
            got[k], want.numpy(), rtol=1e-4, atol=1e-10,
            err_msg=f"exported fisher diverged at {k}")
