"""The training engine: one pure jitted step containing both model forwards,
every method's loss terms, the regularizer update and the SGD step.

Rebuild of the reference Trainer hot loop (/root/reference/train.py:76-183)
as functional JAX. Structural differences by design:

  * the frozen donor ("model_old") is just a second variable tree evaluated
    inside the same jit — no DDP wrapper, no no_grad bracket (nothing
    differentiates w.r.t. it);
  * the regularizer's second backward (train.py:141-147) collapses into an
    analytic penalty gradient added to the main grads;
  * gradient averaging / sync-BN statistics / metric reduction all happen via
    the SPMD partitioner when the batch axis is sharded over the mesh — the
    step contains no explicit collectives;
  * the UCD contrastive term is gated on cfg.contrastive (the reference ran it
    for every method at step > 0 — SURVEY.md §2.6-7), and the
    icarl-disjoint training path computes the icarl loss (left undefined in
    reference train.py:110-116, a latent NameError).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models.segmentation import trainable_mask
from ..ops import fused_eval as FE
from ..ops import fused_loss as FL
from ..ops import losses as L
from ..ops import regularizers as R
from ..ops.contrastive import ucd_contrastive_loss
from .metrics import confusion_matrix_update

tmap = jax.tree_util.tree_map


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    reg_state: Optional[R.RegState]
    step: jnp.ndarray


def make_lr_schedule(cfg: Config, total_iters: int):
    """PolyLR stepped per iteration (reference utils/scheduler.py:1-10,
    run.py:188-191) or StepLR."""
    if cfg.lr_policy == "poly":
        def sched(count):
            frac = 1.0 - count / max(total_iters, 1)
            return cfg.lr * jnp.maximum(frac, 0.0) ** cfg.lr_power
        return sched
    def sched(count):
        return cfg.lr * cfg.lr_decay_factor ** (count // cfg.lr_decay_step)
    return sched


def make_optimizer(cfg: Config, total_iters: int):
    """SGD(momentum=0.9, nesterov) with torch-style coupled weight decay
    (decay added to grads before momentum; reference run.py:175-186).
    With cfg.nan_guard, the whole update is wrapped in
    optax.apply_if_finite: a non-finite gradient skips the step instead of
    poisoning the params — production hardening the reference lacks."""
    sched = make_lr_schedule(cfg, total_iters)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=sched, momentum=cfg.momentum, nesterov=True),
    )
    if getattr(cfg, "nan_guard", False):
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def _apply_mask(grads, mask):
    return tmap(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


def _fused_gate(cfg: Config, feats, labels, kd_on: bool):
    """Shared fused-kernel gating for train and eval: (ce_mode, kd_mode,
    use_fused). The fused upsample+CE+KD path computes the criterion and
    the KD term straight from the LOW-RES logits (feats['sem']) — the
    (B,H,W,C) upsampled tensors are never materialized and `outputs` goes
    unused, so XLA dead-code-eliminates the model's bilinear upsample from
    the step entirely (round-3 ADE trace: ~60 ms/step of the full-res loss
    chain at C=151). bce/icarl configs keep the dense path."""
    ce_mode = "unce" if (cfg.unce and cfg.old_classes != 0) else "ce"
    kd_mode = ("unkd" if cfg.unkd else "kd") if kd_on else "none"
    use_fused = (getattr(cfg, "fused_loss", True)
                 and not (cfg.bce or cfg.icarl)
                 and FL.supported(feats["sem"].shape, labels.shape,
                                  ce_mode, kd_mode))
    return ce_mode, kd_mode, use_fused


def _dense_criterion(cfg: Config, outputs, labels, outputs_old,
                     icarl_only_dist: bool):
    """Dense full-res criterion selection (reference train.py:34-40)."""
    if icarl_only_dist:
        return L.icarl_loss(outputs, labels,
                            jax.nn.sigmoid(outputs_old.astype(jnp.float32)),
                            bkg=cfg.icarl_bkg)
    if cfg.bce or cfg.icarl:
        return L.bce_with_logits_ignore(outputs, labels,
                                        reduction="mean_all")
    if cfg.unce and cfg.old_classes != 0:
        return L.unbiased_cross_entropy(outputs, labels, cfg.old_classes)
    return L.cross_entropy(outputs, labels)


def compute_train_losses(cfg: Config, outputs, feats, labels,
                         outputs_old=None, feats_old=None):
    """All loss terms of the hot loop (reference train.py:110-135)."""
    has_old = outputs_old is not None
    terms: dict[str, jnp.ndarray] = {}
    zero = jnp.zeros((), jnp.float32)

    icarl_combined = cfg.icarl and not cfg.icarl_disjoint and has_old
    icarl_only_dist = cfg.icarl and cfg.icarl_disjoint and has_old

    kd_on = cfg.loss_kd > 0 and has_old
    ce_mode, kd_mode, use_fused = _fused_gate(cfg, feats, labels, kd_on)
    fused_kd = None

    # main criterion (reference train.py:34-40)
    if use_fused:
        loss, kd_raw = FL.fused_ce_kd(
            feats["sem"], labels,
            feats_old["sem"] if kd_on else None,
            old_cl=cfg.old_classes, ce_mode=ce_mode, kd_mode=kd_mode,
            alpha=cfg.alpha)
        if kd_on:
            fused_kd = cfg.loss_kd * kd_raw
    else:
        loss = _dense_criterion(cfg, outputs, labels, outputs_old,
                                icarl_only_dist)
    terms["loss"] = loss

    # UCD pixel-contrastive distillation (train.py:114-116, gated — §2.6-7)
    l_con = zero
    if cfg.contrastive and has_old and not icarl_only_dist:
        l_con = ucd_contrastive_loss(
            feats["pre_logits"], labels, feats_old["sem"],
            feats_old["pre_logits"], max_label=cfg.num_classes - 1,
            temperature=cfg.temperature,
            capacity=cfg.contrastive_capacity,
            use_pallas=cfg.use_pallas_contrastive,
            bug_compatible=cfg.contrastive_bug_compatible,
            # bf16 training: the kernel streams bf16 tiles (half the HBM
            # traffic, one-pass MXU dots); f32 runs keep the exact path
            kernel_dtype=(jnp.bfloat16 if cfg.dtype == "bfloat16"
                          else jnp.float32),
        ) * cfg.contrastive_weight
    terms["l_con"] = l_con

    # iCaRL combined (train.py:119-124)
    l_icarl = zero
    if icarl_combined:
        l_icarl = L.icarl_combined_loss(outputs, outputs_old,
                                        cfg.icarl_importance)
    terms["l_icarl"] = l_icarl

    # ILT feature distillation (train.py:127-129)
    lde = zero
    if cfg.loss_de > 0 and has_old:
        lde = cfg.loss_de * (
            L.feature_distillation(feats["body"], feats_old["body"])
            + L.feature_distillation(feats["pre_logits"],
                                     feats_old["pre_logits"]))
    terms["lde"] = lde

    # knowledge distillation on logits (train.py:131-133)
    lkd = zero
    if fused_kd is not None:
        lkd = fused_kd
    elif cfg.loss_kd > 0 and has_old:
        kd_fn = (L.unbiased_knowledge_distillation if cfg.unkd
                 else L.knowledge_distillation)
        lkd = cfg.loss_kd * kd_fn(outputs, outputs_old, alpha=cfg.alpha)
    terms["lkd"] = lkd

    terms["loss_tot"] = loss + l_con + l_icarl + lde + lkd
    return terms


def make_train_step(cfg: Config, model, model_old, total_iters: int,
                    step_idx: Optional[int] = None):
    """Build the jitted train step. `model_old` is None at step 0.

    Returns fn(state, batch, old_vars) -> (state, metrics) where
    batch = {'image': (B,H,W,3) f32, 'label': (B,H,W) i32} and old_vars is the
    donor's {'params', 'batch_stats'} (or None)."""
    step_idx = cfg.step if step_idx is None else step_idx
    if cfg.dataset == "city_domain":
        step_idx = 0  # single fixed head keeps training (domain-incremental)
    tx = make_optimizer(cfg, total_iters)
    has_old = model_old is not None

    def train_step(state: TrainState, batch, old_vars=None):
        images, labels = batch["image"], batch["label"]
        # labels may ship as uint8 (every supported dataset has <=256 ids
        # incl. the 255 ignore): 4x less host->device label traffic than
        # int32. The widening cast is free on device (fused by XLA).
        labels = labels.astype(jnp.int32)

        outputs_old = feats_old = None
        if has_old:
            # frozen donor forward, eval mode (reference run.py:231-233)
            outputs_old, feats_old = model_old.apply(
                {"params": old_vars["params"],
                 "batch_stats": old_vars["batch_stats"]},
                images, train=False)
            outputs_old = jax.lax.stop_gradient(outputs_old)
            feats_old = jax.lax.stop_gradient(feats_old)

        def loss_fn(params):
            (outputs, feats), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, fix_bn=cfg.fix_bn,
                mutable=["batch_stats"])
            terms = compute_train_losses(cfg, outputs, feats, labels,
                                         outputs_old, feats_old)
            return terms["loss_tot"], (mut["batch_stats"], terms)

        (_, (new_bs, terms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # regularizer: accumulator update with main-loss grads, analytic
        # penalty gradient (reference train.py:141-147)
        reg_state = state.reg_state
        l_reg = jnp.zeros((), jnp.float32)
        if reg_state is not None:
            reg_state = R.update(reg_state, grads, state.params)
            l_reg = cfg.reg_importance * R.penalty(reg_state, state.params)
            pgrad = R.penalty_grad(reg_state, state.params,
                                   cfg.reg_importance)
            if pgrad is not None:
                grads = tmap(lambda g, p: g + p, grads, pgrad)
        terms["l_reg"] = l_reg

        mask = trainable_mask(state.params, step_idx,
                              freeze_body=cfg.freeze, fix_bn=cfg.fix_bn,
                              freeze_cls0_always=getattr(
                                  cfg, "freeze_cls0_always", False))
        grads = _apply_mask(grads, mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = _apply_mask(updates, mask)  # no weight decay on frozen
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=opt_state, reg_state=reg_state,
                                  step=state.step + 1)
        metrics = dict(terms)
        metrics["lr"] = make_lr_schedule(cfg, total_iters)(state.step)
        return new_state, metrics

    return train_step


def make_train_bundle(cfg: Config, model, model_old, total_iters: int,
                      k: int, step_idx: Optional[int] = None):
    """K train steps per device dispatch: `lax.scan` of the single step over
    a stacked batch {'image': (K,B,H,W,3), 'label': (K,B,H,W)}.

    Same math as K sequential `make_train_step` calls (the scan body IS that
    step; optimizer/batch-stat/regularizer state and the per-iteration LR
    schedule ride the carry) — what changes is the dispatch count: the host
    issues ONE device call per K steps. On v5e this measured PARITY with
    per-step dispatch (151.5 vs 152.7 img/s at K=8, BASELINE.md round 4):
    jax's async dispatch already hides the host gap, so bundling is off by
    default (cfg.steps_per_call=1) and kept for hosts where dispatch latency
    is real (slow tunnels, many small steps). Metrics come back stacked
    (K,) per term so per-step logging/averaging stays exact.

    The reference's torch loop (train.py:100-151) necessarily dispatches
    every op eagerly per step; this bundling is the XLA-native counterpart
    of CUDA-graph capture."""
    step_fn = make_train_step(cfg, model, model_old, total_iters, step_idx)

    def train_bundle(state: TrainState, batches, old_vars=None):
        def body(st, b):
            st2, m = step_fn(st, b, old_vars)
            # scan demands a type-stable carry; flax's running-stat update
            # can promote (f32-init stats x f64 batch stats under x64 test
            # mode). Pin the running stats to their input dtype — they feed
            # only EVAL-mode normalization, never the train trajectory.
            st2 = st2.replace(batch_stats=jax.tree_util.tree_map(
                lambda new, old: new.astype(old.dtype),
                st2.batch_stats, st.batch_stats))
            return st2, m
        return jax.lax.scan(body, state, batches)

    return train_bundle


def make_eval_step(cfg: Config, model, model_old=None):
    """Jitted eval step (reference Trainer.validate, train.py:185-270):
    criterion loss + distillation terms for logging, argmax prediction,
    confusion-matrix update (reduces across the mesh automatically)."""
    has_old = model_old is not None
    n_classes = cfg.tot_classes

    def eval_step(variables, batch, hist, old_vars=None):
        images, labels = batch["image"], batch["label"]
        labels = labels.astype(jnp.int32)  # uint8 ships 4x lighter
        outputs, feats = model.apply(variables, images, train=False)

        outputs_old = feats_old = None
        if has_old and old_vars is not None:
            outputs_old, feats_old = model_old.apply(old_vars, images,
                                                     train=False)

        # fused eval path: criterion + KD via the fused upsample+loss kernel
        # and predictions via the fused upsample+argmax kernel, both straight
        # from the LOW-RES logits — `outputs` then goes unused and XLA
        # dead-code-eliminates the model's full-res upsample from the eval
        # program (176 MB/batch at VOC, 1.3 GB at ADE never touch HBM).
        kd_on = cfg.loss_kd > 0 and has_old and outputs_old is not None
        ce_mode, kd_mode, use_fused = _fused_gate(cfg, feats, labels, kd_on)
        use_fused = use_fused and FE.supported(feats["sem"].shape,
                                               labels.shape[1:3])

        lkd = lde = jnp.zeros((), jnp.float32)
        if cfg.loss_de > 0 and has_old and feats_old is not None:
            # body + pre_logits, mirroring the train loop (reference
            # train.py:227-229 computes both in validate as well)
            lde = (L.feature_distillation(feats["body"], feats_old["body"])
                   + L.feature_distillation(feats["pre_logits"],
                                            feats_old["pre_logits"]))

        if use_fused:
            loss, lkd_raw = FL.fused_ce_kd(
                feats["sem"], labels,
                feats_old["sem"] if kd_on else None,
                old_cl=cfg.old_classes, ce_mode=ce_mode, kd_mode=kd_mode,
                alpha=cfg.alpha)
            if kd_on:
                lkd = lkd_raw  # unscaled, logging only (train.py:232)
            preds = FE.fused_argmax(feats["sem"], labels.shape[1:3])
        else:
            icarl_only_dist = cfg.icarl and cfg.icarl_disjoint and has_old
            loss = _dense_criterion(cfg, outputs, labels, outputs_old,
                                    icarl_only_dist)
            if kd_on:
                kd_fn = (L.unbiased_knowledge_distillation if cfg.unkd
                         else L.knowledge_distillation)
                # unscaled, logging only (reference train.py:232)
                lkd = kd_fn(outputs, outputs_old, alpha=cfg.alpha)
            preds = jnp.argmax(outputs, axis=-1).astype(jnp.int32)

        hist = confusion_matrix_update(hist, labels, preds, n_classes)
        return hist, {"loss": loss, "lkd": lkd, "lde": lde}, preds

    return eval_step
