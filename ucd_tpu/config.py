"""Experiment configuration for the TPU-native UCD framework.

Replaces the reference's argparse flag soup (/root/reference/argparser.py:46-203)
with a typed dataclass, and the `--method` preset expander
(/root/reference/argparser.py:5-43) with `apply_method`. Every reference flag
that affects training math has an equivalent field here; purely-torch flags
(opt_level, local_rank, MASTER_PORT) are replaced by TPU-native settings
(dtype policy, mesh shape).

Defects fixed relative to the reference (SURVEY.md §2.6):
  * `UCD` is a valid method choice (reference argparser.py:66-68 omitted it).
  * contrastive loss is gated behind `contrastive=True` (set by the UCD
    preset) instead of running for every method at step > 0
    (reference train.py:110-116).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional

from . import tasks as task_registry

# 'att' mirrors the reference's choices list (argparser.py:67): accepted,
# expands to no preset (flags are passed manually), kept for drop-in compat
METHODS = ("FT", "LWF", "LWF-MC", "ILT", "EWC", "RW", "PI", "MiB", "att",
           "UCD")

# per-dataset total class counts incl. background/void (argparser.py:6-11);
# city_domain uses the fixed 19 train-ids at every step (domain-incremental)
NUM_CLASSES = {"voc": 21, "ade": 151, "city": 20, "city_domain": 19}


@dataclass
class Config:
    # dataset / task
    dataset: str = "voc"
    task: str = "19-1"
    step: int = 0
    overlap: bool = False
    masking: bool = True           # reference: not --no_mask
    data_root: str = "data"
    cross_val: bool = False        # True: val = 80/20 random split of train;
                                   # False (default): val = the disk val split
                                   # (reference argparser.py:41 no_cross_val
                                   # inversion + run.py:98-106)

    # method
    method: Optional[str] = None

    # training
    epochs: int = 30
    batch_size: int = 24           # global batch (reference: per-GPU batch × world)
    crop_size: int = 512
    lr: float = 0.007
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_policy: str = "poly"        # poly | step
    lr_power: float = 0.9
    lr_decay_step: int = 5000
    lr_decay_factor: float = 0.1
    random_seed: int = 42
    num_workers: int = 4           # loader item-thread pool (reference
                                   # argparser.py:53 torch workers; threads
                                   # here — native/PIL ops release the GIL)
    fix_bn: bool = False
    freeze: bool = False           # freeze backbone body in incremental steps

    # model
    backbone: str = "resnet101"    # resnet50 | resnet101
    output_stride: int = 16
    pretrained: bool = True
    pretrained_path: Optional[str] = None
    norm_act: str = "iabn_sync"    # iabn_sync | iabn | abn | std (all map to BN+leaky_relu; sync is automatic under sharding)
    pooling: int = 32              # ASPP eval pooling size
    head_channels: int = 256

    # losses / methods
    bce: bool = False
    unce: bool = False
    unkd: bool = False
    alpha: float = 1.0             # KD soft-label hardening
    loss_kd: float = 0.0
    loss_de: float = 0.0
    contrastive: bool = False      # UCD pixel-contrastive distillation term
    temperature: float = 0.07
    contrastive_weight: float = 0.01   # reference divides conloss by 100 (train.py:116)
    contrastive_capacity: int = 0      # 0 = full B*h*w pixel set; >0 = fixed anchor budget
    contrastive_bug_compatible: bool = False  # shipped unstabilized-neg formula
    freeze_cls0_always: bool = False   # reference quirk: cls[0] frozen even
                                       # at step 0 (segmentation_module.py:75-78)
    bug_compatible: bool = False       # one switch -> ALL shipped reference
                                       # quirks (see apply_bug_compatible)
    icarl: bool = False
    icarl_importance: float = 1.0
    icarl_disjoint: bool = False
    icarl_bkg: bool = False
    init_balanced: bool = False

    # regularizers
    regularizer: Optional[str] = None   # ewc | pi | rw
    reg_importance: float = 1.0
    reg_alpha: float = 0.9
    reg_normalize: bool = True          # reference: not --reg_no_normalize
    reg_iterations: int = 10

    # TPU execution
    dtype: str = "bfloat16"        # compute dtype: bfloat16 | float32
    param_dtype: str = "float32"   # master weights — informational; fp32 is
                                   # the only supported master dtype (bf16
                                   # masters lose SGD-momentum precision for
                                   # zero HBM win at this model size)
    # upsample logits in bf16 (~+3% step speed). Default ON: the classifier
    # already emits bf16 under the compute policy, so an f32 upsample only
    # upcasts rounding noise at 4x the HBM traffic; losses still reduce in
    # f32. This matches the configuration all benchmark numbers use.
    xla_options: str = ""          # comma-separated TPU compiler options
                                   # ("xla_tpu_scoped_vmem_limit_kib=49152,
                                   # ...") forwarded as jit
                                   # compiler_options to the train/eval
                                   # steps. XLA_FLAGS cannot carry
                                   # TPU-backend flags through a PJRT
                                   # tunnel (the local client's parser
                                   # rejects them); compiler_options rides
                                   # the compile request itself. TPU-only:
                                   # the CPU backend rejects TPU flags.
    bf16_upsample: bool = True
    bf16_norm: bool = False        # BatchNorm compute in bf16 (stats f32)
    bf16_norm_early: bool = False  # bf16 norms on stem+mod2 only (the
                                   # HBM-bound 128^2/256^2 groups); late
                                   # MXU-bound groups keep f32 norms
    stable_norm: bool = False      # two-pass (cancellation-free) BatchNorm
                                   # variance == torch semantics; default is
                                   # flax's one-pass E[x^2]-E[x]^2
    remat_early: bool = False      # rematerialize the mod2 group backward
                                   # (trade recompute for saved-activation
                                   # HBM in the measured bandwidth-bound zone)
    steps_per_call: int = 1        # K train steps per device dispatch: >1
                                   # runs the hot loop as one lax.scan over a
                                   # (K,B,...) stacked batch, paying host
                                   # dispatch latency once per K steps. Same
                                   # math as K per-step calls. Measured on
                                   # v5e (batch 16@512², BASELINE.md r4):
                                   # PARITY — 151.5 bundled vs 152.7 per-step
                                   # at K=8; jax's async dispatch already
                                   # hides the host gap. Kept for hosts with
                                   # real dispatch latency (slow tunnels,
                                   # many-step small models). Epoch tails
                                   # shorter than K run per-step.
    data_axis: int = 0             # mesh axis size 0 = all devices
    remat: bool = False            # rematerialize backbone blocks to save HBM
    stem_s2d: bool = False         # space-to-depth packed stem conv
                                   # (models/resnet.py:S2DStemConv): exactly
                                   # equivalent math; measured ~5% SLOWER on
                                   # v5e (12 input channels still pad to the
                                   # 128 MXU lanes) so off by default —
                                   # BASELINE.md round-3 sweep
    nan_guard: bool = False        # skip updates with non-finite grads
                                   # (optax.apply_if_finite; NEW vs reference)
    use_pallas_contrastive: bool = True
    device_normalize: bool = True  # input pipeline ships raw uint8 RGB and
                                   # the model normalizes on device (4x less
                                   # host->device transfer, no host per-pixel
                                   # normalize pass). Same ImageNet affine in
                                   # f32; --no_device_normalize restores the
                                   # reference's host-side ToTensor+Normalize
    fused_loss: bool = True        # fused upsample+CE/KD Pallas kernel
                                   # (ops/fused_loss.py): the full-res loss
                                   # chain never materializes the upsampled
                                   # (B,H,W,C) logits. Applies to the
                                   # ce/unce criterion and kd/unkd terms;
                                   # bce/icarl configs use the dense path.
                                   # Interpolation runs in f32 (slightly
                                   # MORE precise than the bf16_upsample
                                   # dense path it replaces).

    # eval / logging / ckpt
    crop_val: bool = True
    eval_bucket_multiple: int = 128  # crop_val=False: pad full-size val
                                   # images up to (ceil(H/m)*m, ceil(W/m)*m)
                                   # static buckets so XLA compiles a handful
                                   # of programs instead of one per image
                                   # shape (the reference evals native sizes
                                   # at batch 1, run.py:57-73 — fine on GPU,
                                   # a compile storm on TPU). 0 = exact
                                   # native shapes (recompiles per shape).
    val_on_trainset: bool = False  # test on the train split (argparser.py:100)
    val_interval: int = 1
    ckpt_interval: int = 1         # save every N validated epochs (argparser.py:122)
    visualize: bool = True         # TB summaries + sample images (argparser.py:116)
    wandb: bool = False            # mirror scalars to wandb (reference
                                   # run.py:25-30; also honors UCD_TPU_WANDB=1)
    num_classes_override: Optional[int] = None  # argparser.py:61
    fusion_mode: str = "mean"      # TTA fusion: mean|voting|max (argparser.py:134)
    test_scales: tuple = (1.0,)    # TTA view pyramid for the predict path
    test_flip: bool = False        # TTA horizontal flip
    print_interval: int = 10
    logdir: str = "./logs"
    name: str = "Experiment"
    ckpt_dir: str = "checkpoints/step"
    async_ckpt: bool = False       # write checkpoints on a background thread
                                   # (state snapshotted at save time; the
                                   # epoch loop never blocks on orbax
                                   # serialization/disk. NEW vs reference,
                                   # whose torch.save blocks run.py:317-322)
    ckpt: Optional[str] = None     # resume path
    auto_resume: bool = False      # resume from ckpt_path() if it exists
                                   # (NEW: the reference requires manual
                                   # --ckpt after a crash, run.py:249-260)
    step_ckpt: Optional[str] = None  # previous-step checkpoint override
    test_only: bool = False
    sample_num: int = 0
    debug: bool = False

    # -- derived ----------------------------------------------------------
    @property
    def num_classes(self) -> int:
        if self.num_classes_override is not None:
            return self.num_classes_override
        return NUM_CLASSES[self.dataset]

    @property
    def classes_per_step(self) -> list[int]:
        if self.dataset == "city_domain":
            # classes are fixed; steps add domains, not classifier heads
            return [NUM_CLASSES[self.dataset]]
        return task_registry.get_per_task_classes(self.dataset, self.task, self.step)

    @property
    def tot_classes(self) -> int:
        return sum(self.classes_per_step)

    @property
    def old_classes(self) -> int:
        cps = self.classes_per_step
        return sum(cps[:-1]) if len(cps) > 1 else 0

    @property
    def new_classes(self) -> int:
        return self.classes_per_step[-1]

    @property
    def task_name(self) -> str:
        return f"{self.task}-{self.dataset}"

    def ckpt_path(self, step: Optional[int] = None) -> str:
        step = self.step if step is None else step
        return f"{self.ckpt_dir}/{self.task_name}_{self.name}_{step}"

    def resolve_pretrained_path(self) -> str:
        """ImageNet backbone release file (reference
        segmentation_module.py:27: pretrained/{backbone}_{norm_act}.pth.tar)."""
        if self.pretrained_path is not None:
            return self.pretrained_path
        return f"pretrained/{self.backbone}_{self.norm_act}.pth.tar"

    def validate(self) -> "Config":
        assert self.dataset in NUM_CLASSES, f"unknown dataset {self.dataset}"
        assert self.output_stride in (8, 16)
        assert self.backbone in ("resnet50", "resnet101")
        assert self.lr_policy in ("poly", "step")
        assert self.fusion_mode in ("mean", "voting", "max")
        assert self.ckpt_interval >= 1
        assert self.steps_per_call >= 1
        assert self.method is None or self.method in METHODS
        assert self.regularizer in (None, "ewc", "pi", "rw")
        if self.contrastive and self.contrastive_bug_compatible \
                and self.use_pallas_contrastive:
            raise ValueError(
                "contrastive_bug_compatible requires the dense path: pass "
                "use_pallas_contrastive=False (--no_pallas). The tiled "
                "kernel cannot reproduce the reference's unstabilized "
                "negative sum.")
        task_dict = task_registry.get_task_dict(self.dataset, self.task)
        assert self.step in task_dict, (
            f"step {self.step} out of range for task {self.task} "
            f"(valid: 0..{max(task_dict)})")
        if self.dataset == "city_domain":
            assert not (self.unce or self.unkd or self.contrastive
                        or self.icarl or self.init_balanced), (
                "background-unbiased / contrastive / icarl methods require "
                "class-incremental steps; use FT/LWF/ILT/EWC/PI/RW for "
                "domain-incremental Cityscapes")
        return self


def apply_method(cfg: Config) -> Config:
    """Expand `cfg.method` into hyperparameters (reference argparser.py:15-39)."""
    m = cfg.method
    if m is None or m == "FT":
        return cfg
    updates: dict = {}
    if m == "LWF":
        updates = dict(loss_kd=100.0)
    elif m == "LWF-MC":
        updates = dict(icarl=True, icarl_importance=10.0)
    elif m == "ILT":
        updates = dict(loss_kd=100.0, loss_de=100.0)
    elif m == "EWC":
        updates = dict(regularizer="ewc", reg_importance=500.0)
    elif m == "RW":
        updates = dict(regularizer="rw", reg_importance=100.0)
    elif m == "PI":
        updates = dict(regularizer="pi", reg_importance=500.0)
    elif m == "MiB":
        updates = dict(loss_kd=10.0, unce=True, unkd=True, init_balanced=True)
    elif m == "UCD":
        # reference preset (argparser.py:35-39) plus the always-on contrastive
        # term gated properly (SURVEY.md §2.6-7)
        updates = dict(loss_kd=10.0, unce=True, unkd=True, init_balanced=True,
                       contrastive=True)
    return dataclasses.replace(cfg, **updates)


def apply_bug_compatible(cfg: Config) -> Config:
    """Expand `bug_compatible=True` into every as-shipped reference quirk the
    defaults deliberately fix (SURVEY.md §2.6; VERDICT r3 item 6) — one flag
    for A/B behavioral diffs against the shipped reference:

      * cls[0] frozen even at step 0 (segmentation_module.py:75-78);
      * the contrastive term runs for EVERY method at step > 0, not just UCD
        (train.py:110-116 guards only on `model_old is not None`);
      * the contrastive loss uses the shipped unstabilized-negative formula
        (utils/loss.py:444-452), which requires the dense path.
    """
    if not cfg.bug_compatible:
        return cfg
    updates: dict = dict(freeze_cls0_always=True,
                         contrastive_bug_compatible=True,
                         use_pallas_contrastive=False)
    if cfg.step > 0 and cfg.dataset != "city_domain":
        updates["contrastive"] = True
    return dataclasses.replace(cfg, **updates)


def parse_xla_options(s: str):
    """`"k1=v1,k2=v2"` -> dict for jit compiler_options; ""/None -> None
    (jit's default). "true"/"false" values become Python bools (XLA's
    option setter type-checks bools and rejects the strings); everything
    else stays a string — numeric strings are parsed by the flag setter."""
    if not s:
        return None
    out = {}
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"xla_options entry {part!r} is not k=v")
        k, v = part.split("=", 1)
        v = v.strip()
        if v.lower() in ("true", "false"):
            v = v.lower() == "true"
        out[k.strip()] = v
    return out or None


def make_config(**kwargs) -> Config:
    """Build, expand method preset + bug-compatible preset, validate."""
    cfg = Config(**kwargs)
    cfg = apply_method(cfg)
    cfg = apply_bug_compatible(cfg)
    return cfg.validate()


def poly_lr(base_lr: float, step: int, max_iters: int, power: float = 0.9) -> float:
    """PolyLR: base*(1-iter/max_iter)^power, stepped per iteration
    (reference utils/scheduler.py:1-10)."""
    return base_lr * max(0.0, (1.0 - step / max_iters)) ** power
