"""Experiment orchestration: dataset assembly, the epoch loop, validation,
checkpointing and the final all-classes test.

Rebuild of the reference entry point flow (/root/reference/run.py:46-401):
get_dataset -> model + frozen donor -> optimizer/schedule -> cross-step
restore (+ MiB imprinting) -> epoch loop (train, validate, save-best) ->
final test on all seen classes. TPU-first differences:

  * one process drives the whole mesh (no per-GPU process launch); batches
    are host-sharded onto the mesh, state is replicated;
  * the train step is a single jitted function (engine/train.py) — sync-BN,
    gradient averaging and loss reduction are SPMD collectives, so there is
    no rank-0 special casing anywhere in the loop;
  * per-step timing and an optional jax.profiler trace are first-class
    (the reference has no profiling at all, SURVEY.md §5.1).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import tasks as task_registry
from ..config import Config
from ..data import DataLoader, make_incremental_dataset, split_train_val
from ..data.transforms import train_transform, val_transform
from ..models import make_model
from ..ops import regularizers as R
from ..parallel import batch_sharding, bundle_sharding, make_mesh, \
    make_mesh_for_batch, make_mesh_multiprocess, replicated
from ..parallel.distributed import local_batch_size
from ..utils.viz import compose_sample_png
from . import checkpoint as ckpt_lib
from .logger import Logger
from .metrics import empty_confusion, results_from_confusion, results_to_str
from .state import build_train_state
from .train import make_eval_step, make_train_bundle, make_train_step


def get_datasets(cfg: Config, base_train=None, base_val=None):
    """Train/val/test datasets (reference run.py:46-113): train on the new
    classes (masked); val = the disk val split by default, or an 80/20
    random split of train when --cross_val (reference argparser.py:41
    inverts the flag into no_cross_val; run.py:98-106); test on all seen
    classes."""
    labels, labels_old, path_base = task_registry.get_task_labels(
        cfg.dataset, cfg.task, cfg.step)
    labels_cum = labels_old + labels
    if cfg.overlap:
        path_base += "-ov"
    idx_dir = None
    if base_train is None:
        os.makedirs(path_base, exist_ok=True)
        idx_dir = path_base
    train_dst = make_incremental_dataset(
        cfg.dataset, cfg.data_root, train=True,
        transform=train_transform(cfg.crop_size,
                                  device_normalize=cfg.device_normalize),
        labels=labels, labels_old=labels_old,
        idxs_path=(f"{idx_dir}/train-{cfg.step}.npy" if idx_dir else None),
        masking=cfg.masking, overlap=cfg.overlap, base=base_train)

    if cfg.cross_val:
        train_dst, val_dst = split_train_val(train_dst, 0.2, cfg.random_seed)
    else:
        val_dst = make_incremental_dataset(
            cfg.dataset, cfg.data_root, train=False,
            transform=val_transform(cfg.crop_size if cfg.crop_val else None,
                                device_normalize=cfg.device_normalize),
            labels=labels, labels_old=labels_old,
            idxs_path=(f"{idx_dir}/val-{cfg.step}.npy" if idx_dir else None),
            masking=cfg.masking, overlap=True,
            base=base_val if base_val is not None else base_train)

    # --val_on_trainset: test on the TRAIN split (reference run.py:108-109,
    # idx cache switches to test_on_train-{step}.npy)
    image_set = "train" if cfg.val_on_trainset else "val"
    test_base = base_train if cfg.val_on_trainset else (
        base_val if base_val is not None else base_train)
    test_dst = make_incremental_dataset(
        cfg.dataset, cfg.data_root, train=cfg.val_on_trainset,
        transform=val_transform(cfg.crop_size if cfg.crop_val else None,
                                device_normalize=cfg.device_normalize),
        labels=labels_cum, labels_old=None,
        idxs_path=(f"{idx_dir}/test_on_{image_set}-{cfg.step}.npy"
                   if idx_dir else None),
        masking=True, overlap=True, base=test_base)

    return train_dst, val_dst, test_dst, len(labels_cum) + 1


def pad_to_bucket(batch: dict, multiple: int) -> dict:
    """Pad images (zeros) / labels (ignore=255) up to the next spatial
    bucket — H, W each rounded up to a multiple of `multiple`. Full-size
    eval then compiles one XLA program per bucket instead of one per unique
    image shape (VERDICT round-2 item 3; reference run.py:57-73 evals
    native shapes at batch 1). Padded label pixels are 255 and therefore
    excluded from the confusion matrix and every loss numerator; model
    outputs near the padded border can shift within the conv/ASPP-pooling
    receptive field (documented trade-off vs a per-shape compile storm)."""
    h, w = batch["label"].shape[1:3]
    hb = -(-h // multiple) * multiple
    wb = -(-w // multiple) * multiple
    if (hb, wb) == (h, w):
        return batch
    return {
        "image": np.pad(batch["image"],
                        ((0, 0), (0, hb - h), (0, wb - w), (0, 0))),
        "label": np.pad(batch["label"], ((0, 0), (0, hb - h), (0, wb - w)),
                        constant_values=255),
    }


def _enable_compile_cache():
    """Persistent XLA compile cache: repeat runs of the same step skip the
    (minutes-long on big programs) compile. Opt out with UCD_TPU_NO_CACHE=1."""
    if os.environ.get("UCD_TPU_NO_CACHE") == "1":
        return
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(os.environ.get("UCD_TPU_CACHE_DIR",
                                              "~/.cache/ucd_tpu_xla")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass


class Experiment:
    def __init__(self, cfg: Config, base_train=None, base_val=None,
                 mesh=None, logger: Optional[Logger] = None):
        cfg.validate()
        _enable_compile_cache()
        self.cfg = cfg
        # multi-process (multi-host) runs span every process's devices,
        # trimmed equally per host so the global batch divides the device
        # count (reference run.py:117-124 NCCL world); single-process meshes
        # shrink freely per batch
        if mesh is not None:
            self.mesh = mesh
        elif jax.process_count() > 1:
            self.mesh = make_mesh_multiprocess(cfg.batch_size)
            if not cfg.crop_val and not cfg.test_only:
                # full-size eval feeds per-image shapes: local shards on
                # different hosts would imply conflicting global array
                # shapes in _put_batch, compiling divergent SPMD programs
                raise ValueError(
                    "crop_val=False (full-size eval) is not supported in "
                    "multi-process runs: per-host images have different "
                    "shapes and cannot assemble one global batch. Use "
                    "--crop_val, or eval single-process.")
        else:
            self.mesh = make_mesh_for_batch(cfg.batch_size)
        self.rep = replicated(self.mesh)
        self.data_sh = batch_sharding(self.mesh)
        # per-process share of the global batch (the reference's per-GPU
        # batch, README.md:52): each process loads its own shard and the
        # global array is assembled in _put_batch
        self.local_batch = local_batch_size(cfg.batch_size)

        logdir = f"{cfg.logdir}/{cfg.task_name}/{cfg.name}"
        self.logger = logger or Logger(logdir, rank=jax.process_index(),
                                       debug=cfg.debug, step=cfg.step,
                                       summary=cfg.visualize,
                                       use_wandb=getattr(cfg, "wandb", False))

        self.train_dst, self.val_dst, self.test_dst, _ = get_datasets(
            cfg, base_train, base_val)
        self.train_loader = DataLoader(self.train_dst, self.local_batch,
                                       seed=cfg.random_seed,
                                       process_index=jax.process_index(),
                                       process_count=jax.process_count(),
                                       workers=cfg.num_workers)
        self.val_loader = DataLoader(
            self.val_dst, self.local_batch if cfg.crop_val else 1,
            shuffle=False, drop_last=False, seed=cfg.random_seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(), workers=cfg.num_workers)
        if not cfg.test_only and len(self.train_loader) == 0:
            raise ValueError(
                f"train loader is empty ({len(self.train_dst)} filtered "
                f"images, batch size {self.local_batch}, drop_last) — "
                "lower --batch_size, add data, or check the task's "
                "disjoint/--overlap filtering")
        self.total_iters = cfg.epochs * max(len(self.train_loader), 1)

        self.model = make_model(cfg)
        self.model_old = None
        prev_model_state = prev_reg = None
        if cfg.step > 0:
            self.model_old = make_model(cfg, classes=cfg.classes_per_step[:-1])
            path = cfg.step_ckpt or cfg.ckpt_path(cfg.step - 1)
            prev_model_state = ckpt_lib.load_model_state(path)
            prev_reg = ckpt_lib.load_reg_saved(path)
            if prev_model_state is None:
                if cfg.debug or cfg.test_only:
                    # eval-only runs don't need the donor; debug mode allows
                    # training from scratch (reference run.py:226-229)
                    self.logger.info(
                        f"WARNING: no step-{cfg.step - 1} checkpoint at "
                        f"{path}; continuing without the donor model")
                    self.model_old = None
                else:
                    raise FileNotFoundError(path)

        # same-step resume path resolved BEFORE the pretrained load: an
        # unattended preemption restart must not fail on a host lacking
        # pretrained/ when a valid checkpoint will overwrite the params
        # anyway (ADVICE.md round 2)
        resume_path = cfg.ckpt
        if resume_path is None and cfg.auto_resume \
                and os.path.exists(cfg.ckpt_path()):
            resume_path = cfg.ckpt_path()
            self.logger.info(f"[!] auto-resume from {resume_path}")

        # ImageNet-pretrained backbone (reference segmentation_module.py:25-43,
        # run.py:161-167): mandatory for accuracy parity. Only needed when no
        # previous-step checkpoint supplies the body (a cross-step restore
        # overwrites every pretrained leaf), and never for eval-only runs
        # (the body comes from --ckpt / --step_ckpt there) or same-step
        # resumes (the checkpoint restore overwrites every leaf).
        pretrained_body = None
        if cfg.pretrained and prev_model_state is None and not cfg.test_only \
                and not (resume_path and os.path.exists(resume_path)):
            from ..models.pretrained import load_pretrained_body
            ppath = cfg.resolve_pretrained_path()
            pretrained_body = load_pretrained_body(ppath)
            if pretrained_body is None:
                msg = (
                    f"pretrained=True but no backbone release file at "
                    f"{ppath!r}. Download the mapillary inplace-abn ImageNet "
                    f"release ({cfg.backbone}_{cfg.norm_act}.pth.tar) into "
                    f"pretrained/, point --pretrained_path at it, or pass "
                    f"--no_pretrained to train from scratch.")
                if cfg.debug:
                    # debug mode allows scratch training (mirrors the donor
                    # leniency above); production runs hard-error like the
                    # reference's torch.load would
                    self.logger.info("WARNING: " + msg)
                else:
                    raise FileNotFoundError(msg)

        self.state, self.old_vars = build_train_state(
            cfg, self.model, jax.random.key(cfg.random_seed),
            self.total_iters, prev_model_state=prev_model_state,
            prev_reg_saved=prev_reg, pretrained_body=pretrained_body,
            input_shape=(1, cfg.crop_size, cfg.crop_size, 3))
        self.state = jax.device_put(self.state, self.rep)
        if self.old_vars is not None:
            self.old_vars = jax.device_put(self.old_vars, self.rep)

        # no buffer donation: the axon TPU backend miscompiles donated
        # step>0 graphs (INVALID_ARGUMENT); re-enable via UCD_TPU_DONATE=1
        # on backends where donation is sound
        donate = (0,) if os.environ.get("UCD_TPU_DONATE") == "1" else ()
        # cfg.xla_options: TPU compiler options on the compile request (the
        # only channel that reaches a remote PJRT backend — XLA_FLAGS is
        # parsed by the LOCAL client, which rejects TPU flags)
        from ..config import parse_xla_options
        xla_opts = parse_xla_options(getattr(cfg, "xla_options", ""))
        self.train_step = jax.jit(
            make_train_step(cfg, self.model, self.model_old,
                            self.total_iters),
            donate_argnums=donate, compiler_options=xla_opts)
        # K-step dispatch bundling (cfg.steps_per_call > 1): one lax.scan
        # device call trains K steps over a (K,B,...) stacked batch — same
        # math, 1/K the dispatch count. Off by default: measured parity
        # with per-step dispatch on v5e (BASELINE.md r4 — async dispatch
        # already hides the host gap); for hosts with real dispatch latency.
        # Epoch tails shorter than K fall back to self.train_step.
        self.steps_per_call = max(int(getattr(cfg, "steps_per_call", 1)), 1)
        self.train_bundle = None
        if self.steps_per_call > 1:
            self.bundle_sh = bundle_sharding(self.mesh)
            self.train_bundle = jax.jit(
                make_train_bundle(cfg, self.model, self.model_old,
                                  self.total_iters,
                                  k=self.steps_per_call),
                donate_argnums=donate, compiler_options=xla_opts)
        self.eval_step = jax.jit(make_eval_step(cfg, self.model,
                                                self.model_old),
                                 compiler_options=xla_opts)

        self.cur_epoch = 0
        self.best_score = 0.0
        self.last_val_samples: list = []
        # same-step resume (reference run.py:249-260): model, optimizer
        # (momentum + schedule position), epoch/best, and the regularizer's
        # in-flight accumulators — a resumed run is bit-identical to an
        # uninterrupted one (tested in test_experiment.py). resume_path was
        # resolved above, before the pretrained load.
        if resume_path is not None:
            ck = ckpt_lib.load_checkpoint(resume_path)
            if ck is not None:
                ckpt_lib.check_schema(ck, resume_path)
                if cfg.test_only:
                    # eval-only runs need params/batch_stats only; the
                    # checkpoint's opt_state may have a different structure
                    # (e.g. trained with a different --nan_guard setting)
                    # and must not fail the restore (ADVICE.md round 2)
                    opt_state = self.state.opt_state
                    reg_state = self.state.reg_state
                else:
                    opt_state = ckpt_lib.restore_like(self.state.opt_state,
                                                      ck["optimizer_state"])
                    reg_state = R.restore_full(self.state.reg_state,
                                               ckpt_lib.load_reg_full(ck))
                self.state = self.state.replace(
                    params=ck["model_state"]["params"],
                    batch_stats=ck["model_state"]["batch_stats"],
                    opt_state=opt_state, reg_state=reg_state,
                    step=jnp.asarray(ck["step"]))
                self.cur_epoch = int(ck["epoch"]) + 1
                self.best_score = float(ck["best_score"])
                self.logger.info(f"[!] Model restored from {resume_path}")

    # ------------------------------------------------------------------
    def _put_batch(self, batch, pad_to: Optional[int] = None):
        if pad_to:
            n = batch["label"].shape[0]
            rem = pad_to - n
            if rem > 0:
                # pad with ignore-labelled zeros: excluded from the confusion
                # matrix (labels==255 >= n_classes) and the loss numerator
                batch = {
                    "image": np.concatenate(
                        [batch["image"],
                         np.zeros((rem,) + batch["image"].shape[1:],
                                  batch["image"].dtype)]),
                    "label": np.concatenate(
                        [batch["label"],
                         np.full((rem,) + batch["label"].shape[1:], 255,
                                 batch["label"].dtype)]),
                }
        if jax.process_count() > 1:
            # assemble the global batch from this process's local shard
            # (the per-host data path of SURVEY §5.8; plain device_put cannot
            # build a multi-host global array)
            return {k: jax.make_array_from_process_local_data(self.data_sh, v)
                    for k, v in batch.items()}
        if batch["label"].shape[0] % self.mesh.devices.size:
            # a drop_last=False loader's short batch can't shard over the
            # mesh: replicate it instead. The step is plain-jit SPMD (no
            # explicit collectives), so a replicated batch computes the
            # exact single-device math — it just runs unparallelized for
            # this one (rare, differently-shaped-anyway) dispatch.
            return {k: jax.device_put(v, self.rep) for k, v in batch.items()}
        return {k: jax.device_put(v, self.data_sh) for k, v in batch.items()}

    def _put_bundle(self, stacked):
        """Device-put a (K, B, ...) stacked batch: K (the scan axis) is
        replicated, B shards over the data axis — the bundle analog of
        `_put_batch` (multi-host shards are per-process local, exactly as
        in the per-step path)."""
        if jax.process_count() > 1:
            return {k: jax.make_array_from_process_local_data(
                        self.bundle_sh, v)
                    for k, v in stacked.items()}
        return {k: jax.device_put(v, self.bundle_sh)
                for k, v in stacked.items()}

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.cfg
        t0 = time.perf_counter()
        sums, n = {}, 0
        # metrics stay ON DEVICE between print intervals: fetching every step
        # would force a device->host sync per iteration — the .item() stall
        # the reference is criticized for (SURVEY §3.2) and the reason the
        # round-1 product loop was slower than bench.py. One device_get per
        # print_interval keeps the dispatch queue full. Each pending entry
        # is a metrics dict whose leaves are scalars (per-step dispatch) or
        # (K,)-stacked arrays (a steps_per_call bundle); both sum/average
        # identically per STEP.
        pending: list[dict] = []
        since_print = 0  # steps dispatched since the last print

        def fetch_pending():
            fetched = jax.device_get(pending)
            pending.clear()
            for fm in fetched:
                for k, v in fm.items():
                    sums[k] = sums.get(k, 0.0) + float(np.sum(v))
            return fetched

        def maybe_print():
            nonlocal since_print
            if since_print < cfg.print_interval or not pending:
                return
            since_print = 0
            fetched = fetch_pending()
            losses = np.concatenate(
                [np.ravel(fm["loss_tot"]) for fm in fetched])
            avg = float(losses.mean())
            self.logger.info(
                f"Epoch {epoch}, Batch {n}/"
                f"{len(self.train_loader)}, Loss={avg:.4f}")
            x = epoch * len(self.train_loader) + n
            self.logger.add_scalar("Loss", avg, x)

        k_bundle = self.steps_per_call if self.train_bundle is not None else 1
        buf: list[dict] = []  # host batches awaiting a full K-bundle

        def dispatch_bundle():
            stacked = {key: np.stack([b[key] for b in buf])
                       for key in buf[0]}
            buf.clear()
            self.state, m = self.train_bundle(
                self.state, self._put_bundle(stacked), self.old_vars)
            pending.append(m)

        for batch in self.train_loader.epoch(epoch):
            if (k_bundle > 1
                    and batch["label"].shape[0]
                    == self.train_loader.batch_size):
                buf.append(batch)
                if len(buf) == k_bundle:
                    dispatch_bundle()
                    n += k_bundle
                    since_print += k_bundle
            else:
                # per-step path: bundling off, or an odd-shaped batch.
                # Flush buffered full batches FIRST so the optimizer
                # trajectory keeps the loader's order — a drop_last=False
                # loader can yield a short batch mid-epoch, and training it
                # ahead of earlier buffered batches would silently diverge
                # from the steps_per_call=1 trajectory.
                for b in buf:
                    self.state, m = self.train_step(self.state,
                                                    self._put_batch(b),
                                                    self.old_vars)
                    n += 1
                    since_print += 1
                    pending.append(m)
                buf.clear()
                self.state, m = self.train_step(self.state,
                                                self._put_batch(batch),
                                                self.old_vars)
                n += 1
                since_print += 1
                pending.append(m)
            maybe_print()
        # epoch tail shorter than K: run the already-built per-step program
        for batch in buf:
            self.state, m = self.train_step(self.state,
                                            self._put_batch(batch),
                                            self.old_vars)
            n += 1
            pending.append(m)
        buf.clear()
        if pending:
            fetch_pending()
        dt = time.perf_counter() - t0
        out = {k: v / max(n, 1) for k, v in sums.items()}
        out["epoch_time_s"] = dt
        out["images_per_s"] = n * cfg.batch_size / dt if dt > 0 else 0.0
        return out

    def validate(self, loader=None) -> tuple[dict, dict]:
        cfg = self.cfg
        loader = loader or self.val_loader
        hist = jax.device_put(empty_confusion(cfg.tot_classes), self.rep)
        sums, n = {}, 0
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        # fixed eval batch shape: one compile, remainder batches padded with
        # ignore labels. The pad target is per-PROCESS (each process feeds
        # its local shard) and must tile over the local devices.
        n_local = max(self.mesh.devices.size // jax.process_count(), 1)
        pad_to = -(-loader.batch_size // n_local) * n_local
        pending = []
        # sample collection for TB image logging (reference run.py:343-349):
        # seeded-random ids over the val set, like the reference's
        # np.random.choice sample_ids — not the stream head, which would show
        # identical early-class images every epoch (ADVICE.md round 2)
        want = cfg.sample_num if cfg.visualize else 0
        if want > 0 and jax.process_count() > 1:
            # preds is a global array whose shards live on other hosts;
            # per-sample indexing would raise 'not fully addressable'.
            # Sample panels are a single-host observability feature.
            self.logger.info("sample logging disabled in multi-process runs")
            want = 0
        sample_ids: set = set()
        if want > 0:
            srng = np.random.default_rng(cfg.random_seed)
            n_items = len(loader.dataset) if hasattr(loader, "dataset") else 0
            if n_items > 0:
                sample_ids = set(srng.choice(
                    n_items, size=min(want, n_items), replace=False).tolist())
        samples = []
        seen = 0  # real (unpadded) samples consumed so far
        bucket = (not cfg.crop_val) and cfg.eval_bucket_multiple > 0
        for batch in loader.epoch(0):
            if bucket:
                batch = pad_to_bucket(batch, cfg.eval_bucket_multiple)
            hist, losses, preds = self.eval_step(
                variables, self._put_batch(batch, pad_to=pad_to),
                hist, self.old_vars)
            n += 1
            pending.append(losses)
            bsz = batch["label"].shape[0]
            for j in range(bsz):
                if seen + j in sample_ids:
                    samples.append((batch["image"][j], batch["label"][j],
                                    preds[j]))
            seen += bsz
        # single host fetch after the whole eval stream (no per-batch sync)
        for fm in jax.device_get(pending):
            for k, v in fm.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        self.last_val_samples = [(img, lbl, np.asarray(pred))
                                 for img, lbl, pred in samples]
        self.last_confusion = np.asarray(hist)
        if jax.process_count() > 1:
            # the confusion matrix aggregates every host's pixels; make the
            # sample count global too (local `seen` would undercount by ~pc)
            from jax.experimental import multihost_utils
            seen = int(np.sum(multihost_utils.process_allgather(
                np.asarray(seen, np.int64))))
        res = results_from_confusion(self.last_confusion, total_samples=seen)
        return {k: v / max(n, 1) for k, v in sums.items()}, res

    def save(self, epoch: int, score: float):
        cfg = self.cfg
        # EVERY process must enter the orbax save: Checkpointer.save opens
        # with a sync_global_processes barrier, so a rank-0-only call (the
        # reference's run.py:317-322 pattern) deadlocks a multi-host run.
        # Orbax itself writes each (replicated) leaf from process 0 only.
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        reg_saved = R.export_state(self.state.reg_state, self.state.params)
        ckpt_lib.save_checkpoint(cfg.ckpt_path(), self.state, epoch, score,
                                 reg_saved=reg_saved,
                                 reg_full=R.export_full(self.state.reg_state))
        if jax.process_index() == 0:
            self.logger.info("[!] Checkpoint saved.")

    def run(self, profile_dir: Optional[str] = None) -> dict:
        """Full train/val loop + final test (reference run.py:286-401)."""
        cfg = self.cfg
        results = {}
        while self.cur_epoch < cfg.epochs and not cfg.test_only:
            epoch = self.cur_epoch
            if profile_dir and epoch == 0:
                jax.profiler.start_trace(profile_dir)
            m = self.train_epoch(epoch)
            self.last_train_metrics = m
            if profile_dir and epoch == 0:
                jax.profiler.stop_trace()
            self.logger.info(
                f"End of Epoch {epoch}/{cfg.epochs}, Average Loss="
                f"{m.get('loss_tot', 0):.4f} ({m['images_per_s']:.1f} img/s)")
            self.logger.add_scalar("E-Loss", m.get("loss_tot", 0.0), epoch)
            self.logger.add_scalar("E-Loss-cls", m.get("loss", 0.0), epoch)
            self.logger.add_scalar(
                "E-Loss-reg",
                sum(m.get(k, 0.0) for k in ("lkd", "lde", "l_icarl", "l_reg")),
                epoch)
            self.logger.add_scalar("Train-imgs-per-s", m["images_per_s"],
                                   epoch)

            if (epoch + 1) % cfg.val_interval == 0:
                val_losses, val_score = self.validate()
                self.logger.info(results_to_str(val_score))
                score = val_score["Mean IoU"]
                if (epoch + 1) % cfg.ckpt_interval == 0:
                    self.save(epoch, score)
                # scalar/table tags mirror reference run.py:328-339
                self.logger.add_scalar("V-Loss", val_losses.get("loss", 0.0),
                                       epoch)
                self.logger.add_scalar("V-Loss-cls",
                                       val_losses.get("loss", 0.0), epoch)
                self.logger.add_scalar(
                    "V-Loss-reg",
                    sum(val_losses.get(k, 0.0) for k in ("lkd", "lde")),
                    epoch)
                self.logger.add_scalar("Val_Overall_Acc",
                                       val_score["Overall Acc"], epoch)
                self.logger.add_scalar("Val_MeanIoU", score, epoch)
                self.logger.add_table("Val_Class_IoU", val_score["Class IoU"],
                                      epoch)
                self.logger.add_table("Val_Acc_IoU", val_score["Class Acc"],
                                      epoch)
                # validation sample images: (input | GT | prediction) panels
                # (reference run.py:343-349)
                for k, (img, tgt, pred) in enumerate(self.last_val_samples):
                    panel = compose_sample_png(np.asarray(img),
                                               np.asarray(tgt), pred,
                                               cfg.dataset)
                    self.logger.add_image(f"Sample_{k}",
                                          panel.transpose(2, 0, 1), epoch)
                results["V-IoU"] = val_score["Class IoU"]
                results["V-Acc"] = val_score["Class Acc"]
                self.best_score = max(self.best_score, score)
            self.cur_epoch += 1

        if not cfg.test_only:
            self.save(self.cur_epoch - 1, self.best_score)
        return results

    def visualize(self, out_dir: str, max_images: int = 16) -> int:
        """Dump per-image (input | GT | prediction) colormap panels and
        body-attention maps (reference test.py:226-238 + Trainer.test
        attention, train.py:339-343 — with the undefined-variable crash at
        train.py:346 fixed by construction). Returns #images written."""
        from ..utils.viz import attention_map, compose_sample_png
        try:
            from PIL import Image
        except ImportError:  # pragma: no cover
            return 0
        if jax.process_index() != 0:
            # host-side PNG dumps: every process would write identical files
            return 0
        os.makedirs(out_dir, exist_ok=True)
        cfg = self.cfg
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        from ..ops import fused_eval as FE

        def _fwd(v, x):
            logits, feats = self.model.apply(v, x, train=False)
            if getattr(cfg, "fused_loss", True) and FE.supported(
                    feats["sem"].shape, x.shape[1:3]):
                return FE.fused_argmax(feats["sem"], x.shape[1:3]), feats
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), feats

        fwd = jax.jit(_fwd)
        n = 0
        loader = DataLoader(self.test_dst, cfg.batch_size, shuffle=False,
                            drop_last=False, seed=cfg.random_seed)
        for batch in loader.epoch(0):
            preds, feats = fwd(variables, jnp.asarray(batch["image"]))
            preds = np.asarray(preds)
            att = attention_map(np.asarray(feats["body"]),
                                batch["image"].shape[1:3])
            for j in range(preds.shape[0]):
                panel = compose_sample_png(batch["image"][j],
                                           batch["label"][j], preds[j],
                                           cfg.dataset)
                Image.fromarray(panel).save(
                    os.path.join(out_dir, f"{n:04d}_panel.png"))
                a = (att[j] / max(float(att[j].max()), 1e-12) * 255)
                Image.fromarray(a.astype(np.uint8)).save(
                    os.path.join(out_dir, f"{n:04d}_attention.png"))
                # reference test.py:232-238 per-image file layout: raw-id
                # pred/GT + colorized pred/GT + denormalized RGB input
                from ..utils.viz import Label2Color, color_map
                from ..data.transforms import Denormalize
                l2c = Label2Color(color_map(cfg.dataset))
                tgt = np.asarray(batch["label"][j])
                pre = f"{n:04d}"
                Image.fromarray(preds[j].astype(np.uint8)).save(
                    os.path.join(out_dir, pre + "pre.png"))
                Image.fromarray(np.clip(tgt, 0, 255).astype(np.uint8)).save(
                    os.path.join(out_dir, pre + "gt.jpg"))
                Image.fromarray(l2c(preds[j]).astype(np.uint8)).save(
                    os.path.join(out_dir, pre + "pre_clo.png"))
                Image.fromarray(l2c(tgt).astype(np.uint8)).save(
                    os.path.join(out_dir, pre + "gt_clo.jpg"))
                img_j = np.asarray(batch["image"][j])
                rgb = (img_j if img_j.dtype == np.uint8
                       else (Denormalize()(img_j) * 255).astype(np.uint8))
                Image.fromarray(rgb).save(
                    os.path.join(out_dir, pre + "rgb.jpg"))
                n += 1
                if n >= max_images:
                    return n
        return n

    def close(self):
        """Release loader worker pools. A dropped Experiment's pools are
        also reclaimed by GC (DataLoader ties the pool to its own lifetime),
        so this is for deterministic teardown in long-lived processes."""
        self.train_loader.close()
        self.val_loader.close()

    def predict_test(self) -> dict:
        """TTA eval through engine.predictor.Predictor: multi-scale / flipped
        views fused by cfg.fusion_mode. Gives the reference's --fusion-mode
        flag (argparser.py:134, threaded into the model but unused by any
        entry point there) a working CLI path."""
        from .metrics import confusion_matrix_update
        from .predictor import Predictor
        cfg = self.cfg
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        predictor = Predictor(self.model, variables,
                              fusion_mode=cfg.fusion_mode,
                              flip=cfg.test_flip, scales=cfg.test_scales,
                              fused=getattr(cfg, "fused_loss", True))
        hist = empty_confusion(cfg.tot_classes)
        loader = DataLoader(self.test_dst,
                            cfg.batch_size if cfg.crop_val else 1,
                            shuffle=False, drop_last=False,
                            seed=cfg.random_seed)
        n = 0
        for batch in loader.epoch(0):
            preds = predictor.predict_labels(jnp.asarray(batch["image"]))
            hist = confusion_matrix_update(
                hist, jnp.asarray(batch["label"]), preds, cfg.tot_classes)
            n += batch["label"].shape[0]
        score = results_from_confusion(np.asarray(hist), total_samples=n)
        self.logger.info(results_to_str(score))
        return score

    def final_test(self, base_val=None) -> dict:
        """Test on all seen classes (reference run.py:361-396)."""
        cfg = self.cfg
        test_loader = DataLoader(self.test_dst,
                                 self.local_batch if cfg.crop_val else 1,
                                 shuffle=False, drop_last=False,
                                 seed=cfg.random_seed,
                                 process_index=jax.process_index(),
                                 process_count=jax.process_count())
        losses, score = self.validate(test_loader)
        self.logger.info(results_to_str(score))
        if cfg.visualize:
            # confusion-matrix PNG (reference stream_metrics.py:124-137)
            from .metrics import confusion_matrix_figure
            out = f"{cfg.logdir}/{cfg.task_name}/{cfg.name}"
            os.makedirs(out, exist_ok=True)
            confusion_matrix_figure(
                self.last_confusion,
                save_path=f"{out}/confusion_matrix_step{cfg.step}.png")
        self.logger.add_scalar("T_Overall_Acc", score["Overall Acc"],
                               cfg.step)
        self.logger.add_scalar("T_MeanIoU", score["Mean IoU"], cfg.step)
        self.logger.add_scalar("T_MeanAcc", score["Mean Acc"], cfg.step)
        self.logger.add_table("Test_Class_IoU", score["Class IoU"])
        return score
