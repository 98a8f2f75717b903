"""Subprocess worker for the 2-process (multi-host analog) integration test.

Each worker process: jax.distributed.initialize over a localhost
coordinator -> run ONE epoch of a real Experiment (loaders shard by
process, _put_batch assembles global arrays from per-process shards, the
train step reduces via SPMD collectives) -> write its epoch metrics.

Mirrors the reference's one-process-per-GPU NCCL launch
(/root/reference/run.py:117-124) on the gloo-backed CPU client.

Usage: python mp_worker.py <process_id> <num_processes> <port> <outdir>
"""

import json
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    from ucd_tpu.parallel.distributed import maybe_initialize
    if nproc > 1:
        assert maybe_initialize(coordinator=f"localhost:{port}",
                                num_processes=nproc, process_id=pid)
    import jax

    from ucd_tpu import config
    from ucd_tpu.data import SyntheticSegmentation
    from ucd_tpu.engine.experiment import Experiment

    assert jax.process_count() == nproc
    cfg = config.make_config(
        dataset="voc", task="19-1", step=0, method="FT",
        backbone="resnet50", crop_size=32, batch_size=8, epochs=1,
        dtype="float32", pretrained=False, val_interval=999,
        sample_num=2,  # exercises the multi-process sample-logging guard
        num_workers=1, logdir=os.path.join(outdir, f"logs{pid}"),
        # SHARED ckpt dir: every process enters the orbax save (its internal
        # barriers deadlock on a rank-0-only call); process 0 writes
        ckpt_dir=os.path.join(outdir, "ckpt_shared"))
    # train set size == global batch: every process sees the same single
    # global batch regardless of how the index space shards, so the
    # 1-process and 2-process losses must match exactly
    bt = SyntheticSegmentation(n=cfg.batch_size, size=cfg.crop_size,
                               n_classes=cfg.tot_classes, seed=0)
    bv = SyntheticSegmentation(n=4, size=cfg.crop_size,
                               n_classes=cfg.tot_classes, seed=1)
    # indivisible global batches trim the mesh equally per host instead of
    # crashing at the first jit sharding (make_mesh_multiprocess)
    from ucd_tpu.parallel import make_mesh_multiprocess
    trimmed = make_mesh_multiprocess(6)
    assert 6 % trimmed.devices.size == 0, trimmed.devices.size

    exp = Experiment(cfg, base_train=bt, base_val=bv)
    assert len(exp.train_loader) == 1, len(exp.train_loader)
    m = exp.train_epoch(0)
    _, res = exp.validate()
    # all-process checkpoint save on the shared dir, then restore
    exp.save(0, res["Mean IoU"])
    from ucd_tpu.engine import checkpoint as ckpt_lib
    ck = ckpt_lib.load_checkpoint(cfg.ckpt_path())
    ckpt_ok = ck is not None and "model_state" in ck
    # full-size eval is refused up front in multi-process runs (conflicting
    # per-host global shapes) instead of hanging in divergent SPMD programs
    guard_ok = True
    if nproc > 1:
        import dataclasses
        try:
            Experiment(dataclasses.replace(cfg, crop_val=False,
                                           name="guard"),
                       base_train=bt, base_val=bv)
            guard_ok = False
        except ValueError:
            guard_ok = True

    out = {"process_id": pid, "process_count": jax.process_count(),
           "crop_val_guard": guard_ok,
           "n_devices": len(jax.devices()),
           "loss_tot": m["loss_tot"], "loss": m["loss"],
           "val_miou": res["Mean IoU"], "ckpt_ok": ckpt_ok,
           "val_total_samples": res.get("Total samples", 0),
           "cls0_sum": float(jax.numpy.sum(
               jax.numpy.abs(exp.state.params["cls_0"]["kernel"])))}
    with open(os.path.join(outdir, f"p{pid}.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
