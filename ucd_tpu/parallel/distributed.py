"""Multi-process (multi-host) execution setup.

The reference is genuinely multi-process — one process per GPU, NCCL
rendezvous at /root/reference/run.py:117-124, cross-rank loss/metric reduce
(train.py:174, metrics/stream_metrics.py:112-122). The TPU-native equivalent
has three parts, of which only the first needs explicit code:

  1. process rendezvous: `jax.distributed.initialize()` (this module) —
     after it, `jax.devices()` spans every host and `jax.process_index()`
     replaces `rank`;
  2. global batches: each process loads its own shard (DataLoader already
     takes process_index/process_count) and the Experiment assembles the
     global array with `jax.make_array_from_process_local_data`;
  3. collectives: gradient averaging, sync-BN statistics and the confusion
     matrix reduce inside the jitted step via the SPMD partitioner — the
     same compiled program serves 1 host or N hosts, so unlike the
     reference there is no rank-0 special casing anywhere.

Launch (mirrors torch.distributed.launch, one process per host):

    UCD_TPU_COORDINATOR=host0:12345 UCD_TPU_NUM_PROCESSES=2 \
    UCD_TPU_PROCESS_ID=$i  python -m ucd_tpu.cli train ...

or pass --coordinator/--num_processes/--process_id. On Cloud TPU pods,
`UCD_TPU_DISTRIBUTED=1` (or --distributed) lets JAX auto-detect everything
from the TPU metadata service.

Multi-process checkpointing assumes --ckpt_dir is on SHARED storage (every
host calls the orbax save — its internal barriers require that — and
process 0 writes the data).
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     auto: bool = False) -> bool:
    """Call jax.distributed.initialize from explicit args or the
    UCD_TPU_COORDINATOR / UCD_TPU_NUM_PROCESSES / UCD_TPU_PROCESS_ID env
    triple. Returns True if a multi-process runtime was initialized.

    Must run before the first use of jax.devices(); a no-op when no
    multi-process configuration is present (single-host runs stay exactly
    as before) or when already initialized.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator = coordinator or os.environ.get("UCD_TPU_COORDINATOR")
    if num_processes is None:
        n = os.environ.get("UCD_TPU_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("UCD_TPU_PROCESS_ID")
        process_id = int(p) if p else None
    auto = auto or os.environ.get("UCD_TPU_DISTRIBUTED") == "1"

    import jax
    if coordinator is not None and num_processes and num_processes > 1:
        if process_id is None:
            # jax.distributed.initialize(process_id=None) only works where
            # the environment is auto-detectable (TPU pods, SLURM); on plain
            # hosts it fails with an unrelated-looking error. Name the
            # missing piece instead.
            raise ValueError(
                "multi-process launch needs a process id: pass --process_id "
                "(or set UCD_TPU_PROCESS_ID) alongside --coordinator/"
                "--num_processes, or use --distributed for auto-detection "
                "on TPU pods")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _INITIALIZED = True
        return True
    if auto:
        # TPU-pod auto-detection (coordinator/count/id from the metadata
        # service); single-process environments raise — surface that.
        jax.distributed.initialize()
        _INITIALIZED = True
        return True
    return False


def local_batch_size(global_batch: int) -> int:
    """Per-process share of the global batch (the reference's per-GPU batch,
    README.md:52: total 24 = 12 x 2 ranks)."""
    import jax
    pc = jax.process_count()
    assert global_batch % pc == 0, (
        f"global batch {global_batch} must divide evenly over "
        f"{pc} processes")
    return global_batch // pc
