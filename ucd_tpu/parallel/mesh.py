"""Device mesh and sharding helpers.

TPU-native replacement of the reference's distributed substrate
(torch.distributed/NCCL + apex DDP, /root/reference/run.py:117-124,204 and
SURVEY.md §2.4): a 1-D data-parallel mesh over ICI. Gradients, sync-BN batch
statistics and the eval confusion matrix all reduce through XLA collectives
inserted by the SPMD partitioner — there are no explicit allreduce calls
anywhere in the framework. Multislice scale-out (DCN) needs no code change:
data parallelism's single gradient all-reduce per step is DCN-tolerant.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_mesh_for_batch(global_batch: int, n_devices: Optional[int] = None) -> Mesh:
    """Data mesh over the largest device count that divides the global batch
    (keeps per-device batches equal; jit sharding requires divisibility)."""
    avail = n_devices if n_devices is not None else len(jax.devices())
    n = avail
    while n > 1 and global_batch % n != 0:
        n -= 1
    return make_mesh(n)


def make_mesh_multiprocess(global_batch: int) -> Mesh:
    """Multi-process data mesh: every process contributes the same number of
    local devices, trimmed (equally on every host) to the largest count whose
    global total divides the batch. A full-device mesh with an indivisible
    batch would otherwise surface as a cryptic jit sharding error at the
    first step ('dimension size 24 partitioned 16 times')."""
    pc = jax.process_count()
    by_proc: dict[int, list] = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    per_host = min(len(v) for v in by_proc.values())
    k = per_host
    while k > 1 and global_batch % (k * pc) != 0:
        k -= 1
    # k=1 always divides: local_batch_size() already requires batch % pc == 0
    devices = [d for p in sorted(by_proc) for d in by_proc[p][:k]]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


MODEL_AXIS = "model"


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """2-D (data x model) mesh. The reference implements only DP (SURVEY
    §2.4), and for this CNN DP is the right primary strategy — but a model
    axis composes on top for the wide-channel regimes (ADE's 151-class
    head, the 2048-channel ResNet trunk) to spread activation memory and
    the classifier/upsample bandwidth over ICI."""
    devices = jax.devices()[: n_data * n_model]
    assert len(devices) == n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(jax.devices())}")
    return Mesh(np.array(devices).reshape(n_data, n_model),
                (DATA_AXIS, MODEL_AXIS))


def channel_sharding(mesh: Mesh, tree, min_size: int = 256):
    """Per-leaf sharding tree: the trailing (output-channel) dim of large
    params is sharded over the model axis — the tensor-parallel analog for
    conv nets (conv kernels HWIO -> O sharded; the matching BN scale/bias/
    stats shard the same axis, so GSPMD propagates without resharding).
    Leaves that are too small or indivisible stay replicated. Works on any
    params-shaped tree (opt_state momentum shards consistently by shape)."""
    if MODEL_AXIS not in mesh.axis_names:
        return jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, P()), tree)
    n_model = mesh.shape[MODEL_AXIS]

    def leaf(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[-1] >= min_size \
                and shape[-1] % n_model == 0:
            return NamedSharding(
                mesh, P(*((None,) * (len(shape) - 1)), MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf, tree)


def shard_batch(mesh: Mesh, tree):
    """Place host arrays onto the mesh, batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
