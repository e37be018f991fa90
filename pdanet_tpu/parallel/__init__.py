"""Device-mesh / sharding utilities — the TPU-native replacement for the
reference's NCCL data parallelism (``pcdet/utils/{common_utils,commu_utils}``,
SURVEY.md §2.5 LD row).

The reference scales by pure DP (the model is ~10 M params); here that maps
to a 1-D ``data`` mesh over ICI.  Params/opt-state are replicated, batches
are sharded on the leading axis, and XLA inserts the gradient all-reduce
because the (replicated) grad sharding demands it — no hand-written
collectives.  BatchNorm consequently runs over the global batch
(= SyncBN; the reference default is per-replica BN, an intentional,
documented improvement)."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices=None):
    """1-D data-parallel mesh over all local devices (or the given list)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh):
    """Shard the leading (batch) axis across the data mesh."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _spans_processes(mesh):
    """True when the mesh includes devices this process cannot address
    (multi-host DP: one process per host, mesh over all hosts' chips)."""
    if jax.process_count() == 1:
        return False
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def shard_batch(mesh, tree):
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Multi-host: each process holds only ITS loader shard (train.py shards
    the dataset by process_index/count), so the global array is assembled
    from per-process local data — the JAX-native replacement for the
    reference's per-rank DistributedSampler + DDP input split
    (train.py:81-82 there)."""
    sharding = batch_sharding(mesh)
    if _spans_processes(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh, tree):
    """Replicate host values over the mesh (params/opt state: every
    process passes identical values, e.g. the same checkpoint)."""
    sharding = replicated(mesh)
    if _spans_processes(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
