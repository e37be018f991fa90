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


def shard_batch(mesh, tree):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
