"""Host-side common utilities (numpy) — counterpart of
``pcdet/utils/common_utils.py`` minus the torch/NCCL machinery (JAX
collectives replace it; see pdanet_tpu.parallel)."""

import logging
import os
import pickle
import random
import shutil

import numpy as np


def check_numpy_to_float(x):
    return float(x) if isinstance(x, np.generic) else x


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap angle into [-offset*period, (1-offset)*period)
    (common_utils.py:73-80)."""
    return val - np.floor(val / period + offset) * period


def rotate_points_along_z_np(points, angle):
    """numpy twin of ops.geometry.rotate_points_along_z.

    Args:
        points: (B, N, 3 + C); angle: (B,) radians.
    """
    cosa = np.cos(angle)
    sina = np.sin(angle)
    zeros = np.zeros_like(angle)
    ones = np.ones_like(angle)
    rot = np.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    xyz = np.matmul(points[:, :, 0:3], rot)
    return np.concatenate([xyz, points[:, :, 3:]], axis=-1)


def drop_info_with_name(info, name):
    """Filter annotation rows whose name == ``name`` (common_utils.py:59-66)."""
    ret = {}
    keep = [i for i, x in enumerate(info["name"]) if x != name]
    for key in info.keys():
        if key == "gt_boxes_lidar" or isinstance(info[key], np.ndarray):
            ret[key] = info[key][keep] if len(info[key]) == len(info["name"]) else info[key]
        else:
            ret[key] = info[key]
    return ret


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    """Rank-0 console+file logger (common_utils.py:85-99)."""
    logger = logging.getLogger(__name__ + str(random.random()))
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.ERROR)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def init_dist_jax(tcp_port=18888, logger=None):
    """Initialize the JAX distributed runtime — counterpart of
    ``init_dist_pytorch`` / ``init_dist_slurm``
    (reference common_utils.py:134-176, NCCL there; ICI/DCN collectives
    here, no backend beyond ``jax.distributed.initialize``).

    Rendezvous, in order of precedence:

    1. **torchrun-style env** (what ``tools/scripts/dist_{train,test}.sh``
       documents): ``WORLD_SIZE`` / ``RANK`` / ``MASTER_ADDR``
       [/ ``MASTER_PORT``].  ``MASTER_ADDR`` may carry its own ``:port``.
    2. **runtime auto-detect** — TPU pods / Slurm / Open MPI, where the
       cluster plugin supplies coordinator + ranks.

    On the CPU backend, cross-process collectives need the Gloo
    implementation selected BEFORE the backend initializes; harmless on
    TPU (flag only affects CPU client creation).

    Returns (process_index, process_count).
    """
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    world = int(os.environ.get("WORLD_SIZE", "0") or 0)
    if world > 1:
        addr = os.environ.get("MASTER_ADDR", "127.0.0.1")
        if ":" not in addr:
            addr = f"{addr}:{os.environ.get('MASTER_PORT', tcp_port)}"
        # A forgotten RANK must be a loud error, not a silent rank-0
        # default: every process claiming process_id=0 makes the
        # rendezvous hang until timeout with no diagnostic.
        rank_s = os.environ.get("RANK")
        if rank_s is None:
            raise RuntimeError(
                "WORLD_SIZE=%d is set but RANK is not; torchrun-style "
                "launches must export RANK in [0, WORLD_SIZE) per process "
                "(see tools/scripts/dist_train.sh)" % world)
        rank = int(rank_s)
        if not 0 <= rank < world:
            raise RuntimeError(
                "RANK=%d out of range for WORLD_SIZE=%d" % (rank, world))
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=world,
            process_id=rank,
        )
        if jax.default_backend() == "cpu":
            # Establish the Gloo communicator NOW, while all ranks are in
            # lockstep: its key-value rendezvous has a ~30 s timeout, and
            # the first *real* collective sits behind a multi-minute XLA
            # compile whose duration races across ranks (shared on-disk
            # compile cache makes one rank compile and the other hit).
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("init_dist_jax")
    else:
        try:  # cluster auto-detect (TPU pod / Slurm / OMPI)
            jax.distributed.initialize()
        except Exception as e:  # single process: a launcher flag alone
            if logger is not None:  # is not an error (reference parity:
                logger.warning(  # dist_train.sh on one host, no env)
                    "launcher requested but no rendezvous found (%s); "
                    "running single-process", e)
    return jax.process_index(), jax.process_count()


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def interleave_parts(part_list, size):
    """Restore dataset order from stride-sharded per-rank result lists
    (rank r holds samples r, r+world, r+2*world, ...) — the inverse of
    SimpleLoader's pad+stride shard and of the reference's eval
    DistributedSampler (datasets/__init__.py:24-44).  Trailing pad
    duplicates are dropped by the ``size`` cut."""
    ordered = []
    for res in zip(*part_list):
        ordered.extend(list(res))
    return ordered[:size]


def merge_results_dist(result_part, size, tmpdir, rank=None, world=None,
                       barrier=None):
    """Multi-process eval merge via pickle files on a shared FS
    (common_utils.py:201-222).  Kept host-side for robustness (prediction
    dicts are ragged python objects; a device all-gather would need
    padding contracts).  ``rank``/``world``/``barrier`` default to the JAX
    runtime and exist so tests can simulate a multi-process merge."""
    if rank is None or world is None:
        import jax

        rank = jax.process_index()
        world = jax.process_count()
    if barrier is None:
        def barrier():
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("merge_results")

    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, f"result_part_{rank}.pkl"), "wb") as f:
        pickle.dump(result_part, f)
    if world > 1:
        barrier()
    if rank != 0:
        return None
    part_list = []
    for i in range(world):
        with open(os.path.join(tmpdir, f"result_part_{i}.pkl"), "rb") as f:
            part_list.append(pickle.load(f))
    ordered = interleave_parts(part_list, size)
    shutil.rmtree(tmpdir)
    return ordered
