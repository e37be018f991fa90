"""Training runtime — counterpart of ``tools/train_utils/train_utils.py``.

``train_one_epoch`` (reference :11-96): per-iter scheduled LR (stepped by
global iteration), forward+backward, grad-clip, step, timing meters.
Here the whole iteration is ONE jitted function (forward, loss, grad,
all-reduce, optimizer update, BN stat update) laid out over the data mesh.

``train_model`` (reference :99-146): epoch loop, per-epoch sampler seed,
rolling checkpoint retention.
"""

import glob
import os
import pickle
import time
from typing import Any, Dict

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import batch_sharding, make_data_mesh, replicate, shard_batch


def select_device_batch(batch, model=None):
    """Keys that go to the device, by model family: voxel models consume
    the voxel triplet (ragged padded 'points' would retrigger compilation
    every step), point models the fixed-budget points.  Detectors that
    need a custom set (e.g. PV-RCNN: voxels AND static-budget points)
    declare ``DEVICE_BATCH_KEYS``."""
    keys = getattr(model, "DEVICE_BATCH_KEYS", None)
    if keys is None:
        if "voxels" in batch:
            keys = ("voxels", "voxel_coords", "voxel_num_points", "gt_boxes")
        else:
            keys = ("points", "gt_boxes")
    return {k: batch[k] for k in keys if k in batch}


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, variables, tx):
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, tx, model_cfg=None, num_class=None):
    """One fully-fused training iteration (jit once, run every step).

    Detector-agnostic: every detector exposes ``forward_batch(batch)`` /
    ``loss_batch(out, batch)`` over a dict of dense arrays, so the same
    step trains IASSD (points) and PointPillar (voxels) alike.
    ``model_cfg``/``num_class`` are accepted for backward compatibility
    and unused.
    """

    def train_step(state: TrainState, batch):
        # per-step deterministic RNGs for stochastic train-time modules
        # (two-stage proposal sampling, dropout); unused collections are
        # harmless for detectors without them
        base = jax.random.fold_in(jax.random.PRNGKey(0x5EED), state.step)
        rngs = {
            "proposal": jax.random.fold_in(base, 1),
            "dropout": jax.random.fold_in(base, 2),
        }

        def loss_fn(params):
            def fwd_loss(mdl, b):
                out = mdl.forward_batch(b, train=True)
                return mdl.loss_batch(out, b)

            (loss, tb), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                mutable=["batch_stats"],
                method=fwd_loss,
                rngs=rngs,
            )
            return loss, (tb, mut["batch_stats"])

        (loss, (tb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss, tb

    return train_step


def jit_train_step(train_step, mesh, donate=True):
    """jit over the data mesh: state replicated, batch axis sharded.

    ``donate`` reuses the input state's buffers for the output (halves
    peak param/opt memory); pass False when the caller must keep the
    input state alive (e.g. comparing runs from one starting point).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),  # `data` broadcasts over the batch pytree
        out_shardings=(repl, repl, repl),
        donate_argnums=(0,) if donate else (),
    )


# ---------------------------------------------------------------------------
# Checkpointing (reference train_utils.py:148-182): rolling retention,
# optimizer state included; stored as a pickled numpy pytree.
#
# Hardening beyond the reference (whose torch.save can also be killed
# mid-write): atomic publish (tmp + fsync + os.replace, so a crash never
# corrupts the NEWEST checkpoint auto-resume would pick), a format-version
# field, and a CRC-32 over the payload so silent truncation/bit-rot is
# detected at load instead of materializing as garbage weights.  v1 files
# (bare pickled dict) remain readable.
# ---------------------------------------------------------------------------

CKPT_FORMAT_VERSION = 2


class CheckpointError(RuntimeError):
    """A checkpoint file is unreadable, truncated, or fails its checksum."""


def checkpoint_state(state: TrainState, epoch: int, it: int):
    to_np = lambda t: jax.tree.map(np.asarray, t)
    return {
        "epoch": epoch,
        "it": it,
        "model_state": {
            "params": to_np(state.params),
            "batch_stats": to_np(state.batch_stats),
        },
        "optimizer_state": to_np(state.opt_state),
        "version": "pdanet_tpu+r1",
    }


def save_checkpoint(ckpt, filename="checkpoint"):
    import zlib

    filename = "{}.pkl".format(filename)
    payload = pickle.dumps(ckpt, protocol=pickle.HIGHEST_PROTOCOL)
    wrapper = {
        "__pdanet_ckpt_format__": CKPT_FORMAT_VERSION,
        "crc32": zlib.crc32(payload),
        "payload": payload,
    }
    tmp = "{}.tmp.{}".format(filename, os.getpid())
    try:
        with open(tmp, "wb") as f:
            pickle.dump(wrapper, f, protocol=pickle.HIGHEST_PROTOCOL)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, filename)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return filename


def load_checkpoint(filename):
    import zlib

    try:
        with open(filename, "rb") as f:
            obj = pickle.load(f)
    except (pickle.UnpicklingError, EOFError, AttributeError, MemoryError,
            ValueError, OSError) as e:
        raise CheckpointError(f"unreadable checkpoint {filename}: {e}") from e
    if isinstance(obj, dict) and "__pdanet_ckpt_format__" in obj:
        try:
            payload = obj["payload"]
            crc = obj["crc32"]
        except KeyError as e:
            raise CheckpointError(
                f"v2 checkpoint {filename} missing field {e}"
            ) from e
        if zlib.crc32(payload) != crc:
            raise CheckpointError(
                f"checksum mismatch in {filename} "
                f"(format v{obj['__pdanet_ckpt_format__']})"
            )
        try:
            return pickle.loads(payload)
        except (pickle.UnpicklingError, EOFError, AttributeError,
                MemoryError, ValueError) as e:
            raise CheckpointError(
                f"corrupt payload in {filename}: {e}"
            ) from e
    return obj  # v1: bare pickled dict


def load_newest_checkpoint(ckpt_files, logger=None):
    """Load the newest readable checkpoint from ``ckpt_files`` (oldest →
    newest order).  A corrupt newest file (crashed mid-write on a non-atomic
    FS, truncated by disk-full, bit-rot) logs a warning and falls back to the
    previous one.  Returns ``(ckpt, path)`` or ``(None, None)``."""
    for path in reversed(list(ckpt_files)):
        try:
            return load_checkpoint(path), path
        except CheckpointError as e:
            if logger is not None:
                logger.warning(
                    "skipping corrupt checkpoint %s (%s); falling back", path, e
                )
    return None, None


def restore_train_state(ckpt, state: TrainState, tx=None, with_optimizer=True):
    params = jax.tree.map(jnp.asarray, ckpt["model_state"]["params"])
    batch_stats = jax.tree.map(jnp.asarray, ckpt["model_state"]["batch_stats"])
    opt_state = state.opt_state
    if with_optimizer and ckpt.get("optimizer_state") is not None:
        opt_state = jax.tree.map(
            lambda ref, saved: jnp.asarray(saved),
            state.opt_state,
            ckpt["optimizer_state"],
        )
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.asarray(ckpt["it"], jnp.int32),
    )


def train_model(
    model,
    state,
    tx,
    train_loader,
    model_cfg,
    optim_cfg,
    num_class,
    start_epoch,
    total_epochs,
    ckpt_save_dir,
    lr_fn=None,
    ckpt_save_interval=1,
    max_ckpt_save_num=8,
    logger=None,
    mesh=None,
    tb_log=None,
):
    """Epoch loop (reference train_utils.py:99-146)."""
    mesh = mesh if mesh is not None else make_data_mesh()
    train_step = jit_train_step(
        make_train_step(model, tx, model_cfg, num_class), mesh
    )
    state = replicate(mesh, state)
    accumulated_iter = int(state.step)

    for cur_epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(cur_epoch)
        end = time.time()
        for batch in train_loader:
            data_time = time.time() - end
            dev_batch = shard_batch(mesh, select_device_batch(batch, model))
            state, loss, tb = train_step(state, dev_batch)
            # do NOT materialize loss every step — float(loss) blocks the
            # host on the device and serializes input prep with compute;
            # convert only on logging iterations
            accumulated_iter += 1
            batch_time = time.time() - end
            end = time.time()
            log_iter = accumulated_iter % 50 == 0
            if logger is not None and log_iter:
                cur_lr = float(lr_fn(accumulated_iter)) if lr_fn else float("nan")
                logger.info(
                    "epoch %d iter %d loss %.4f lr %.6f data %.3fs iter %.3fs"
                    % (cur_epoch, accumulated_iter, float(loss), cur_lr,
                       data_time, batch_time)
                )
            if tb_log is not None and (log_iter or tb_log.every_iter):
                tb_log.add_scalar("train/loss", float(loss), accumulated_iter)
                for k, v in tb.items():
                    tb_log.add_scalar(f"train/{k}", float(v), accumulated_iter)

        trained_epoch = cur_epoch + 1
        # rank-0-only checkpoint I/O (reference train_utils.py:141-145);
        # params are replicated so rank 0's copy is the global state
        if trained_epoch % ckpt_save_interval == 0 and jax.process_index() == 0:
            ckpt_list = sorted(
                glob.glob(str(ckpt_save_dir / "checkpoint_epoch_*.pkl")),
                key=os.path.getmtime,
            )
            if len(ckpt_list) >= max_ckpt_save_num:
                for cur_file_idx in range(
                    0, len(ckpt_list) - max_ckpt_save_num + 1
                ):
                    os.remove(ckpt_list[cur_file_idx])
            ckpt_name = ckpt_save_dir / ("checkpoint_epoch_%d" % trained_epoch)
            save_checkpoint(
                checkpoint_state(state, trained_epoch, accumulated_iter),
                filename=str(ckpt_name),
            )
            if logger is not None:
                logger.info("checkpoint saved: %s" % ckpt_name)
    return state, accumulated_iter
