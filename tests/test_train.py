"""Training-runtime tests: one-cycle schedule parity vs the reference
formula, a few DP training steps on the 8-device virtual mesh (SURVEY.md
§4d), and overfit-smoke (loss decreases)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from model_cfg import tiny_model_cfg

from pdanet_tpu.models import build_network
from pdanet_tpu.parallel import make_data_mesh, replicate, shard_batch
from pdanet_tpu.train import (
    build_optimizer_and_schedule,
    create_train_state,
    jit_train_step,
    make_train_step,
)
from pdanet_tpu.utils.easydict import EasyDict


def _optim_cfg():
    return EasyDict(
        {
            "OPTIMIZER": "adam_onecycle",
            "LR": 0.01,
            "WEIGHT_DECAY": 0.01,
            "MOMENTUM": 0.9,
            "MOMS": [0.95, 0.85],
            "PCT_START": 0.4,
            "DIV_FACTOR": 10,
            "DECAY_STEP_LIST": [35, 45],
            "LR_DECAY": 0.1,
            "LR_CLIP": 0.0000001,
            "LR_WARMUP": False,
            "WARMUP_EPOCH": 1,
            "GRAD_NORM_CLIP": 10,
        }
    )


def _reference_onecycle(total_steps, lr_max, moms, div, pct_start):
    """The reference OneCycle formula (learning_schedules_fastai.py:53-77)
    re-derived in numpy as an oracle."""

    def annealing_cos(start, end, p):
        return end + (start - end) / 2.0 * (np.cos(np.pi * p) + 1)

    a1 = int(total_steps * pct_start)
    low = lr_max / div

    def lr(step):
        if step < a1:
            return annealing_cos(low, lr_max, step / a1)
        return annealing_cos(lr_max, low / 1e4, (step - a1) / (total_steps - a1))

    def mom(step):
        if step < a1:
            return annealing_cos(moms[0], moms[1], step / a1)
        return annealing_cos(moms[1], moms[0], (step - a1) / (total_steps - a1))

    return lr, mom


def test_one_cycle_schedule_matches_reference():
    from pdanet_tpu.train.optimization import one_cycle_schedules

    total = 200
    lr_fn, mom_fn = one_cycle_schedules(total, 0.01, [0.95, 0.85], 10, 0.4)
    ref_lr, ref_mom = _reference_onecycle(total, 0.01, [0.95, 0.85], 10, 0.4)
    for step in [0, 1, 40, 79, 80, 81, 150, 199]:
        # f32 on-device cos vs f64 numpy oracle: tail LRs are ~1e-6
        np.testing.assert_allclose(
            float(lr_fn(step)), ref_lr(step), rtol=1e-4, atol=1e-9
        )
        np.testing.assert_allclose(
            float(mom_fn(step)), ref_mom(step), rtol=1e-4, atol=1e-9
        )


@pytest.fixture(scope="module")
def train_setup():
    cfg = tiny_model_cfg()
    model = build_network(cfg, num_class=3, input_channels=4)
    rng = jax.random.PRNGKey(0)
    B = 8  # one frame per virtual device
    pts = jax.random.normal(rng, (B, 128, 4)) * 5
    gt = jnp.zeros((B, 3, 8))
    gt = gt.at[:, 0].set(jnp.array([2.0, 1.0, 0.0, 3.9, 1.6, 1.56, 0.3, 1.0]))
    gt = gt.at[:, 1].set(jnp.array([-3.0, 2.0, 0.2, 0.8, 0.6, 1.73, -0.5, 2.0]))
    variables = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        rng, pts
    )
    tx, lr_fn = build_optimizer_and_schedule(_optim_cfg(), 10, 4)
    state = create_train_state(model, variables, tx)
    return cfg, model, tx, state, pts, gt


def _fresh(state):
    """Deep-copy a TrainState: train steps donate their input state, so
    tests sharing the module fixture must not step the original buffers."""
    import jax.numpy as jnp
    return jax.tree.map(jnp.array, state)


def test_dp_training_steps_on_virtual_mesh(train_setup):
    """Full DP train step over 8 virtual devices: state replicated, batch
    sharded, grads all-reduced by GSPMD; loss decreases on a fixed batch."""
    cfg, model, tx, state, pts, gt = train_setup
    state = _fresh(state)
    assert len(jax.devices()) == 8
    mesh = make_data_mesh()
    step = jit_train_step(make_train_step(model, tx, cfg, 3), mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, {"points": pts, "gt_boxes": gt})

    losses = []
    for _ in range(6):
        state, loss, tb = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    # overfit smoke: the fixed batch must get easier
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_single_vs_multi_device_equivalence(train_setup):
    """One DP step on the 8-device mesh == the same step on 1 device
    (GSPMD all-reduce must be mathematically a no-op re-layout)."""
    cfg, model, tx, state, pts, gt = train_setup
    state = _fresh(state)
    mesh8 = make_data_mesh()
    mesh1 = make_data_mesh(jax.devices()[:1])

    out = []
    for mesh in (mesh8, mesh1):
        # donate=False: both runs must start from the same live state
        step = jit_train_step(make_train_step(model, tx, cfg, 3), mesh,
                              donate=False)
        s = replicate(mesh, state)
        b = shard_batch(mesh, {"points": pts, "gt_boxes": gt})
        s2, loss, _ = step(s, b)
        out.append((float(loss), np.asarray(jax.tree.leaves(s2.params)[0])))
    np.testing.assert_allclose(out[0][0], out[1][0], rtol=1e-4)
    np.testing.assert_allclose(out[0][1], out[1][1], rtol=1e-3, atol=1e-6)


def test_checkpoint_roundtrip(train_setup, tmp_path):
    from pdanet_tpu.train import (
        checkpoint_state,
        load_checkpoint,
        restore_train_state,
        save_checkpoint,
    )

    cfg, model, tx, state, pts, gt = train_setup
    ck = checkpoint_state(state, epoch=3, it=123)
    fname = save_checkpoint(ck, filename=str(tmp_path / "ckpt_test"))
    loaded = load_checkpoint(fname)
    assert loaded["epoch"] == 3 and loaded["it"] == 123
    restored = restore_train_state(loaded, state, tx)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 123


def test_training_is_bitwise_deterministic(train_setup):
    """Two runs of the same 4 train steps from the same state produce
    BITWISE-identical params, losses, and BN stats.  The reference cannot
    make this claim: its CUDA backward kernels accumulate with atomicAdd
    (group_points_gpu.cu:14-31), so gradients vary run to run.  Here every
    scatter-add is a deterministic XLA reduction — cross-implementation
    trajectory chaos (see test_train_trajectory_twin) does NOT mean
    within-implementation nondeterminism."""
    cfg, model, tx, state, pts, gt = train_setup
    step = jax.jit(make_train_step(model, tx, cfg, 3))

    finals = []
    for _ in range(2):
        s = _fresh(state)
        losses = []
        for it in range(4):
            s, loss, _ = step(s, {"points": pts + it * 1e-3, "gt_boxes": gt})
            losses.append(np.asarray(loss).copy())
        finals.append((losses, jax.tree.map(np.asarray, s.params),
                       jax.tree.map(np.asarray, s.batch_stats)))

    (l1, p1, b1), (l2, p2, b2) = finals
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_corrupt_fallback(train_setup, tmp_path):
    """Crash injection (VERDICT r2 next#7): truncate the newest checkpoint
    mid-'write'; auto-resume must detect it (CRC / unpickle failure) and fall
    back to the previous epoch's file instead of loading garbage."""
    from pdanet_tpu.train import (
        CheckpointError,
        checkpoint_state,
        load_checkpoint,
        load_newest_checkpoint,
        save_checkpoint,
    )

    cfg, model, tx, state, pts, gt = train_setup
    good = save_checkpoint(
        checkpoint_state(state, epoch=1, it=10),
        filename=str(tmp_path / "checkpoint_epoch_1"),
    )
    bad = save_checkpoint(
        checkpoint_state(state, epoch=2, it=20),
        filename=str(tmp_path / "checkpoint_epoch_2"),
    )
    # simulate a crash mid-write / disk-full truncation of the NEWEST file
    data = open(bad, "rb").read()
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 2])

    with pytest.raises(CheckpointError):
        load_checkpoint(bad)
    ck, path = load_newest_checkpoint([good, bad])
    assert path == good and ck["epoch"] == 1 and ck["it"] == 10

    # flipped-bit corruption (file length intact) must also be caught
    flipped = bytearray(data)
    flipped[len(flipped) // 2] ^= 0xFF
    with open(bad, "wb") as f:
        f.write(bytes(flipped))
    try:
        loaded = load_checkpoint(bad)
        # an unlucky flip inside pickle structure raises; a flip in tensor
        # bytes must be caught by the CRC — reaching here is a failure
        assert False, f"corrupt checkpoint loaded silently: {type(loaded)}"
    except CheckpointError:
        pass

    # v1 read-compat: a bare pickled dict (round-1/2 files) still loads
    import pickle

    v1 = tmp_path / "checkpoint_epoch_0.pkl"
    with open(v1, "wb") as f:
        pickle.dump({"epoch": 0, "it": 0}, f)
    assert load_checkpoint(str(v1))["epoch"] == 0


def test_merge_results_dist_simulated_world3(tmp_path):
    """Simulated 3-process eval merge: stride-sharded parts interleave
    back into dataset order and rank>0 returns None
    (common_utils.py:201-222 semantics)."""
    from pdanet_tpu.utils.common_utils import merge_results_dist

    size = 8  # dataset length; pad+stride: rank r holds r, r+3, ... with
    # wrap padding to equal length (the eval DistributedSampler contract,
    # reference datasets/__init__.py:24-44)
    padded = [f"s{i}" for i in range(size)] + ["s0"]  # pad to 9 = 3*3
    parts = {r: [padded[i] for i in range(r, 9, 3)] for r in range(3)}
    noop = lambda: None

    out = {}
    # ranks 1, 2 write first; rank 0 merges
    for r in (1, 2, 0):
        out[r] = merge_results_dist(
            parts[r], size, str(tmp_path / "merge"), rank=r, world=3,
            barrier=noop,
        )
    assert out[1] is None and out[2] is None
    assert out[0] == [f"s{i}" for i in range(size)]


def test_bf16_train_compute(train_setup):
    """BACKBONE_3D.TRAIN_COMPUTE_DTYPE: bf16 — the train step runs with
    bf16 matmuls (f32 BN/LN stats), params stay f32, and the loss stays
    within a few percent of the f32 step at init."""
    import copy

    cfg, model, tx, state, pts, gt = train_setup
    cfg_bf16 = copy.deepcopy(cfg)
    cfg_bf16.BACKBONE_3D.TRAIN_COMPUTE_DTYPE = "bf16"
    model16 = build_network(cfg_bf16, num_class=3, input_channels=4)
    # identical init: param shapes/dtypes must match the f32 model
    variables = jax.jit(
        lambda r, p: model16.init({"params": r}, p, train=False)
    )(jax.random.PRNGKey(0), pts)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32

    mesh = make_data_mesh(jax.devices()[:1])
    batch = shard_batch(mesh, {"points": pts, "gt_boxes": gt})

    losses = {}
    for name, mdl in (("f32", None), ("bf16", model16)):
        use = mdl if mdl is not None else build_network(
            cfg, num_class=3, input_channels=4
        )
        st = create_train_state(use, jax.tree.map(jnp.array, variables), tx)
        st = replicate(mesh, st)
        step = jit_train_step(make_train_step(use, tx), mesh)
        seq = []
        for _ in range(4):
            st, loss, tb = step(st, batch)
            seq.append(float(loss))
        losses[name] = seq
        # params remain f32 after updates
        for leaf in jax.tree.leaves(st.params):
            assert leaf.dtype == jnp.float32
    assert all(np.isfinite(v) for v in losses["bf16"])
    # same init, same batch: first-step losses agree to bf16 tolerance
    np.testing.assert_allclose(
        losses["bf16"][0], losses["f32"][0], rtol=0.05
    )
    # and it learns
    assert losses["bf16"][-1] < losses["bf16"][0]


def test_bf16_loss_trajectory(train_setup):
    """bf16-justified trajectory twin (VERDICT r4 next#1b): from one init
    on one frozen batch, the bf16 train trajectory must track f32
    step-for-step within 5% relative loss over 12 steps.

    Tolerance justification: one bf16 matmul rounds at ~2^-8 relative;
    measured drift on this recipe is <= 1.0% over 12 steps (r5,
    max-rel 0.0098 at step 8 — /tmp drift probe committed to STATUS), so
    5% gives 5x headroom for MXU accumulation-order differences while
    still catching any systematic semantics gap (a mis-cast BN stat or a
    dropped f32 force-cast moves the loss tens of percent within a few
    steps)."""
    import copy

    cfg, model, tx, state, pts, gt = train_setup
    cfg16 = copy.deepcopy(cfg)
    cfg16.BACKBONE_3D.TRAIN_COMPUTE_DTYPE = "bf16"
    model16 = build_network(cfg16, num_class=3, input_channels=4)
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False)
    )(jax.random.PRNGKey(0), pts)

    mesh = make_data_mesh(jax.devices()[:1])
    batch = shard_batch(mesh, {"points": pts, "gt_boxes": gt})
    traj = {}
    for name, mdl in (("f32", model), ("bf16", model16)):
        st = replicate(mesh, create_train_state(
            mdl, jax.tree.map(jnp.array, variables), tx))
        step = jit_train_step(make_train_step(mdl, tx), mesh)
        seq = []
        for _ in range(12):
            st, loss, _ = step(st, batch)
            seq.append(float(loss))
        traj[name] = seq
    rel = [abs(a - b) / abs(a) for a, b in zip(traj["f32"], traj["bf16"])]
    assert max(rel) <= 0.05, (traj, rel)
    # both learn
    assert traj["bf16"][-1] < traj["bf16"][0]
    assert traj["f32"][-1] < traj["f32"][0]
