"""On-chip fused train-step timing at full KITTI shapes (b2, 16384 pts).

Runs K train steps inside one jitted lax.scan (state carried, same batch
re-used) to amortize the relay's ~35 ms per-dispatch RPC — matching how
the tracked 43.3 ms/step figure was read.  Compares the attention
implementations: flax einsum (current train-path default) vs the fused
Pallas kernel + VJP (PDANET_ATTENTION_IMPL=pallas forces it for train).

Usage: python tools/probes/train_step_probe.py [flax|pallas] [f32|bf16]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

K_STEPS = 20


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "flax"
    mode = sys.argv[2] if len(sys.argv) > 2 else "f32"
    if impl != "auto":  # auto = the shipped dispatch policy
        os.environ["PDANET_ATTENTION_IMPL"] = impl

    from __graft_entry__ import _load_cfg
    from pdanet_tpu.models import build_network
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        make_train_step,
    )

    cfg = _load_cfg()
    # the shipped yaml defaults TRAIN_COMPUTE_DTYPE: bf16 (r5) — honor
    # the requested mode explicitly either way
    if mode == "bf16":
        cfg.MODEL.BACKBONE_3D.TRAIN_COMPUTE_DTYPE = "bf16"
    else:
        cfg.MODEL.BACKBONE_3D.pop("TRAIN_COMPUTE_DTYPE", None)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          input_channels=4)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-35, 35, (2, 16384, 4)).astype(np.float32)
    pts[..., 2] = pts[..., 2] / 12.0
    pts = np.take_along_axis(pts, np.argsort(pts[..., 0], axis=1)[..., None], 1)
    gt = np.zeros((2, 20, 8), np.float32)
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, :3] = rng.uniform(-20, 20, (2, 20, 3))
    gt[:, :, 2] = -1.0
    gt[:, :, 7] = rng.randint(1, 4, (2, 20))
    batch = {"points": jnp.asarray(pts), "gt_boxes": jnp.asarray(gt)}

    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=True)
    )(jax.random.PRNGKey(0), batch["points"])
    tx, _ = build_optimizer_and_schedule(
        cfg.OPTIMIZATION, total_iters_each_epoch=100, total_epochs=10
    )
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx)

    def k_steps(state, batch):
        def body(st, _):
            st, loss, _ = step(st, batch)
            return st, loss

        return jax.lax.scan(body, state, None, length=K_STEPS)

    fn = jax.jit(k_steps, donate_argnums=(0,))
    st2, losses = fn(state, batch)
    np.asarray(losses)  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st2, losses = fn(st2, batch)
        np.asarray(losses[-1])  # force D2H: block_until_ready returns early
        best = min(best, (time.perf_counter() - t0) / K_STEPS)
    print(f"attention={impl} dtype={mode}: train step {best * 1e3:.1f} ms "
          f"({best * 1e3 / 2:.1f} ms/frame), last loss {float(losses[-1]):.1f}")


if __name__ == "__main__":
    main()
