"""Benchmark: PDA-SSD on the available accelerator (the driver runs this
on one real TPU chip).

Prints ONE JSON line.  Headline metric: KITTI batch-1 END-TO-END inference
(forward + the in-graph rotated-NMS post-processing that the reference
times, eval_utils.py:56-76) on a LiDAR-like structured cloud.  The
``extras`` dict carries the other tracked configs (BASELINE.md):

  kitti_b1_forward_fps       raw forward, gaussian cloud (round-1/2 metric,
                             kept for cross-round comparability)
  kitti_b1_e2e_fps           forward + post_processing, LiDAR-like cloud
  kitti_b8_e2e_ms            batch-8 eval config e2e (forward + NMS)
  once_b2_forward_ms         ONCE config, 2 x 60k points, per batch
  once_b2_e2e_ms             ONCE forward + in-graph NMS, per batch
  kitti_b2_train_ms          fused train step (fwd+bwd+optax), per step,
                             config AS SHIPPED (r5: bf16 train compute —
                             f32 master weights/optimizer/norm stats)
  kitti_b2_train_f32_ms      same with TRAIN_COMPUTE_DTYPE removed
                             (reference f32 numerics; r2-r4 comparable)
  once_b2_train_ms           ONCE-scale fused train step, per step
                             (as shipped = bf16 train compute)
  once_b2_train_f32_ms       ONCE train step, f32 numerics
  vs_baseline_at_80fps       sensitivity: the public IA-SSD ~80 fps 2080 Ti
                             figure as denominator instead of 25

Baseline: the reference repo publishes no numbers (SURVEY.md §6); the
north-star is >= 2x an RTX 2080 Ti.  Public IA-SSD-class timings on
2080 Ti are ~12-13 ms/frame (~80 fps) for the 16384-point KITTI config;
PDA adds the per-center transformer, so 25 fps is the conservative
reference figure: vs_baseline = headline_fps / 25.

Measurement note: on this image the TPU sits behind an RPC relay with
~30-40 ms per-dispatch overhead, so each workload runs K times inside ONE
jitted ``fori_loop`` (inputs perturbed per step to defeat CSE) and the
per-iteration time is total/K — the deployment-realistic number
(device-resident pipelines never pay per-frame dispatch RPCs).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REF_2080TI_FPS = 25.0
REF_2080TI_FPS_HIGH = 80.0


def lidar_like_cloud(seed, B, N, x_range=(0.0, 70.4), y_range=(-40.0, 40.0)):
    """Structured synthetic LiDAR frame: ground plane with 1/r density
    falloff + object-like gaussian clusters + sparse mid-air returns.
    Mimics the spatial coherence statistics that the streamed ball query's
    AABB chunk-skip (and FPS) see on real KITTI/ONCE frames; x-sorted like
    the pipeline's ``sort_points`` step."""
    rs = np.random.RandomState(seed)
    n_ground = int(N * 0.72)
    n_obj = int(N * 0.2)
    n_air = N - n_ground - n_obj

    # ground: radial 1/r sampling (uniform in sqrt gives denser near field)
    r = x_range[1] * np.sqrt(rs.rand(n_ground)) ** 1.4
    th = rs.uniform(-0.8, 0.8, n_ground)  # forward FOV
    gx = np.clip(r * np.cos(th), *x_range)
    gy = np.clip(r * np.sin(th), *y_range)
    gz = rs.normal(-1.7, 0.05, n_ground)
    ground = np.stack([gx, gy, gz], -1)

    # objects: car-sized clusters at plausible ranges
    n_clusters = 12
    centers = np.stack([
        rs.uniform(5, 60, n_clusters),
        rs.uniform(-20, 20, n_clusters),
        rs.uniform(-1.2, -0.4, n_clusters),
    ], -1)
    sizes = np.array([2.0, 0.9, 0.7])
    member = rs.randint(0, n_clusters, n_obj)
    obj = centers[member] + rs.randn(n_obj, 3) * sizes * 0.5

    air = np.stack([
        rs.uniform(*x_range, n_air),
        rs.uniform(*y_range, n_air),
        rs.uniform(-1.0, 2.5, n_air),
    ], -1)

    pts = np.concatenate([ground, obj, air], 0).astype(np.float32)
    intensity = rs.rand(N, 1).astype(np.float32)
    cloud = np.concatenate([pts, intensity], -1)

    # distinct frames: per-point jitter (so batch frames genuinely differ),
    # then the pipeline's x-sort
    out = np.stack([cloud] * B)
    out[:, :, :3] += rs.randn(B, N, 3).astype(np.float32) * 0.05
    for b in range(B):
        out[b] = out[b][np.argsort(out[b, :, 0], kind="stable")]
    return out


def time_amortized(fn, args, k_inner, reps=3):
    np.asarray(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, (time.perf_counter() - t0) / k_inner)
    return best


def build_model(cfg_path):
    from pdanet_tpu.config import cfg_from_yaml_file
    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = cfg_from_yaml_file(os.path.join(repo, cfg_path), EasyDict())
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), input_channels=4
    )
    return cfg, model


def forward_loop(model, k_inner):
    def k_forwards(variables, points):
        def body(i, acc):
            out = model.apply(
                variables, points + i.astype(points.dtype) * 1e-7, train=False
            )
            return acc + jnp.sum(out["batch_cls_preds"]) + jnp.sum(
                out["batch_box_preds"][..., 0]
            )

        return jax.lax.fori_loop(0, k_inner, body, jnp.float32(0.0))

    return jax.jit(k_forwards)


def e2e_loop(model, post_cfg, k_inner):
    from pdanet_tpu.models.detectors.iassd import post_processing

    def k_e2e(variables, points):
        def body(i, acc):
            out = model.apply(
                variables, points + i.astype(points.dtype) * 1e-7, train=False
            )
            pp = post_processing(
                out["batch_cls_preds"], out["batch_box_preds"], post_cfg
            )
            return (
                acc
                + jnp.sum(pp["pred_scores"])
                + jnp.sum(pp["pred_boxes"][..., 0])
                + pp["pred_counts"].sum().astype(jnp.float32)
            )

        return jax.lax.fori_loop(0, k_inner, body, jnp.float32(0.0))

    return jax.jit(k_e2e)


def main():
    results = {}

    # ---- KITTI flagship ---------------------------------------------------
    cfg, model = build_model("tools/cfgs/kitti_models/PDA-SSD.yaml")
    rng = jax.random.PRNGKey(0)

    # (a) round-1/2 comparable metric: gaussian cloud, forward only
    pts_g = jax.random.normal(rng, (1, 16384, 4), jnp.float32) * 10.0
    pts_g = jnp.take_along_axis(
        pts_g, jnp.argsort(pts_g[..., 0], axis=1)[..., None], axis=1
    )
    variables = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        rng, pts_g
    )
    K = 200
    fwd = forward_loop(model, K)
    t = time_amortized(fwd, (variables, pts_g), K)
    results["kitti_b1_forward_fps"] = round(1.0 / t, 2)

    # (b) headline: LiDAR-like cloud through forward + in-graph NMS
    # (K=200 matches the forward metric's amortization; at K=100 the
    # ~35 ms relay RPC still left a 0.35 ms/frame residue)
    pts_l = jnp.asarray(lidar_like_cloud(7, 1, 16384))
    K = 200
    e2e = e2e_loop(model, cfg.MODEL.POST_PROCESSING, K)
    t = time_amortized(e2e, (variables, pts_l), K)
    headline_fps = 1.0 / t
    results["kitti_b1_e2e_fps"] = round(headline_fps, 2)

    # deployment sizing: peak temp memory of the single-forward graph
    try:
        single = jax.jit(
            lambda v, p: model.apply(v, p, train=False)["batch_box_preds"]
        )
        mem = single.lower(variables, pts_l).compile().memory_analysis()
        tmp = getattr(mem, "temp_size_in_bytes", None)
        arg = getattr(mem, "argument_size_in_bytes", None)
        if tmp is not None:
            results["kitti_b1_forward_temp_mb"] = round(tmp / 1e6, 1)
        if arg is not None:
            results["kitti_b1_forward_args_mb"] = round(arg / 1e6, 1)
    except Exception:
        pass

    # ---- KITTI b8 e2e (the tracked batch-8 eval config, BASELINE.md) -------
    try:
        pts8 = jnp.asarray(lidar_like_cloud(9, 8, 16384))
        K = 40
        e2e8 = e2e_loop(model, cfg.MODEL.POST_PROCESSING, K)
        t = time_amortized(e2e8, (variables, pts8), K)
        results["kitti_b8_e2e_ms"] = round(t * 1e3, 2)
    except Exception as e:
        results["kitti_b8_e2e_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- ONCE b2 forward / e2e ---------------------------------------------
    ocfg = omodel = ovars = None  # later blocks guard on these
    try:
        ocfg, omodel = build_model("tools/cfgs/once_models/PDA-SSD.yaml")
        opts = jnp.asarray(
            lidar_like_cloud(11, 2, 60000, x_range=(0.0, 75.0))
        )
        ovars = jax.jit(
            lambda r, p: omodel.init({"params": r}, p, train=False)
        )(rng, opts)
        K = 20
        ofwd = forward_loop(omodel, K)
        t = time_amortized(ofwd, (ovars, opts), K)
        results["once_b2_forward_ms"] = round(t * 1e3, 2)
        oe2e = e2e_loop(omodel, ocfg.MODEL.POST_PROCESSING, K)
        t = time_amortized(oe2e, (ovars, opts), K)
        results["once_b2_e2e_ms"] = round(t * 1e3, 2)
    except Exception as e:  # keep the headline alive on partial failures
        results["once_b2_forward_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- fused train steps (KITTI f32 + bf16-compute, ONCE) ----------------
    def _fake_gt(B, seed=5):
        gt = np.zeros((B, 40, 8), np.float32)
        rs = np.random.RandomState(seed)
        for b in range(B):
            for m in range(12):
                gt[b, m] = [rs.uniform(5, 60), rs.uniform(-20, 20),
                            rs.uniform(-1.2, -0.4), 3.9, 1.6, 1.56,
                            rs.uniform(-np.pi, np.pi), 1.0]
        return jnp.asarray(gt)

    def time_train_step(mdl, optim_cfg, pts, gt, K=40):
        # K=40 matches the e2e loops' amortization (r5): at K=20 the
        # ~35 ms relay RPC leaves a 1.75 ms/step residue on a 23.7 ms
        # device step (xplane), overstating the step by ~7%.
        from pdanet_tpu.train import (
            build_optimizer_and_schedule,
            create_train_state,
            make_train_step,
        )

        tvars = jax.jit(
            lambda r, p: mdl.init({"params": r}, p, train=False)
        )(rng, pts)
        tx, _ = build_optimizer_and_schedule(optim_cfg, 100, 80)
        state = create_train_state(mdl, tvars, tx)
        train_step = make_train_step(mdl, tx)

        def k_train(state, points, gt):
            def body(i, carry):
                st, acc = carry
                st2, loss, _ = train_step(
                    st, {"points": points + i.astype(points.dtype) * 1e-7,
                         "gt_boxes": gt}
                )
                return st2, acc + loss

            st_out, acc = jax.lax.fori_loop(0, K, body, (state, 0.0))
            # depend on the updated params too, so nothing is DCE'd
            leaf = jax.tree.leaves(st_out.params)[0]
            return acc + jnp.sum(leaf)

        ktrain = jax.jit(k_train)
        np.asarray(ktrain(state, pts, gt))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(ktrain(state, pts, gt))
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    # The shipped PDA-SSD.yaml now defaults TRAIN_COMPUTE_DTYPE: bf16
    # (r5) — kitti_b2_train_ms measures the config AS SHIPPED; the f32
    # companion (reference numerics, TRAIN_COMPUTE_DTYPE removed) keeps
    # the r2-r4 history comparable.
    tpts = jnp.asarray(lidar_like_cloud(13, 2, 16384))
    gt2 = _fake_gt(2)
    try:
        t = time_train_step(model, cfg.OPTIMIZATION, tpts, gt2)
        results["kitti_b2_train_ms"] = round(t * 1e3, 2)
    except Exception as e:
        results["kitti_b2_train_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        import copy

        from pdanet_tpu.models import build_network as _bn

        cfg32 = copy.deepcopy(cfg)
        cfg32.MODEL.BACKBONE_3D.pop("TRAIN_COMPUTE_DTYPE", None)
        model32 = _bn(cfg32.MODEL, num_class=len(cfg.CLASS_NAMES),
                      input_channels=4)
        t = time_train_step(model32, cfg.OPTIMIZATION, tpts, gt2)
        results["kitti_b2_train_f32_ms"] = round(t * 1e3, 2)
    except Exception as e:
        results["kitti_b2_train_f32_error"] = f"{type(e).__name__}: {e}"[:200]

    # ONCE train step (VERDICT r3 #4): B=2 x 60000, the reference recipe
    # (as shipped = bf16 train compute), plus the f32 companion
    if omodel is None:  # don't mask the root-cause ONCE build error
        results["once_b2_train_error"] = "once model unavailable (see once_b2_forward_error)"
    else:
        otpts = jnp.asarray(
            lidar_like_cloud(17, 2, 60000, x_range=(0.0, 75.0))
        )
        try:
            t = time_train_step(omodel, ocfg.OPTIMIZATION, otpts,
                                _fake_gt(2, 6), K=8)
            results["once_b2_train_ms"] = round(t * 1e3, 2)
        except Exception as e:
            results["once_b2_train_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            import copy

            from pdanet_tpu.models import build_network as _bn

            ocfg32 = copy.deepcopy(ocfg)
            ocfg32.MODEL.BACKBONE_3D.pop("TRAIN_COMPUTE_DTYPE", None)
            omodel32 = _bn(ocfg32.MODEL, num_class=len(ocfg.CLASS_NAMES),
                           input_channels=4)
            t = time_train_step(omodel32, ocfg.OPTIMIZATION, otpts,
                                _fake_gt(2, 6), K=8)
            results["once_b2_train_f32_ms"] = round(t * 1e3, 2)
        except Exception as e:
            results["once_b2_train_f32_error"] = (
                f"{type(e).__name__}: {e}"[:200])

    results["vs_baseline_at_80fps"] = round(headline_fps / REF_2080TI_FPS_HIGH, 3)
    print(
        json.dumps(
            {
                "metric": "pda_ssd_kitti_b1_e2e_inference",
                "value": round(headline_fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(headline_fps / REF_2080TI_FPS, 3),
                "extras": results,
            }
        )
    )


if __name__ == "__main__":
    main()
