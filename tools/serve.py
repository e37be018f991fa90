"""Minimal serving runner for exported StableHLO artifacts.

Completes the deployment loop that ``tools/export.py`` starts: load the
self-contained artifact (weights baked in, static shapes, forward +
in-graph NMS) and run batched inference over ``.bin`` / ``.npy`` point
clouds, writing one JSON line of detections per frame.  The preprocessing
mirrors the test-split pipeline budgets recorded in the artifact's JSON
sidecar (fixed point budget + x-sort); no YAML/config machinery is needed
at serving time.

Usage:
  python tools/serve.py --artifact pda_ssd_b1.stablehlo \
      --inputs /path/to/clouds/'*.bin' [--out detections.jsonl] \
      [--score_thresh 0.3]

Cite: the reference has no serving story (SURVEY.md §2.5 — deployment is
re-running test.py in a live torch process); this runner + jax.export is
the TPU-native equivalent.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def load_cloud(path, n_points, num_feats, sort_points=True):
    import numpy as np

    if path.endswith(".npy"):
        pts = np.load(path)
    else:  # KITTI velodyne .bin layout: (N, 4) f32
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    pts = pts[:, :num_feats].astype(np.float32)
    n = pts.shape[0]
    if n == 0:
        raise SystemExit(f"empty point cloud: {path!r} (0 points)")
    if n >= n_points:  # deterministic serve-time subsample: stride pick
        idx = np.linspace(0, n - 1, n_points).astype(np.int64)
        pts = pts[idx]
    else:  # pad by wrapping (duplicates are harmless to the detector)
        reps = -(-n_points // n)
        pts = np.tile(pts, (reps, 1))[:n_points]
    if sort_points:  # mirror the pipeline's sort_points step (sidecar flag)
        pts = pts[np.argsort(pts[:, 0], kind="stable")]
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--inputs", required=True,
                    help="glob of .bin/.npy point clouds")
    ap.add_argument("--out", default=None, help="output jsonl (default stdout)")
    ap.add_argument("--score_thresh", type=float, default=0.3)
    args = ap.parse_args()

    import numpy as np

    from pdanet_tpu.serving import load_serving

    predict, exported = load_serving(args.artifact)
    meta_path = args.artifact + ".json"
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    in_spec = meta.get("inputs", {})
    if "points" not in in_spec:
        raise SystemExit(
            "artifact sidecar missing 'points' input spec; re-export with "
            "tools/export.py (which writes the JSON sidecar)"
        )
    B, n_points, num_feats = in_spec["points"]["shape"]
    # older sidecars lack the preprocess block; default matches the
    # shipped configs (sort_points ENABLED.test defaults to on)
    sort_points = meta.get("preprocess", {}).get("sort_points", True)

    files = sorted(glob.glob(args.inputs))
    if not files:
        raise SystemExit(f"no inputs match {args.inputs!r}")
    sink = open(args.out, "w") if args.out else sys.stdout

    n_done = 0
    t0 = time.perf_counter()
    for start in range(0, len(files), B):
        batch_files = files[start:start + B]
        batch = np.stack(
            [load_cloud(f, n_points, num_feats, sort_points)
             for f in batch_files]
            + [np.zeros((n_points, num_feats), np.float32)]
            * (B - len(batch_files))
        )
        out = predict({"points": batch})
        boxes = np.asarray(out["pred_boxes"])
        scores = np.asarray(out["pred_scores"])
        labels = np.asarray(out["pred_labels"])
        counts = np.asarray(out["pred_counts"])
        for bi, f in enumerate(batch_files):
            keep = (np.arange(boxes.shape[1]) < counts[bi]) & (
                scores[bi] >= args.score_thresh
            )
            sink.write(json.dumps({
                "frame": os.path.basename(f),
                "boxes_lidar": boxes[bi][keep].round(3).tolist(),
                "scores": scores[bi][keep].round(4).tolist(),
                "labels": labels[bi][keep].tolist(),
            }) + "\n")
            n_done += 1
    dt = time.perf_counter() - t0
    print(f"served {n_done} frames in {dt:.2f}s "
          f"({n_done / dt:.1f} fps incl. host IO)", file=sys.stderr)
    if args.out:
        sink.close()


if __name__ == "__main__":
    main()
