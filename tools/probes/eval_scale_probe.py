"""Wall-clock probe: KITTI + ONCE official eval at validation scale
(VERDICT r2 next#5).

Generates val-sized synthetic annotations (3,769 frames for KITTI /
3,000 for ONCE at realistic det/gt counts), runs the full official-eval
ports, and prints per-phase wall-clock.  The reference numba-jits its
matching loops (kitti_object_eval_python/eval.py:160-377 @numba.jit);
the ports must stay within interactive range (~2 min) without numba.

Usage: python tools/probes/eval_scale_probe.py [n_frames]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

CLASSES = ["Car", "Pedestrian", "Cyclist"]


def synth_kitti_annos(n_frames, seed=0):
    rs = np.random.RandomState(seed)
    gt, dt = [], []
    for _ in range(n_frames):
        n_gt = rs.poisson(6) + 1
        names = rs.choice(CLASSES, n_gt, p=[0.7, 0.2, 0.1])
        loc = np.stack([rs.uniform(-20, 20, n_gt), rs.uniform(0.5, 2.5, n_gt),
                        rs.uniform(5, 70, n_gt)], -1)
        dims = np.stack([rs.uniform(3.2, 4.5, n_gt), rs.uniform(1.4, 1.8, n_gt),
                         rs.uniform(1.4, 1.8, n_gt)], -1)  # l, h, w
        ry = rs.uniform(-np.pi, np.pi, n_gt)
        h_px = rs.uniform(25, 120, n_gt)
        y0 = rs.uniform(150, 250, n_gt)
        x0 = rs.uniform(0, 1100, n_gt)
        bbox = np.stack([x0, y0, x0 + h_px * rs.uniform(1.0, 2.5, n_gt),
                         y0 + h_px], -1)
        g = {
            "name": names,
            "truncated": rs.uniform(0, 0.3, n_gt),
            "occluded": rs.randint(0, 3, n_gt),
            "alpha": rs.uniform(-np.pi, np.pi, n_gt),
            "bbox": bbox,
            "dimensions": dims,
            "location": loc,
            "rotation_y": ry,
        }
        gt.append(g)

        # detections: most gt found with jitter + some false positives
        keep = rs.rand(n_gt) < 0.85
        n_fp = rs.poisson(3)
        jitter = lambda a, s: a + rs.randn(*np.shape(a)) * s
        d_loc = np.concatenate([jitter(loc[keep], 0.15),
                                np.stack([rs.uniform(-20, 20, n_fp),
                                          rs.uniform(0.5, 2.5, n_fp),
                                          rs.uniform(5, 70, n_fp)], -1)])
        n_dt = len(d_loc)
        d = {
            "name": np.concatenate([names[keep], rs.choice(CLASSES, n_fp)]),
            "truncated": np.zeros(n_dt),
            "occluded": np.zeros(n_dt, np.int64),
            "alpha": rs.uniform(-np.pi, np.pi, n_dt),
            "bbox": np.concatenate([jitter(bbox[keep], 2.0),
                                    np.stack([x0[:n_fp] if n_fp <= n_gt else
                                              rs.uniform(0, 1100, n_fp),
                                              rs.uniform(150, 250, n_fp),
                                              rs.uniform(0, 1100, n_fp) + 60,
                                              rs.uniform(150, 250, n_fp) + 40],
                                             -1)[:n_fp]]),
            "dimensions": np.concatenate([jitter(dims[keep], 0.05),
                                          np.tile([[3.9, 1.56, 1.6]],
                                                  (n_fp, 1))]),
            "location": d_loc,
            "rotation_y": np.concatenate([jitter(ry[keep], 0.05),
                                          rs.uniform(-np.pi, np.pi, n_fp)]),
            "score": rs.uniform(0.1, 1.0, n_dt),
        }
        dt.append(d)
    return gt, dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3769
    t0 = time.perf_counter()
    gt, dt = synth_kitti_annos(n)
    print(f"synth {n} frames: {time.perf_counter() - t0:.1f}s")

    from pdanet_tpu.datasets.kitti.kitti_object_eval_python.eval import (
        get_official_eval_result,
    )

    t0 = time.perf_counter()
    result, ret_dict = get_official_eval_result(gt, dt, [0, 1, 2])
    dt_kitti = time.perf_counter() - t0
    print(f"KITTI official eval ({n} frames, R11+R40, "
          f"bbox/bev/3d/aos): {dt_kitti:.1f}s")
    line = [ln for ln in result.splitlines() if "3d" in ln.lower()][:1]
    print("sample:", line)

    # ONCE at val scale
    from pdanet_tpu.datasets.once.once_eval.evaluation import (
        get_evaluation_results,
    )

    n_once = min(n, 3000)
    rs = np.random.RandomState(1)
    ogt, odt = [], []
    for i in range(n_once):
        n_gt = rs.poisson(25) + 1
        names = rs.choice(["Car", "Truck", "Bus", "Pedestrian", "Cyclist"],
                          n_gt)
        boxes = np.stack([
            rs.uniform(-60, 60, n_gt), rs.uniform(-60, 60, n_gt),
            rs.uniform(-2, 1, n_gt), rs.uniform(3.5, 10, n_gt),
            rs.uniform(1.5, 3, n_gt), rs.uniform(1.4, 3.5, n_gt),
            rs.uniform(-np.pi, np.pi, n_gt)], -1)
        ogt.append({"name": names, "boxes_3d": boxes,
                    "frame_id": str(i)})
        keep = rs.rand(n_gt) < 0.8
        n_fp = rs.poisson(6)
        dboxes = np.concatenate([
            boxes[keep] + rs.randn(keep.sum(), 7) * 0.1,
            np.stack([rs.uniform(-60, 60, n_fp), rs.uniform(-60, 60, n_fp),
                      rs.uniform(-2, 1, n_fp), rs.uniform(3.5, 10, n_fp),
                      rs.uniform(1.5, 3, n_fp), rs.uniform(1.4, 3.5, n_fp),
                      rs.uniform(-np.pi, np.pi, n_fp)], -1)])
        odt.append({
            "name": np.concatenate([names[keep],
                                    rs.choice(["Car", "Pedestrian"], n_fp)]),
            "boxes_3d": dboxes,
            "score": rs.uniform(0.1, 1, len(dboxes)),
            "frame_id": str(i),
        })
    t0 = time.perf_counter()
    ostr, odict = get_evaluation_results(
        ogt, odt, classes=["Car", "Truck", "Bus", "Pedestrian", "Cyclist"])
    dt_once = time.perf_counter() - t0
    print(f"ONCE official eval ({n_once} frames): {dt_once:.1f}s")


if __name__ == "__main__":
    main()
