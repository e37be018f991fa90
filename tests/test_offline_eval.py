"""Offline KITTI evaluate CLI (kitti_object_eval_python/evaluate.py): the
txt-file roundtrip path must reproduce the in-memory evaluation exactly,
and low-score filtering must drop detections.

(A perfect detector on a 3-frame fixture scores AP = 5.0, not 100 — the
official 41-recall-point protocol needs >= 41 gts per class for a dense
threshold set; that artifact is the official behavior, not a bug.)
"""

import numpy as np

from kitti_fixture import build_mini_kitti

from pdanet_tpu.datasets.kitti.kitti_object_eval_python import eval as E
from pdanet_tpu.datasets.kitti.kitti_object_eval_python.evaluate import (
    evaluate,
    filter_annos_low_score,
    get_label_annos,
)


def _perfect_results(label_dir, result_dir, score="0.9"):
    result_dir.mkdir()
    for f in label_dir.iterdir():
        lines = []
        for line in f.read_text().splitlines():
            parts = line.split(" ")
            if not line.strip() or parts[0] == "DontCare":
                continue
            lines.append(" ".join(parts[:15] + [score]))
        (result_dir / f.name).write_text("\n".join(lines) + "\n")


def test_offline_evaluate_matches_in_memory(tmp_path):
    build_mini_kitti(tmp_path, num_frames=3)
    label_dir = tmp_path / "training" / "label_2"
    split = tmp_path / "ImageSets" / "train.txt"
    _perfect_results(label_dir, tmp_path / "results")

    gt = get_label_annos(str(label_dir))
    assert len(gt) == 3 and all(len(a["name"]) > 0 for a in gt)
    dt = []
    for a in gt:
        b = {k: v.copy() for k, v in a.items()}
        b["score"] = np.full(len(a["name"]), 0.9)
        dt.append(b)
    _, want = E.get_official_eval_result(gt, dt, [0, 1])

    _, got = evaluate(
        str(label_dir), str(tmp_path / "results"), str(split), [0, 1]
    )
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-9, err_msg=k)
    # identity matching actually produced signal on this fixture
    assert any(float(v) > 0 for k, v in got.items() if "3d" in k)


def test_offline_evaluate_score_filter(tmp_path):
    build_mini_kitti(tmp_path, num_frames=2)
    label_dir = tmp_path / "training" / "label_2"
    dt = get_label_annos(str(label_dir))
    for a in dt:
        a["score"] = np.full(len(a["name"]), 0.1)
    kept = filter_annos_low_score(dt, 0.5)
    assert all(len(a["name"]) == 0 for a in kept)
    kept2 = filter_annos_low_score(dt, 0.05)
    assert all(len(a["name"]) == len(b["name"]) for a, b in zip(kept2, dt))


def test_official_eval_wall_clock_bound():
    """Eval-at-scale regression bound (VERDICT r2 next#5): the official
    KITTI/ONCE eval ports must stay interactive without numba.  Measured on
    this 1-CPU host (tools/probes/eval_scale_probe.py): KITTI 3,769 frames
    ~32 s, ONCE 3,000 frames ~65 s after the threshold-vectorized ONCE
    matcher.  The bound here runs a 250-frame slice and allows 5x headroom
    for loaded CI boxes; a regression to per-threshold python matching
    (~10x) trips it."""
    import sys
    import time
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                           / "tools" / "probes"))
    from eval_scale_probe import synth_kitti_annos

    from pdanet_tpu.datasets.kitti.kitti_object_eval_python.eval import (
        get_official_eval_result,
    )

    gt, dt = synth_kitti_annos(250, seed=3)
    t0 = time.perf_counter()
    get_official_eval_result(gt, dt, [0, 1, 2])
    dt_kitti = time.perf_counter() - t0
    assert dt_kitti < 12.0, f"KITTI eval 250 frames took {dt_kitti:.1f}s"
