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
