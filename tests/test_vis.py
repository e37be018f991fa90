"""Headless scene visualization smoke (tools/visual_utils):
draw_scenes must render a PNG without a GUI stack, and box corners must
match the geometry used by the box utils."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from visual_utils.scene_vis_utils import box_to_corners, draw_scenes

from pdanet_tpu.utils.box_utils import boxes_to_corners_3d


def test_draw_scenes_headless(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, (2000, 4)).astype(np.float32)
    gt = np.array([[5, 2, 0, 4, 2, 1.5, 0.4]], np.float32)
    pred = np.array([[5.2, 2.1, 0, 4, 2, 1.5, 0.5]], np.float32)
    out = draw_scenes(
        pts, gt_boxes=gt, ref_boxes=pred, ref_scores=[0.9],
        save_path=str(tmp_path / "scene.png"),
    )
    assert os.path.getsize(out) > 10000


def test_box_corners_match_box_utils():
    box = np.array([3.0, -1.0, 0.5, 4.2, 1.8, 1.6, 0.7], np.float32)
    got = np.sort(box_to_corners(box), axis=0)
    want = np.sort(
        np.asarray(boxes_to_corners_3d(box[None]))[0], axis=0
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
