"""Native C++ host-kernel parity: the g++-built library in
``pdanet_tpu/native`` must be interchangeable with the numpy fallbacks
(rotated BEV overlap per iou3d_cpu.cpp, grid-hash voxelizer per spconv
Point2VoxelCPU3d, points_in_boxes per roiaware_pool3d.cpp)."""

import numpy as np
import pytest

from pdanet_tpu import native
from pdanet_tpu.utils.easydict import EasyDict


def _rand_boxes7(rng, n, span=15.0):
    return np.column_stack(
        [
            rng.uniform(-span, span, (n, 2)),
            rng.uniform(-1, 1, n),
            rng.uniform(0.5, 5, (n, 2)),
            rng.uniform(0.5, 3, n),
            rng.uniform(-np.pi, np.pi, n),
        ]
    ).astype(np.float32)


@pytest.fixture
def numpy_fallback(monkeypatch):
    """Force every native wrapper onto its numpy fallback."""
    monkeypatch.setattr(native, "_LIB", None)


def test_bev_iou_identity_regression():
    # regression: clockwise corner winding used to clip every polygon to
    # empty, silently zeroing the gt-sampler collision test
    from pdanet_tpu.utils.iou3d_np import boxes_bev_iou_cpu

    box = np.array([[1.0, -2.0, 0.0, 1.6, 3.9, 1.5, 0.7]], np.float32)
    assert np.allclose(boxes_bev_iou_cpu(box, box), 1.0, atol=1e-5)


@pytest.mark.skipif(not native.NATIVE_AVAILABLE, reason="no native toolchain")
def test_rotated_overlap_native_vs_numpy(monkeypatch):
    from pdanet_tpu.utils import iou3d_np

    rng = np.random.default_rng(7)
    a, b = _rand_boxes7(rng, 60), _rand_boxes7(rng, 45)
    got = iou3d_np.boxes_bev_overlap_cpu(a, b)
    monkeypatch.setattr(native, "_LIB", None)
    want = iou3d_np.boxes_bev_overlap_cpu(a, b)
    assert np.allclose(got, want, atol=1e-4)


@pytest.mark.skipif(not native.NATIVE_AVAILABLE, reason="no native toolchain")
def test_eval_rotate_iou_native_vs_numpy(monkeypatch):
    from pdanet_tpu.datasets.kitti.kitti_object_eval_python import rotate_iou

    rng = np.random.default_rng(11)
    a = _rand_boxes7(rng, 50)[:, [0, 1, 3, 4, 6]].astype(np.float64)
    b = _rand_boxes7(rng, 40)[:, [0, 1, 3, 4, 6]].astype(np.float64)
    for criterion in (-1, 0, 1, 2):
        got = rotate_iou.rotate_iou_eval(a, b, criterion)
        monkeypatch.setattr(native, "_LIB", None)
        want = rotate_iou.rotate_iou_eval(a, b, criterion)
        monkeypatch.undo()
        assert np.allclose(got, want, atol=1e-4), criterion


@pytest.mark.skipif(not native.NATIVE_AVAILABLE, reason="no native toolchain")
def test_points_in_boxes_native_vs_numpy(monkeypatch):
    from pdanet_tpu.utils import box_utils

    rng = np.random.default_rng(3)
    pts = rng.uniform(-15, 15, (4000, 3)).astype(np.float32)
    boxes = _rand_boxes7(rng, 30)
    got = box_utils.points_in_boxes_cpu(pts, boxes)
    monkeypatch.setattr(native, "_LIB", None)
    want = box_utils.points_in_boxes_cpu(pts, boxes)
    assert np.array_equal(got, want)


@pytest.mark.skipif(not native.NATIVE_AVAILABLE, reason="no native toolchain")
def test_voxelizer_native_vs_numpy(monkeypatch):
    from pdanet_tpu.datasets.processor.data_processor import DataProcessor

    rng = np.random.default_rng(5)
    pcr = np.array([0, -40, -3, 70.4, 40, 1], np.float32)
    cfg = EasyDict(
        NAME="transform_points_to_voxels",
        VOXEL_SIZE=[0.05, 0.05, 0.1],
        MAX_POINTS_PER_VOXEL=5,
        MAX_NUMBER_OF_VOXELS={"train": 2000, "test": 40000},
    )
    dp = DataProcessor([cfg], pcr, training=True, num_point_features=4)
    n = 30000  # overflows the 2000-voxel budget -> exercises both caps
    pts = np.column_stack(
        [
            rng.uniform(-5, 75, n),  # some points out of range
            rng.uniform(-45, 45, n),
            rng.uniform(-4, 2, n),
            rng.uniform(0, 1, n),
        ]
    ).astype(np.float32)

    got = dp.forward({"points": pts.copy(), "use_lead_xyz": True})
    monkeypatch.setattr(native, "_LIB", None)
    want = dp.forward({"points": pts.copy(), "use_lead_xyz": True})
    for key in ("voxels", "voxel_coords", "voxel_num_points"):
        assert np.array_equal(got[key], want[key]), key
