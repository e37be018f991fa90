"""Local/frustum/pyramid augmentation tests (host-side numpy)."""

import numpy as np

from pdanet_tpu.datasets.augmentor import augmentor_utils as AU


def _box(cx=0.0, cy=0.0, cz=0.0, dx=4.0, dy=2.0, dz=2.0, ry=0.0):
    return np.array([[cx, cy, cz, dx, dy, dz, ry]], np.float32)


def test_world_translation_moves_everything():
    np.random.seed(0)
    boxes = _box()
    pts = np.random.uniform(-5, 5, (100, 4)).astype(np.float32)
    b0, p0 = boxes.copy(), pts.copy()
    boxes, pts = AU.random_world_translation(boxes, pts, 1.0, ["x", "z"])
    np.testing.assert_allclose(pts[:, 1], p0[:, 1])
    dx = pts[0, 0] - p0[0, 0]
    np.testing.assert_allclose(pts[:, 0] - p0[:, 0], dx, atol=1e-6)
    np.testing.assert_allclose(boxes[0, 0] - b0[0, 0], dx, atol=1e-6)


def test_local_translation_moves_only_in_box_points():
    np.random.seed(1)
    boxes = _box()
    inside = np.array([[0.5, 0.2, 0.1, 1.0]], np.float32)
    outside = np.array([[10.0, 10.0, 0.0, 1.0]], np.float32)
    pts = np.concatenate([inside, outside], axis=0)
    boxes2, pts2 = AU.random_local_translation(
        boxes.copy(), pts.copy(), [0.5, 1.0], ["x"]
    )
    shift = boxes2[0, 0] - boxes[0, 0]
    assert 0.5 <= shift <= 1.0
    np.testing.assert_allclose(pts2[0, 0] - pts[0, 0], shift, atol=1e-6)
    np.testing.assert_allclose(pts2[1], pts[1])


def test_local_rotation_keeps_membership():
    np.random.seed(2)
    boxes = _box(ry=0.3)
    pts = np.array([[1.0, 0.5, 0.2, 0.7], [15.0, 0.0, 0.0, 0.2]], np.float32)
    boxes2, pts2 = AU.local_rotation(boxes.copy(), pts.copy(), [0.5, 0.5])
    np.testing.assert_allclose(boxes2[0, 6], 0.8, atol=1e-6)
    # the in-box point rotates with the box: its local coords are invariant
    assert AU.points_in_box_mask(pts2, boxes2[0])[0]
    np.testing.assert_allclose(pts2[1], pts[1])  # far point untouched
    np.testing.assert_allclose(pts2[0, 3], pts[0, 3])  # features preserved


def test_local_scaling_scales_dims():
    np.random.seed(3)
    boxes = _box()
    pts = np.array([[1.0, 0.5, 0.2, 0.7]], np.float32)
    boxes2, pts2 = AU.local_scaling(boxes.copy(), pts.copy(), [1.15, 1.25])
    scale = boxes2[0, 3] / 4.0
    assert 1.15 <= scale <= 1.25
    np.testing.assert_allclose(boxes2[0, 3:6], np.array([4, 2, 2]) * scale,
                               rtol=1e-6)
    np.testing.assert_allclose(
        pts2[0, :3], np.array([1.0, 0.5, 0.2]) * scale, rtol=1e-5
    )


def test_global_frustum_dropout_top():
    np.random.seed(4)
    boxes = np.concatenate([_box(cz=0.0), _box(cz=5.0)], axis=0)
    pts = np.zeros((100, 4), np.float32)
    pts[:, 2] = np.linspace(-5, 5, 100)
    boxes2, pts2 = AU.global_frustum_dropout(
        boxes, pts, [0.3, 0.3], "top"
    )
    thr = 5 - 0.3 * 10
    assert (pts2[:, 2] < thr).all()
    assert boxes2.shape[0] == 1 and boxes2[0, 2] == 0.0


def test_local_frustum_dropout_removes_top_slab():
    np.random.seed(5)
    boxes = _box()
    pts = np.zeros((50, 4), np.float32)
    pts[:, 2] = np.linspace(-0.9, 0.9, 50)
    boxes2, pts2 = AU.local_frustum_dropout(
        boxes, pts.copy(), [0.4, 0.4], "top"
    )
    thr = 1.0 - 0.4 * 2.0
    assert (pts2[:, 2] < thr).all()
    assert pts2.shape[0] < pts.shape[0]


def test_pyramid_membership_closed_form():
    boxes = _box()
    pyr = AU.get_pyramids(boxes)  # (1, 6, 15)
    # face 0 per the ordering is corners [0,1,5,4] = the +x face
    plus_x_face = pyr[0, 0]
    inside = np.array([
        [1.9, 0.0, 0.0],      # near the face center
        [0.2, 0.05, 0.05],    # near the apex
    ], np.float32)
    outside = np.array([
        [-1.9, 0.0, 0.0],     # opposite face pyramid
        [1.9, 0.99, 0.9],     # corner region outside the shrinking hull
        [2.5, 0.0, 0.0],      # beyond the face
    ], np.float32)
    m_in = AU.points_in_pyramid_mask(inside, plus_x_face)
    m_out = AU.points_in_pyramid_mask(outside, plus_x_face)
    assert m_in.all(), m_in
    assert not m_out.any(), m_out


def test_pyramid_dropout_removes_face_points():
    np.random.seed(7)
    boxes = _box()
    # put points only in the +x face pyramid region and far away
    pts = np.array([
        [1.9, 0.0, 0.0, 0.5],
        [1.8, 0.1, 0.1, 0.5],
        [30.0, 0.0, 0.0, 0.5],
    ], np.float32)
    removed_any = False
    for seed in range(20):
        np.random.seed(seed)
        _, pts2, _ = AU.local_pyramid_dropout(boxes, pts.copy(), 1.0)
        assert pts2.shape[0] >= 1
        # far point always survives
        assert (pts2[:, 0] == 30.0).any()
        if pts2.shape[0] == 1:
            removed_any = True
    assert removed_any  # some seed picked the +x face


def test_pyramid_swap_preserves_count_and_geometry():
    np.random.seed(11)
    boxes = np.concatenate([_box(cx=0.0), _box(cx=20.0)], axis=0)
    rng = np.random.RandomState(0)

    def fill(cx):
        # points concentrated inside every face pyramid of a box at cx
        p = rng.uniform(-0.8, 0.8, (240, 3)).astype(np.float32)
        p[:, 0] = p[:, 0] * 1.8 + cx
        inten = rng.rand(240, 1).astype(np.float32)
        return np.concatenate([p, inten], axis=-1)

    pts = np.concatenate([fill(0.0), fill(20.0)], axis=0)
    _, pts2 = AU.local_pyramid_swap(boxes, pts.copy(), 1.0, 5)
    # swapped points stay inside the scene bounds of the two boxes
    assert pts2.shape[1] == 4
    assert np.isfinite(pts2).all()
    assert (pts2[:, 3] >= 0).all() and (pts2[:, 3] <= 1.0 + 1e-5).all()
