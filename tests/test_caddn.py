"""CaDDN tests: depth binning + fg-mask oracles, frustum feature volume,
trilinear sampling vs torch-convention oracle, frustum-to-voxel geometry
on a synthetic calib, and detector forward/loss/grads."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.utils import transform_utils as TU
from pdanet_tpu.utils.easydict import EasyDict

GRID = (16, 16, 4)  # (nx, ny, nz)
PC_RANGE = (2.0, -3.2, -3.0, 8.4, 3.2, 1.0)
DISC = {"mode": "LID", "num_bins": 8, "depth_min": 2.0, "depth_max": 8.4}

CADDN_MODEL_CFG = {
    "NAME": "CaDDN",
    "VFE": {
        "NAME": "ImageVFE",
        "FFN": {
            "NAME": "DepthFFN",
            "DDN": {"NAME": "DDNDeepLabV3", "WIDTH": 16},
            "CHANNEL_REDUCE": {"in_channels": 16, "out_channels": 8,
                               "kernel_size": 1, "stride": 1, "bias": False},
            "DISCRETIZE": DISC,
            "LOSS": {
                "NAME": "DDNLoss",
                "ARGS": {"weight": 3.0, "alpha": 0.25, "gamma": 2.0,
                         "fg_weight": 13, "bg_weight": 1},
            },
        },
        "F2V": {"NAME": "FrustumToVoxel",
                "SAMPLER": {"mode": "bilinear", "padding_mode": "zeros"}},
    },
    "MAP_TO_BEV": {
        "NAME": "Conv2DCollapse", "NUM_BEV_FEATURES": 8,
        "ARGS": {"kernel_size": 1, "stride": 1, "bias": False},
    },
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [2, 2],
        "NUM_FILTERS": [8, 16], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [8, 8],
    },
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
        "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
             "align_center": False, "feature_map_stride": 2,
             "matched_threshold": 0.6, "unmatched_threshold": 0.45},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
             "align_center": False, "feature_map_stride": 2,
             "matched_threshold": 0.5, "unmatched_threshold": 0.35},
        ],
        "TARGET_ASSIGNER_CONFIG": {
            "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
            "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder",
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7,
            }
        },
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 128,
                       "NMS_POST_MAXSIZE": 16},
    },
}


def test_bin_depths_lid_roundtrip():
    num_bins, dmin, dmax = 8, 2.0, 8.4
    bin_size = 2 * (dmax - dmin) / (num_bins * (1 + num_bins))
    # bin i spans [dmin + bin_size*i*(i+1)/2, ...); its start maps to i
    for i in range(num_bins):
        start = dmin + bin_size * i * (i + 1) / 2
        idx = float(TU.bin_depths(
            jnp.asarray(start + 1e-4), "LID", dmin, dmax, num_bins
        ))
        assert abs(idx - i) < 0.01, (i, idx)
    # target mode: out-of-range -> num_bins
    t = TU.bin_depths(
        jnp.asarray([0.5, 100.0, 3.0]), "LID", dmin, dmax, num_bins,
        target=True,
    )
    assert int(t[0]) == num_bins and int(t[1]) == num_bins
    assert 0 <= int(t[2]) < num_bins


def test_compute_fg_mask():
    boxes2d = np.zeros((1, 2, 4), np.float32)
    boxes2d[0, 0] = [4, 8, 12, 16]  # full-image scale
    mask = np.asarray(TU.compute_fg_mask(
        jnp.asarray(boxes2d), (1, 8, 8), downsample_factor=4
    ))
    # box /4 -> [1, 2, 3, 4): u in {1, 2}, v in {2, 3}
    exp = np.zeros((8, 8), bool)
    exp[2:4, 1:3] = True
    assert (mask[0] == exp).all()


def test_frustum_features_softmax():
    from pdanet_tpu.models.backbones_3d.vfe.image_vfe import (
        create_frustum_features,
    )

    rng = np.random.RandomState(0)
    feats = rng.rand(1, 4, 6, 3).astype(np.float32)
    logits = rng.rand(1, 4, 6, 5).astype(np.float32)  # D=4 (+1)
    out = np.asarray(create_frustum_features(
        jnp.asarray(feats), jnp.asarray(logits)
    ))
    assert out.shape == (1, 4, 4, 6, 3)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[..., :-1]
    np.testing.assert_allclose(
        out[0, :, 2, 3, :], probs[0, 2, 3][:, None] * feats[0, 2, 3][None],
        rtol=1e-5,
    )


def test_trilinear_sample_matches_2d_convention():
    from pdanet_tpu.models.backbones_3d.vfe.image_vfe import trilinear_sample

    rng = np.random.RandomState(1)
    vol = rng.rand(3, 4, 5, 2).astype(np.float32)
    # sample exactly at voxel centers: norm coord of index i (align=False)
    # is (2i + 1)/size - 1
    D, H, W = 3, 4, 5
    for z, y, x in [(0, 0, 0), (2, 3, 4), (1, 2, 2)]:
        gx = (2 * x + 1) / W - 1
        gy = (2 * y + 1) / H - 1
        gz = (2 * z + 1) / D - 1
        got = np.asarray(trilinear_sample(
            jnp.asarray(vol), jnp.asarray([gx]), jnp.asarray([gy]),
            jnp.asarray([gz]),
        ))[0]
        np.testing.assert_allclose(got, vol[z, y, x], rtol=1e-5)
    # far out of bounds -> zeros
    got = np.asarray(trilinear_sample(
        jnp.asarray(vol), jnp.asarray([-2.0]), jnp.asarray([-2.0]),
        jnp.asarray([-2.0]),
    ))[0]
    assert (got == 0).all()


def _calib():
    """Synthetic calib: camera at lidar origin, x_cam = -y_l, y_cam = -z_l,
    z_cam = x_l (standard KITTI-style axes), f = 50, c = (32, 16)."""
    l2c = np.array([
        [0, -1, 0, 0],
        [0, 0, -1, 0],
        [1, 0, 0, 0],
        [0, 0, 0, 1],
    ], np.float32)
    c2i = np.array([
        [50, 0, 32, 0],
        [0, 50, 16, 0],
        [0, 0, 1, 0],
    ], np.float32)
    return l2c, c2i


def test_frustum_to_voxel_geometry():
    from pdanet_tpu.models.backbones_3d.vfe.image_vfe import FrustumToVoxel

    l2c, c2i = _calib()
    D = DISC["num_bins"]
    Hf, Wf = 32, 64
    # frustum volume holding its own (d, v, u) index coordinates
    frustum = np.zeros((1, D, Hf, Wf, 3), np.float32)
    frustum[0, ..., 0] = np.arange(D)[:, None, None]
    frustum[0, ..., 1] = np.arange(Hf)[None, :, None]
    frustum[0, ..., 2] = np.arange(Wf)[None, None, :]

    f2v = FrustumToVoxel(GRID, PC_RANGE, DISC)
    vox = np.asarray(f2v(
        jnp.asarray(frustum), jnp.asarray(l2c)[None], jnp.asarray(c2i)[None],
        (Hf, Wf),
    ))[0]  # (Z, Y, X, 3)
    assert vox.shape == (4, 16, 16, 3)

    # pick an in-frustum voxel center and check the sampled coords
    X, Y, Z = GRID
    vs = (np.array(PC_RANGE[3:]) - np.array(PC_RANGE[:3])) / [X, Y, Z]
    xi, yi, zi = 8, 8, 2
    center = np.array(PC_RANGE[:3]) + (np.array([xi, yi, zi]) + 0.5) * vs
    cam = l2c[:3, :3] @ center
    uvw = c2i @ np.concatenate([cam, [1.0]])
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    depth = uvw[2]
    dbin = float(TU.bin_depths(jnp.asarray(depth), **DISC))
    got = vox[zi, yi, xi]
    if 0 <= u < Wf and 0 <= v < Hf and 0 <= dbin < D:
        # sampled channels ~= the continuous (d, v, u) coords, up to the
        # half-texel shift of align_corners=False on the normalized grid
        assert abs(got[2] - u) < 1.0, (got, u, v, dbin)
        assert abs(got[1] - v) < 1.0, (got, u, v, dbin)
        assert abs(got[0] - dbin) < 1.0, (got, u, v, dbin)


def test_caddn_forward_and_loss():
    model = build_network(
        EasyDict(CADDN_MODEL_CFG), num_class=2,
        grid_size=GRID, voxel_size=(0.4, 0.4, 1.0),
        point_cloud_range=PC_RANGE, class_names=("Car", "Pedestrian"),
    )
    rng = np.random.RandomState(3)
    images = rng.rand(1, 32, 64, 3).astype(np.float32)
    l2c, c2i = _calib()
    l2c, c2i = l2c[None], c2i[None]
    variables = model.init(jax.random.PRNGKey(0), images, l2c, c2i)
    out = jax.jit(
        lambda v, im, a, b: model.apply(v, im, a, b, train=False)
    )(variables, images, l2c, c2i)
    # grid 16 x 16, stride 2 -> 8x8 map, 2 cls x 2 rot = 4 anchors/loc
    assert out["batch_box_preds"].shape == (1, 8 * 8 * 4, 7)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
    # depth logits at the image/4 stride
    assert out["depth_logits"].shape == (1, 8, 16, DISC["num_bins"] + 1)

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [5.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [4.0, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]
    depth_maps = rng.uniform(2, 8, (1, 8, 16)).astype(np.float32)
    boxes2d = np.zeros((1, 2, 4), np.float32)
    boxes2d[0, 0] = [10, 5, 30, 20]
    batch = {
        "images": jnp.asarray(images),
        "trans_lidar_to_cam": jnp.asarray(l2c),
        "trans_cam_to_img": jnp.asarray(c2i),
        "gt_boxes": jnp.asarray(gt),
        "depth_maps": jnp.asarray(depth_maps),
        "gt_boxes2d": jnp.asarray(boxes2d),
    }

    def loss_fn(params):
        def fwd_loss(mdl, b):
            o = mdl.forward_batch(b, train=True)
            return mdl.loss_batch(o, b)

        (loss, tb), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, mutable=["batch_stats"], method=fwd_loss,
        )
        return loss, tb

    (loss, tb), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "ddn_loss" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    vfe_grads = jax.tree_util.tree_leaves(grads["vfe"])
    assert any(float(jnp.abs(g).max()) > 0 for g in vfe_grads)
