"""SECOND family tests: dense voxel backbone scatter, forward shapes,
loss gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.utils.easydict import EasyDict

GRID = (32, 32, 8)  # (nx, ny, nz)

SECOND_MODEL_CFG = {
    "NAME": "SECOND",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {
        "NAME": "VoxelBackBone8x",
        "NUM_FILTERS": [4, 4, 8, 8, 8],
        "NUM_OUTPUT_FEATURES": 16,
    },
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 16},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [16, 32], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [16, 16],
    },
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
        "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
             "align_center": False, "feature_map_stride": 8,
             "matched_threshold": 0.6, "unmatched_threshold": 0.45},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
             "align_center": False, "feature_map_stride": 8,
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
}


def _make_inputs(B=1, V=64, P=5, C=4, seed=0):
    rng = np.random.RandomState(seed)
    voxels = rng.rand(B, V, P, C).astype(np.float32)
    nums = rng.randint(1, P + 1, (B, V)).astype(np.int32)
    for b in range(B):
        for v in range(V):
            voxels[b, v, nums[b, v]:] = 0
    nx, ny, nz = GRID
    coords = np.stack(
        [rng.randint(0, nz, (B, V)), rng.randint(0, ny, (B, V)),
         rng.randint(0, nx, (B, V))], axis=-1,
    ).astype(np.int32)
    coords[:, -V // 4:] = -1  # padding tail
    voxels[:, -V // 4:] = 0
    nums[:, -V // 4:] = 0
    return voxels, coords, nums


def _build():
    return build_network(
        EasyDict(SECOND_MODEL_CFG), num_class=2,
        grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )


def test_second_forward_shapes():
    model = _build()
    voxels, coords, nums = _make_inputs()
    params = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, train=False)
    )(params, voxels, coords, nums)
    # grid 32 /8 = 4x4 feature map; 2 classes x 2 rotations = 4 anchors/loc
    n_anchors = 4 * 4 * 4
    assert out["batch_box_preds"].shape == (1, n_anchors, 7)
    assert out["batch_cls_preds"].shape == (1, n_anchors, 2)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_second_loss_and_grads():
    model = _build()
    voxels, coords, nums = _make_inputs(seed=1)
    variables = model.init(jax.random.PRNGKey(1), voxels, coords, nums)
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            voxels, coords, nums, train=True, mutable=["batch_stats"],
        )
        loss, tb = model.apply(
            variables, out, jnp.asarray(gt), ["Car", "Pedestrian"],
            method=model.loss,
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_second_dp_train_step():
    """SECOND through the shared detector-agnostic DP train step (8 virtual
    devices): state replicated, voxel batch sharded, loss finite and
    decreasing on a fixed batch."""
    import optax

    from pdanet_tpu.parallel import make_data_mesh, replicate, shard_batch
    from pdanet_tpu.train.train_utils import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    model = _build()
    voxels, coords, nums = _make_inputs(B=8, V=64, seed=2)
    variables = model.init(
        jax.random.PRNGKey(2), voxels[:1], coords[:1], nums[:1]
    )
    gt = np.zeros((8, 2, 8), np.float32)
    gt[:, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]

    tx = optax.adam(1e-3)
    state = create_train_state(model, variables, tx)
    mesh = make_data_mesh()
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, {
        "voxels": jnp.asarray(voxels),
        "voxel_coords": jnp.asarray(coords),
        "voxel_num_points": jnp.asarray(nums),
        "gt_boxes": jnp.asarray(gt),
    })
    losses = []
    for _ in range(4):
        state, loss, tb = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_dense_conv3d_stride2_torch_alignment():
    """Stride-2 Conv3DBNReLU vs a torch Conv3d(s=2, p=1) twin on an
    EVEN-dim grid — the case where flax SAME splits the padding (0, 1)
    and shifts every window by one.  Pins the torch pad-1 alignment the
    checkpoint converter relies on."""
    import pytest
    torch = pytest.importorskip("torch")

    from pdanet_tpu.models.backbones_3d.voxel_backbone import Conv3DBNReLU

    cin, cout, D = 3, 5, 8
    torch.manual_seed(2)
    conv = torch.nn.Conv3d(cin, cout, 3, stride=2, padding=1, bias=False)
    bn = torch.nn.BatchNorm3d(cout, eps=1e-3, momentum=0.01)
    with torch.no_grad():
        bn.running_mean.uniform_(-0.2, 0.2)
        bn.running_var.uniform_(0.5, 2.0)
    conv.eval(), bn.eval()
    x = np.random.RandomState(4).randn(2, cin, D, D, D).astype(np.float32)
    with torch.no_grad():
        y_ref = torch.relu(bn(conv(torch.from_numpy(x)))).numpy()

    mod = Conv3DBNReLU(cout, stride=(2, 2, 2))
    variables = {
        "params": {
            "Conv_0": {"kernel": jnp.asarray(
                conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0))},
            "BatchNorm_0": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                            "bias": jnp.asarray(bn.bias.detach().numpy())},
        },
        "batch_stats": {
            "BatchNorm_0": {"mean": jnp.asarray(bn.running_mean.numpy()),
                            "var": jnp.asarray(bn.running_var.numpy())},
        },
    }
    y = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                  train=False)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref, atol=3e-5)


def test_dense_backbone_reference_z_chain():
    """At the reference's KITTI z depth (nz=40) the stage chain must be
    41->21->11->5->2 (sparse_shape z+1, conv4 z pad 0, last_pad 0 —
    spconv_backbone.py:75,105,110), so the height-compressed BEV carries
    z_out * C = 2 * C channels, matching what a converted reference
    checkpoint's 2D backbone expects."""
    from pdanet_tpu.models.backbones_3d.voxel_backbone import VoxelBackBone8x

    grid = (16, 16, 40)  # (nx, ny, nz) — tiny xy, reference z depth
    model = VoxelBackBone8x(
        model_cfg={"NUM_FILTERS": [2, 2, 3, 4, 4],
                   "NUM_OUTPUT_FEATURES": 6},
        input_channels=4, grid_size=grid)
    rng = np.random.RandomState(0)
    V = 32
    vox = rng.rand(1, V, 4).astype(np.float32)
    coords = np.stack([rng.randint(0, 40, (1, V)),
                       rng.randint(0, 16, (1, V)),
                       rng.randint(0, 16, (1, V))], axis=-1).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(vox),
                           jnp.asarray(coords))
    bev, multi_scale = model.apply(
        variables, jnp.asarray(vox), jnp.asarray(coords), train=False)
    assert multi_scale["x_conv1"].shape[1] == 41
    assert multi_scale["x_conv2"].shape[1] == 21
    assert multi_scale["x_conv3"].shape[1] == 11
    assert multi_scale["x_conv4"].shape[1] == 5
    assert bev.shape == (1, 2, 2, 2 * 6)  # z_out = 2
