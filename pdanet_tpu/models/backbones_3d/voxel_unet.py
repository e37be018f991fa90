"""UNetV2 voxel backbone — counterpart of
``pcdet/models/backbones_3d/spconv_unet.py`` (:1-212): the Part-A2
encoder-decoder.  Encoder = VoxelBackBone8x stage ladder; decoder = UR
blocks (lateral residual block, concat with bottom-up, merge conv +
pairwise channel-reduction residual, inverse-conv upsample) back to full
resolution; per-voxel features gathered at the input voxel coords.

TPU-first divergence (same policy as voxel_backbone.py): dense
channels-last grids + ordinary ``nn.Conv``/``nn.ConvTranspose`` replace
spconv.  Geometry matches the reference exactly (empty top z plane,
torch pad-1 down alignment, conv4 z pad 0, last_pad 0); the transposed
convs replicate torch ConvTranspose3d gradient-of-conv semantics via
mirrored kernels + explicit ``(k-1-p, k-1-p+op)`` low/high padding
(crop-to-lateral covers the op choice), so converted reference UNetV2
checkpoints land voxel-for-voxel.
"""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax.numpy as jnp

from .voxel_backbone import (
    Conv3DBNReLU,
    DenseMaskedBatchNorm,
    ResBlock3D,
    down_z_pad,
    grid_occupancies,
    pad_top_z,
    scatter_to_dense,
)


def gather_from_dense(grid, voxel_coords):
    """Inverse of ``scatter_to_dense``: read per-voxel rows back.

    Args:
        grid: (B, Z, Y, X, C); voxel_coords: (B, V, 3) zyx, -1 padded.
    Returns:
        (B, V, C) with zeroed padding rows.
    """
    B, Z, Y, X, C = grid.shape
    valid = voxel_coords[..., 0] >= 0
    zs = jnp.clip(voxel_coords[..., 0], 0, Z - 1)
    ys = jnp.clip(voxel_coords[..., 1], 0, Y - 1)
    xs = jnp.clip(voxel_coords[..., 2], 0, X - 1)
    flat = zs * (Y * X) + ys * X + xs
    out = jnp.take_along_axis(
        grid.reshape(B, -1, C), flat[..., None], axis=1
    )
    return jnp.where(valid[..., None], out, 0.0)


def channel_reduction(x, out_channels):
    """Pairwise channel-group sum (spconv_unet.py:146-161)."""
    c_in = x.shape[-1]
    assert c_in % out_channels == 0
    return x.reshape(x.shape[:-1] + (out_channels, c_in // out_channels)).sum(
        axis=-1
    )


class UpConv3D(nn.Module):
    """Inverse conv (SparseInverseConv3d analogue): transposed 3x3x3
    stride-2 conv + BN + ReLU, cropped to the lateral stage's dims.

    ``padding`` follows the torch-equivalence rule ``(k-1-p, k-1-p+op)``
    with op at its maximum (the crop handles smaller true outputs):
    (1, 2) inverts a pad-1 downsample, (2, 3) a pad-0 one (conv4's z).
    flax SAME would place the padding as (2, 1) — one voxel off."""

    features: int
    padding: Any = ((1, 2), (1, 2), (1, 2))

    @nn.compact
    def __call__(self, x, target_shape, train=False, occ=None):
        x = nn.ConvTranspose(
            self.features, kernel_size=(3, 3, 3), strides=(2, 2, 2),
            padding=tuple(self.padding), use_bias=False,
        )(x)
        x = x[:, : target_shape[0], : target_shape[1], : target_shape[2], :]
        if occ is None:
            x = BatchNorm(
                use_running_average=not train, momentum=0.99,
                epsilon=1e-3, name="BatchNorm_0",
            )(x)
        else:
            # SparseInverseConv outputs exactly the fine active set
            x = DenseMaskedBatchNorm(
                momentum=0.99, name="BatchNorm_0")(x, occ, train)
        return nn.relu(x)


class URBlock(nn.Module):
    """UR_block_forward (spconv_unet.py:135-144): conv_up_t residual on
    the lateral, concat bottom-up, conv_up_m merge with a
    channel-reduction residual; the caller applies the upsample."""

    c_mid: int

    @nn.compact
    def __call__(self, lateral, bottom, train=False, occ=None):
        x_trans = ResBlock3D(lateral.shape[-1], name="conv_up_t")(
            lateral, train, occ)
        x = jnp.concatenate([bottom, x_trans], axis=-1)
        x_m = Conv3DBNReLU(self.c_mid, name="conv_up_m")(x, train, occ)
        return x_m + channel_reduction(x, self.c_mid)


class UNetV2(nn.Module):
    """Returns (bev, aux) matching the detector backbone contract; aux
    carries the decoder's per-voxel outputs:
        point_features (B, V, 16), point_valid (B, V) — gathered at the
        input voxel coords (the reference's x_up1 active set)."""

    model_cfg: Any
    input_channels: int
    grid_size: Any  # (nx, ny, nz)

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train=False):
        if voxel_coords is None:  # dynamic VFE: pre-scattered dense grid
            x = pad_top_z(voxel_features)
        else:
            x = scatter_to_dense(voxel_features, voxel_coords, self.grid_size)
        occs = grid_occupancies(x, voxel_coords, self.model_cfg)
        x = Conv3DBNReLU(16, name="conv_input")(x, train, occs[0])
        x1 = Conv3DBNReLU(16, name="conv1")(x, train, occs[0])
        x = Conv3DBNReLU(32, stride=(2, 2, 2), name="conv2_down")(
            x1, train, occs[1])
        x = Conv3DBNReLU(32, name="conv2_a")(x, train, occs[1])
        x2 = Conv3DBNReLU(32, name="conv2_b")(x, train, occs[1])
        x = Conv3DBNReLU(64, stride=(2, 2, 2), name="conv3_down")(
            x2, train, occs[2])
        x = Conv3DBNReLU(64, name="conv3_a")(x, train, occs[2])
        x3 = Conv3DBNReLU(64, name="conv3_b")(x, train, occs[2])
        # conv4 z pad 0 (spconv_unet.py:92 padding=(0, 1, 1))
        z4_pad = down_z_pad(x3.shape[1])
        x = Conv3DBNReLU(
            64, stride=(2, 2, 2), padding=(z4_pad, (1, 1), (1, 1)),
            name="conv4_down")(x3, train, occs[3])
        x = Conv3DBNReLU(64, name="conv4_a")(x, train, occs[3])
        x4 = Conv3DBNReLU(64, name="conv4_b")(x, train, occs[3])

        # encoder output for the detection head (spconv_unet.py:97-106);
        # RETURN_ENCODED_TENSOR: False (PartA2-free) skips it entirely
        if dict(self.model_cfg or {}).get("RETURN_ENCODED_TENSOR", True):
            out = Conv3DBNReLU(
                128, kernel=(3, 1, 1), stride=(2, 1, 1),
                padding=(down_z_pad(x4.shape[1]), (0, 0), (0, 0)),
                name="conv_out",
            )(x4, train, occs[4])
            B, Z, Y, X, C = out.shape
            bev = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(
                B, Y, X, Z * C)
        else:
            bev = None

        # decoder (spconv_unet.py:195-203); inv_conv4 inverts the
        # z-pad-0 downsample.  Decoder active sets are the encoder's
        # per-level sets (inverse convs output the pre-downsample set).
        z4_inv = (2, 3) if z4_pad == (0, 0) else (1, 2)
        u = URBlock(64, name="ur4")(x4, x4, train, occs[3])
        u = UpConv3D(64, padding=(z4_inv, (1, 2), (1, 2)),
                     name="inv_conv4")(u, x3.shape[1:4], train, occs[2])
        u = URBlock(64, name="ur3")(x3, u, train, occs[2])
        u = UpConv3D(32, name="inv_conv3")(u, x2.shape[1:4], train, occs[1])
        u = URBlock(32, name="ur2")(x2, u, train, occs[1])
        u = UpConv3D(16, name="inv_conv2")(u, x1.shape[1:4], train, occs[0])
        u = URBlock(16, name="ur1")(x1, u, train, occs[0])
        x_up1 = Conv3DBNReLU(16, name="conv5")(u, train, occs[0])

        point_features = gather_from_dense(x_up1, voxel_coords)
        aux = {
            "point_features": point_features,
            "point_valid": voxel_coords[..., 0] >= 0,
        }
        return bev, aux
