"""ImageVFE (CaDDN's camera-only voxel feature encoder) — counterpart of
``pcdet/models/backbones_3d/vfe/image_vfe.py`` (:1-90) and its
``image_vfe_modules``: DepthFFN (`ffn/depth_ffn.py:1-107`),
DDNDeepLabV3 (`ffn/ddn/ddn_template.py:1-160`), DDNLoss + Balancer
(`ffn/ddn_loss/*`), FrustumToVoxel + FrustumGridGenerator + Sampler
(`f2v/*`).

TPU re-design:

* The DDN becomes a self-contained flax ResNet-style encoder with a
  dilated tail and an ASPP-lite classifier (channels-last).  The
  reference bootstraps torchvision's deeplabv3_resnet101 with COCO
  weights — an external artifact unavailable offline; the architecture
  contract (stride-4 256-ch features + D+1 depth logits at the same
  stride) is preserved so a converter can map pretrained weights later.
* Frustum -> voxel resampling is a batched trilinear gather over the
  (D, H, W) frustum volume with the reference's exact coordinate
  pipeline: voxel centers -> lidar -> camera -> image (u, v) +
  LID-binned depth, normalized with the align_corners=True formula but
  sampled with torch grid_sample's align_corners=False unnormalization —
  the reference's (kept) quirk.
"""

from typing import Any

import flax.linen as nn
from ...norm import BatchNorm
import jax
import jax.numpy as jnp
import numpy as np

from ....utils import transform_utils
from ....utils.easydict import EasyDict


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME", use_bias=False,
        )(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x)


class ResBlock2D(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        h = ConvBNReLU(self.features, 3, self.stride, self.dilation,
                       name="c1")(x, train)
        h = nn.Conv(self.features, (3, 3),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", use_bias=False, name="c2")(h)
        h = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=False, name="proj")(x)
        return nn.relu(x + h)


class DDNNet(nn.Module):
    """Depth distribution network: stride-4 feature tap + depth logits
    (ddn_template.py:110-142 contract).  `width` scales the channel
    ladder (256 matches the reference's layer1 features)."""

    num_classes: int  # D + 1
    width: int = 256

    @nn.compact
    def __call__(self, images, train=False):
        """images: (B, H, W, 3) in [0, 1] -> dict(features (B, H/4, W/4,
        width), logits (B, H/4, W/4, num_classes))."""
        # ImageNet normalization (ddn_template.preprocess)
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (images - mean) / std

        x = ConvBNReLU(self.width // 4, 7, 2, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ResBlock2D(self.width, name="layer1_a")(x, train)
        feat = ResBlock2D(self.width, name="layer1_b")(x, train)

        # dilated tail (deeplab output-stride-8 analogue)
        x = ResBlock2D(self.width, stride=2, name="layer2")(feat, train)
        x = ResBlock2D(self.width, dilation=2, name="layer3")(x, train)
        x = ResBlock2D(self.width, dilation=4, name="layer4")(x, train)

        # ASPP-lite classifier: 1x1 + two dilated 3x3 + image pooling
        branches = [
            ConvBNReLU(self.width // 2, 1, name="aspp_1x1")(x, train),
            ConvBNReLU(self.width // 2, 3, dilation=6,
                       name="aspp_d6")(x, train),
            ConvBNReLU(self.width // 2, 3, dilation=12,
                       name="aspp_d12")(x, train),
        ]
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBNReLU(self.width // 2, 1, name="aspp_pool")(gp, train)
        branches.append(jnp.broadcast_to(gp, branches[0].shape))
        h = jnp.concatenate(branches, axis=-1)
        h = ConvBNReLU(self.width // 2, 1, name="aspp_proj")(h, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="cls_out")(h)

        # bilinear upsample to the feature stride (ddn_template.py:131)
        B, Hf, Wf, _ = feat.shape
        logits = jax.image.resize(
            logits, (B, Hf, Wf, self.num_classes), method="bilinear"
        )
        return {"features": feat, "logits": logits}


def create_frustum_features(image_features, depth_logits):
    """Depth-distribution-weighted plane sweep (depth_ffn.py:70-93).

    Args:
        image_features: (B, H, W, C); depth_logits: (B, H, W, D+1).
    Returns:
        (B, D, H, W, C) frustum features.
    """
    probs = jax.nn.softmax(depth_logits, axis=-1)[..., :-1]  # (B, H, W, D)
    out = probs[..., None] * image_features[..., None, :]  # (B, H, W, D, C)
    return jnp.transpose(out, (0, 3, 1, 2, 4))


def trilinear_sample(volume, gx, gy, gz):
    """torch ``F.grid_sample`` 3D, bilinear + zeros padding,
    align_corners=False, channels-last.

    Args:
        volume: (D, H, W, C); gx/gy/gz: (...,) normalized [-1, 1]
            (x indexes W, y indexes H, z indexes D).
    Returns:
        (..., C).
    """
    D, H, W, C = volume.shape
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0
    iz = ((gz + 1.0) * D - 1.0) / 2.0
    x0, y0, z0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    wx, wy, wz = ix - x0, iy - y0, iz - z0

    def tap(zi, yi, xi):
        inside = (
            (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            & (zi >= 0) & (zi < D)
        )
        xs = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        ys = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        zs = jnp.clip(zi, 0, D - 1).astype(jnp.int32)
        return jnp.where(inside[..., None], volume[zs, ys, xs], 0.0)

    out = 0.0
    for dz, fz in ((z0, 1 - wz), (z0 + 1, wz)):
        for dy, fy in ((y0, 1 - wy), (y0 + 1, wy)):
            for dx, fx in ((x0, 1 - wx), (x0 + 1, wx)):
                out = out + tap(dz, dy, dx) * (fz * fy * fx)[..., None]
    return out


class FrustumToVoxel:
    """Frustum -> voxel grid transform (frustum_to_voxel.py:1-57 +
    frustum_grid_generator.py:1-148).  Pure function container (no
    params)."""

    def __init__(self, grid_size, pc_range, disc_cfg):
        self.grid_size = [int(g) for g in grid_size]  # (X, Y, Z)
        self.pc_range = np.asarray(pc_range, np.float32)
        self.disc_cfg = dict(disc_cfg)
        X, Y, Z = self.grid_size
        vs = (self.pc_range[3:] - self.pc_range[:3]) / np.array(
            [X, Y, Z], np.float32
        )
        xs = (np.arange(X) + 0.5) * vs[0] + self.pc_range[0]
        ys = (np.arange(Y) + 0.5) * vs[1] + self.pc_range[1]
        zs = (np.arange(Z) + 0.5) * vs[2] + self.pc_range[2]
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")  # (X, Y, Z)
        self.voxel_centers = jnp.asarray(
            np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        )  # (X*Y*Z, 3) lidar-frame centers

    def __call__(self, frustum_features, lidar_to_cam, cam_to_img,
                 image_shape):
        """Args:
            frustum_features: (B, D, Hf, Wf, C) at the feature stride;
            lidar_to_cam: (B, 4, 4); cam_to_img: (B, 3, 4);
            image_shape: (h, w) of the DEPTH-MAP/feature grid the calib
                pixel coords index (the caller pre-scales cam_to_img).
        Returns:
            (B, Z, Y, X, C) voxel features.
        """
        X, Y, Z = self.grid_size
        num_bins = int(self.disc_cfg["num_bins"])

        def per_frame(frustum, l2c, c2i):
            homo = jnp.concatenate(
                [self.voxel_centers,
                 jnp.ones_like(self.voxel_centers[:, :1])], axis=-1,
            )
            cam = (l2c @ homo.T).T[:, :3]  # (N, 3)
            img, depth = transform_utils.project_to_image(c2i, cam)
            dbin = transform_utils.bin_depths(
                depth, self.disc_cfg["mode"], self.disc_cfg["depth_min"],
                self.disc_cfg["depth_max"], num_bins,
            )
            coords = jnp.concatenate([img, dbin[:, None]], axis=-1)
            shape = jnp.asarray(
                [num_bins, image_shape[0], image_shape[1]], jnp.float32
            )
            norm = transform_utils.normalize_coords(coords, shape)
            norm = jnp.where(jnp.isfinite(norm), norm, -2.0)
            sampled = trilinear_sample(
                frustum, norm[:, 0], norm[:, 1], norm[:, 2]
            )  # (X*Y*Z, C)
            vox = sampled.reshape(X, Y, Z, -1)
            return jnp.transpose(vox, (2, 1, 0, 3))  # (Z, Y, X, C)

        return jax.vmap(per_frame)(frustum_features, lidar_to_cam,
                                   cam_to_img)


class ImageVFE(nn.Module):
    """DepthFFN + FrustumToVoxel (image_vfe.py:1-90)."""

    model_cfg: Any
    grid_size: Any  # (nx, ny, nz)
    point_cloud_range: Any
    depth_downsample_factor: int = 4

    @nn.compact
    def __call__(self, images, lidar_to_cam, cam_to_img, train=False):
        """images: (B, H, W, 3) -> dict(voxel_features (B, Z, Y, X, C),
        depth_logits (B, Hf, Wf, D+1))."""
        cfg = EasyDict(self.model_cfg)
        ffn = EasyDict(cfg.FFN)
        disc = dict(ffn.DISCRETIZE)
        num_bins = int(disc["num_bins"])

        ddn = DDNNet(
            num_classes=num_bins + 1,
            width=int(ffn.get("DDN", {}).get("WIDTH", 256)),
            name="ddn",
        )(images, train)
        feats = ddn["features"]
        depth_logits = ddn["logits"]

        cr = EasyDict(ffn.CHANNEL_REDUCE)
        feats = nn.Conv(
            int(cr.out_channels), (int(cr.kernel_size),) * 2,
            use_bias=bool(cr.get("bias", False)), name="channel_reduce",
        )(feats)
        feats = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="channel_reduce_bn")(feats)
        feats = nn.relu(feats)

        frustum = create_frustum_features(feats, depth_logits)

        f2v = FrustumToVoxel(self.grid_size, self.point_cloud_range, disc)
        # calib pixel coords live on the full image grid; the frustum is
        # at the feature stride -> scale the projection rows
        s = 1.0 / float(self.depth_downsample_factor)
        scale = jnp.asarray([[s], [s], [1.0]], jnp.float32)
        c2i = cam_to_img * scale[None]
        Hf, Wf = feats.shape[1:3]
        voxel_features = f2v(frustum, lidar_to_cam, c2i, (Hf, Wf))
        return {
            "voxel_features": voxel_features,
            "depth_logits": depth_logits,
        }


def ddn_loss(depth_logits, depth_maps, gt_boxes2d, disc_cfg, loss_cfg,
             downsample_factor=4):
    """Focal depth-classification loss with fg/bg balancing
    (ddn_loss.py:49-76 + balancer.py:22-50).

    Args:
        depth_logits: (B, Hf, Wf, D+1); depth_maps: (B, Hf, Wf) already
        downsampled; gt_boxes2d: (B, M, 4) full-image-scale boxes.
    """
    cfg = EasyDict(loss_cfg)
    args = EasyDict(cfg.ARGS) if "ARGS" in cfg else cfg
    num_bins = int(disc_cfg["num_bins"])
    target = transform_utils.bin_depths(
        depth_maps, disc_cfg["mode"], disc_cfg["depth_min"],
        disc_cfg["depth_max"], num_bins, target=True,
    )  # (B, Hf, Wf) in [0, D]
    one_hot = jax.nn.one_hot(target, num_bins + 1)
    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    p_t = jnp.sum(one_hot * jnp.exp(logp), axis=-1)
    alpha = float(args.get("alpha", 0.25))
    gamma = float(args.get("gamma", 2.0))
    ce = -jnp.sum(one_hot * logp, axis=-1)
    focal = alpha * (1.0 - p_t) ** gamma * ce  # (B, Hf, Wf)

    fg = transform_utils.compute_fg_mask(
        gt_boxes2d, focal.shape, downsample_factor
    )
    w_fg = float(args.get("fg_weight", 13.0))
    w_bg = float(args.get("bg_weight", 1.0))
    weights = jnp.where(fg, w_fg, w_bg)
    num_pixels = float(np.prod(focal.shape))
    loss = jnp.sum(focal * weights) / num_pixels
    loss = loss * float(args.get("weight", 3.0))
    return loss, {"ddn_loss": loss}
