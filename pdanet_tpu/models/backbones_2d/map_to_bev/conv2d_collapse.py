"""Conv2DCollapse — counterpart of
``pcdet/models/backbones_2d/map_to_bev/conv2d_collapse.py`` (:1-38):
flatten the voxel z axis into channels and 1x1-conv down to the BEV
width (CaDDN's MAP_TO_BEV)."""

from typing import Any

import flax.linen as nn
from ...norm import BatchNorm
import jax.numpy as jnp

from ....utils.easydict import EasyDict


class Conv2DCollapse(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, voxel_features, train=False):
        """(B, Z, Y, X, C) -> (B, Y, X, NUM_BEV_FEATURES)."""
        cfg = EasyDict(self.model_cfg)
        args = EasyDict(cfg.get("ARGS", {}))
        B, Z, Y, X, C = voxel_features.shape
        bev = jnp.transpose(voxel_features, (0, 2, 3, 1, 4)).reshape(
            B, Y, X, Z * C
        )
        k = int(args.get("kernel_size", 1))
        bev = nn.Conv(
            int(cfg.NUM_BEV_FEATURES), (k, k),
            strides=(int(args.get("stride", 1)),) * 2,
            use_bias=bool(args.get("bias", False)), padding="SAME",
            name="block",
        )(bev)
        bev = BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn")(bev)
        return nn.relu(bev)
