"""BEV CNN backbone — counterpart of
``pcdet/models/backbones_2d/base_bev_backbone.py``: per-level strided conv
blocks + transposed-conv upsampling, concatenated multi-scale output.

Channels-last (B, H, W, C); the MXU sees every 3x3 conv as an implicit
matmul over C."""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax.numpy as jnp
import numpy as np


class ConvBNReLU(nn.Module):
    features: int
    stride: int = 1
    # flax 0.99 == the reference's torch momentum 0.01
    # (base_bev_backbone.py:37); override via BACKBONE_2D.BN_MOMENTUM
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv",
        )(x)
        x = BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-3, name="bn",
        )(x)
        return nn.relu(x)


class BaseBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int

    @nn.compact
    def __call__(self, x, train=False):
        from ...utils.easydict import EasyDict

        cfg = EasyDict(self.model_cfg)  # linen freezes dict attrs
        layer_nums = list(cfg.get("LAYER_NUMS", []) or [])
        layer_strides = list(cfg.get("LAYER_STRIDES", []) or [])
        num_filters = list(cfg.get("NUM_FILTERS", []) or [])
        upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []) or [])
        num_up_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []) or [])
        bn_m = float(cfg.get("BN_MOMENTUM", 0.99))

        ups = []
        for idx in range(len(layer_nums)):
            x = ConvBNReLU(
                num_filters[idx], stride=layer_strides[idx],
                name=f"blocks_{idx}_down", bn_momentum=bn_m,
            )(x, train)
            for k in range(layer_nums[idx]):
                x = ConvBNReLU(
                    num_filters[idx], name=f"blocks_{idx}_{k}",
                    bn_momentum=bn_m,
                )(x, train)
            if upsample_strides:
                stride = upsample_strides[idx]
                if stride >= 1:
                    u = nn.ConvTranspose(
                        num_up_filters[idx],
                        (int(stride), int(stride)),
                        strides=(int(stride), int(stride)),
                        use_bias=False,
                        name=f"deblocks_{idx}_deconv",
                    )(x)
                else:
                    s = int(np.round(1 / stride))
                    u = nn.Conv(
                        num_up_filters[idx], (s, s), strides=(s, s),
                        use_bias=False, name=f"deblocks_{idx}_conv",
                    )(x)
                u = BatchNorm(
                    use_running_average=not train, momentum=bn_m,
                    epsilon=1e-3, name=f"deblocks_{idx}_bn",
                )(u)
                ups.append(nn.relu(u))
            else:
                ups.append(x)

        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if len(upsample_strides) > len(layer_nums):
            s = int(upsample_strides[-1])
            out = nn.ConvTranspose(
                out.shape[-1], (s, s), strides=(s, s), use_bias=False,
                name="deblocks_final_deconv",
            )(out)
            out = BatchNorm(
                use_running_average=not train, momentum=bn_m, epsilon=1e-3,
                name="deblocks_final_bn",
            )(out)
            out = nn.relu(out)
        return out
