"""CenterPoint dense head — counterpart of
``pcdet/models/dense_heads/center_head.py`` (:1-355).

flax / channels-last re-design:
  * ``SeparateHead`` (:11-45): per-target 3x3 conv stacks; the heatmap
    branch's final bias initializes to -2.19 like the reference,
  * target assignment (:105-226): the reference's per-box python loop +
    dynamic-slice gaussian drawing becomes one vectorized full-grid
    evaluation (``centernet_utils.draw_gaussians_dense``) — fixed shapes,
    same values; the per-frame/per-head class filtering becomes masking,
  * losses (:236-263): focal heatmap loss + gathered L1 with code_weights,
  * decode (:265-311): fixed top-K + validity mask; rotated NMS +
    compaction runs batched in the detector post-processing.

The multi-head grouping (CLASS_NAMES_EACH_HEAD) is supported; the shipped
KITTI config uses a single head over all three classes.
"""

from typing import Any, Sequence

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import loss_utils
from ...utils.easydict import EasyDict
from ..model_utils import centernet_utils


class SeparateHead(nn.Module):
    """Per-target conv stacks (center_head.py:11-45)."""

    head_dict: Any  # {name: {out_channels, num_conv}}
    use_bias: bool = False
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train=False):
        out = {}
        for name, spec in self.head_dict.items():
            h = x
            for k in range(int(spec["num_conv"]) - 1):
                h = nn.Conv(
                    x.shape[-1], (3, 3), padding="SAME",
                    use_bias=self.use_bias, name=f"{name}_conv{k}",
                )(h)
                h = BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, name=f"{name}_bn{k}",
                )(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if "hm" in name
                else nn.initializers.zeros
            )
            out[name] = nn.Conv(
                int(spec["out_channels"]), (3, 3), padding="SAME",
                use_bias=True, bias_init=bias_init, name=f"{name}_out",
            )(h)
        return out


class CenterHeadNet(nn.Module):
    """Shared conv + per-group SeparateHeads (center_head.py:48-101)."""

    model_cfg: Any
    num_class_each_head: Sequence[int]
    head_order: Sequence[str]
    head_dict: Any

    @nn.compact
    def __call__(self, spatial_features_2d, train=False):
        cfg = EasyDict(self.model_cfg)
        x = nn.Conv(
            int(cfg.SHARED_CONV_CHANNEL), (3, 3), padding="SAME",
            use_bias=cfg.get("USE_BIAS_BEFORE_NORM", False),
            name="shared_conv",
        )(spatial_features_2d)
        x = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="shared_bn",
        )(x)
        x = nn.relu(x)

        pred_dicts = []
        for idx, n_cls in enumerate(self.num_class_each_head):
            hd = {k: dict(v) for k, v in dict(self.head_dict).items()}
            hd["hm"] = {
                "out_channels": n_cls,
                "num_conv": int(cfg.NUM_HM_CONV),
            }
            pred_dicts.append(
                SeparateHead(
                    head_dict=hd,
                    use_bias=cfg.get("USE_BIAS_BEFORE_NORM", False),
                    name=f"head_{idx}",
                )(x, train)
            )
        return pred_dicts


def assign_targets_single_head(
    gt_boxes, head_class_ids, feature_map_size, feature_map_stride,
    point_cloud_range, voxel_size, gaussian_overlap=0.1, min_radius=2,
):
    """Vectorized ``assign_target_of_single_head`` (center_head.py:105-161).

    Args:
        gt_boxes: (B, M, 8) zero-padded, class id in col 7 (1-based global);
        head_class_ids: (C_head,) 1-based global ids handled by this head.
    Returns dict:
        heatmap (B, H, W, C_head), target_boxes (B, M, 8), inds (B, M),
        mask (B, M) — the object budget is the static gt cap M.
    """
    W, H = int(feature_map_size[0]), int(feature_map_size[1])
    cls = gt_boxes[..., 7].astype(jnp.int32)
    nonzero = jnp.any(gt_boxes[..., 0:7] != 0, axis=-1)
    ids = jnp.asarray(list(head_class_ids), jnp.int32)
    # local (within-head) 1-based class; 0 when not in this head
    local = jnp.sum(
        jnp.where(cls[..., None] == ids, jnp.arange(1, len(ids) + 1,
                                                    dtype=jnp.int32), 0),
        axis=-1,
    )
    in_head = nonzero & (local > 0)

    x, y, z = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
    coord_x = (x - point_cloud_range[0]) / voxel_size[0] / feature_map_stride
    coord_y = (y - point_cloud_range[1]) / voxel_size[1] / feature_map_stride
    coord_x = jnp.clip(coord_x, 0, W - 0.5)
    coord_y = jnp.clip(coord_y, 0, H - 0.5)
    center_int_x = coord_x.astype(jnp.int32)
    center_int_y = coord_y.astype(jnp.int32)

    dx = gt_boxes[..., 3] / voxel_size[0] / feature_map_stride
    dy = gt_boxes[..., 4] / voxel_size[1] / feature_map_stride
    radius = centernet_utils.gaussian_radius(dx, dy, gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), min_radius)

    # reference skip rules (:146-150): degenerate boxes, oob centers
    valid = in_head & (dx > 0) & (dy > 0)
    valid &= (center_int_x >= 0) & (center_int_x <= W)
    valid &= (center_int_y >= 0) & (center_int_y <= H)

    centers_int = jnp.stack([center_int_x, center_int_y], axis=-1)
    hms = []
    for c in range(len(head_class_ids)):
        hms.append(
            centernet_utils.draw_gaussians_dense(
                centers_int, radius, valid & (local == c + 1), (W, H)
            )
        )
    heatmap = jnp.stack(hms, axis=-1)  # (B, H, W, C_head)

    ret = jnp.concatenate(
        [
            (coord_x - center_int_x.astype(jnp.float32))[..., None],
            (coord_y - center_int_y.astype(jnp.float32))[..., None],
            z[..., None],
            jnp.log(jnp.maximum(gt_boxes[..., 3:6], 1e-6)),
            jnp.cos(gt_boxes[..., 6:7]),
            jnp.sin(gt_boxes[..., 6:7]),
        ],
        axis=-1,
    )
    inds = jnp.where(valid, center_int_y * W + center_int_x, 0)
    return {
        "heatmap": heatmap,
        "target_boxes": jnp.where(valid[..., None], ret, 0.0),
        "inds": inds.astype(jnp.int32),
        "mask": valid,
    }


def center_head_loss(pred_dicts, target_dicts, head_order, loss_weights):
    """Focal heatmap + gathered L1 regression (center_head.py:236-263)."""
    total = 0.0
    tb = {}
    code_w = jnp.asarray(loss_weights["code_weights"], jnp.float32)
    for idx, (pred, tgt) in enumerate(zip(pred_dicts, target_dicts)):
        hm = jnp.clip(jax.nn.sigmoid(pred["hm"]), 1e-4, 1 - 1e-4)
        hm_loss = loss_utils.focal_loss_centernet(hm, tgt["heatmap"])
        hm_loss = hm_loss * loss_weights["cls_weight"]

        reg_pred = jnp.concatenate([pred[k] for k in head_order], axis=-1)
        gathered = centernet_utils.gather_feat_2d(reg_pred, tgt["inds"])
        per_dim = loss_utils.reg_loss_centernet(
            gathered, tgt["mask"], tgt["target_boxes"]
        )
        loc_loss = jnp.sum(per_dim * code_w[: per_dim.shape[0]])
        loc_loss = loc_loss * loss_weights["loc_weight"]

        total = total + hm_loss + loc_loss
        tb[f"hm_loss_head_{idx}"] = hm_loss
        tb[f"loc_loss_head_{idx}"] = loc_loss
    tb["rpn_loss"] = total
    return total, tb


def generate_predicted_boxes(
    pred_dicts, class_id_mapping_each_head, post_cfg, point_cloud_range,
    voxel_size, feature_map_stride, head_order,
):
    """Decode every head and concatenate along the candidate axis
    (center_head.py:265-311), fixed shapes + validity masks.

    Returns:
        boxes (B, n_heads*K, 7), scores, labels (1-based global), valid.
    """
    post_cfg = EasyDict(post_cfg)
    K = int(post_cfg.MAX_OBJ_PER_SAMPLE)
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for idx, pred in enumerate(pred_dicts):
        boxes, scores, labels, valid = centernet_utils.decode_bbox_from_heatmap(
            heatmap=jax.nn.sigmoid(pred["hm"]),
            rot_cos=pred["rot"][..., 0:1],
            rot_sin=pred["rot"][..., 1:2],
            center=pred["center"],
            center_z=pred["center_z"],
            dim=jnp.exp(pred["dim"]),
            vel=pred.get("vel") if "vel" in head_order else None,
            point_cloud_range=point_cloud_range,
            voxel_size=voxel_size,
            feature_map_stride=feature_map_stride,
            K=K,
            score_thresh=post_cfg.get("SCORE_THRESH", None),
            post_center_limit_range=post_cfg.POST_CENTER_LIMIT_RANGE,
        )
        mapping = jnp.asarray(
            list(class_id_mapping_each_head[idx]), jnp.int32
        )
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_labels.append(mapping[labels] + 1)  # 1-based global
        all_valid.append(valid)
    return (
        jnp.concatenate(all_boxes, axis=1),
        jnp.concatenate(all_scores, axis=1),
        jnp.concatenate(all_labels, axis=1),
        jnp.concatenate(all_valid, axis=1),
    )
