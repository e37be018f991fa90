"""AnchorHeadMulti — counterpart of
``pcdet/models/dense_heads/anchor_head_multi.py`` (:1-373): grouped
multi-head anchor prediction (shared 3x3 conv, one SingleHead per class
group, optional separate per-regression-target conv branches).

Layout contract (everything downstream depends on it): anchors flatten
HEAD-major, each head location-major with its classes interleaved per
location — exactly the order produced by concatenating each head's
(B, H, W, A_h * code) conv output reshaped to (B, -1, code).
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import loss_utils
from ...utils.easydict import EasyDict
from . import anchor_head as AH


def build_head_groups(rpn_head_cfgs, class_names):
    """Per head, the 0-based indices of its classes in ``class_names``."""
    return [
        [list(class_names).index(n) for n in cfg["HEAD_CLS_NAME"]]
        for cfg in rpn_head_cfgs
    ]


def multihead_flat_anchors(per_class_anchors, head_groups):
    """Head-major flat anchors + per-head anchor counts.

    Args:
        per_class_anchors: list of (nz, ny, nx, A_loc_c, 7) numpy arrays
            in class order; head_groups: list of class-index lists.
    Returns:
        flat (A_total, 7) jnp array, [A_head_0, A_head_1, ...] counts.
    """
    flats, counts = [], []
    for grp in head_groups:
        cat = np.concatenate([per_class_anchors[c] for c in grp], axis=-3)
        flat = np.asarray(cat).reshape(-1, cat.shape[-1])
        flats.append(flat)
        counts.append(flat.shape[0])
    return jnp.asarray(np.concatenate(flats, axis=0)), counts


def assign_targets_multi(per_class_anchors, head_groups, gt_boxes,
                         class_ids, thresholds, box_coder):
    """Per-head target assignment concatenated in the layout order."""
    labels_list, targets_list = [], []
    for grp in head_groups:
        t = AH.assign_targets(
            [per_class_anchors[c] for c in grp], gt_boxes,
            [class_ids[c] for c in grp], [thresholds[c] for c in grp],
            box_coder,
        )
        labels_list.append(t["box_cls_labels"])
        targets_list.append(t["box_reg_targets"])
    labels = jnp.concatenate(labels_list, axis=1)
    targets = jnp.concatenate(targets_list, axis=1)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": targets,
        "reg_weights": (labels > 0).astype(jnp.float32),
    }


class SingleHeadNet(nn.Module):
    """One class-group head (anchor_head_multi.py:9-148): plain 1x1 cls /
    box / dir convs, or separate 3x3 regression branches per target when
    SEPARATE_REG_CONFIG is given."""

    num_out_class: int
    num_anchors_per_location: int
    code_size: int
    use_direction_classifier: bool = False
    num_dir_bins: int = 2
    separate_reg_config: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        a = self.num_anchors_per_location
        bias_init = nn.initializers.constant(-np.log((1 - 0.01) / 0.01))
        if self.separate_reg_config is None:
            cls_preds = nn.Conv(
                a * self.num_out_class, (1, 1), name="conv_cls",
                bias_init=bias_init,
            )(x)
            box_preds = nn.Conv(
                a * self.code_size, (1, 1), name="conv_box"
            )(x)
        else:
            scfg = EasyDict(self.separate_reg_config)
            n_mid = int(scfg.NUM_MIDDLE_CONV)
            c_mid = int(scfg.NUM_MIDDLE_FILTER)

            def branch(x, n_out, prefix, final_bias_init=None):
                for k in range(n_mid):
                    x = nn.Conv(c_mid, (3, 3), padding="SAME",
                                use_bias=False, name=f"{prefix}_mid{k}")(x)
                    x = BatchNorm(
                        use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, name=f"{prefix}_bn{k}",
                    )(x)
                    x = nn.relu(x)
                kw = {}
                if final_bias_init is not None:
                    kw["bias_init"] = final_bias_init
                return nn.Conv(n_out, (3, 3), padding="SAME",
                               name=f"{prefix}_out", **kw)(x)

            cls_preds = branch(
                x, a * self.num_out_class, "cls", final_bias_init=bias_init
            )
            reg_outs, total = [], 0
            for reg in scfg.REG_LIST:
                reg_name, reg_ch = reg.split(":")
                reg_ch = int(reg_ch)
                total += reg_ch
                reg_outs.append(branch(x, a * reg_ch, f"reg_{reg_name}"))
            assert total == self.code_size, (total, self.code_size)
            # interleave per anchor: each branch is (B, H, W, a*ch) —
            # regroup to (B, H, W, a, code) so the flat order matches the
            # single-conv layout
            B, H, W = cls_preds.shape[:3]
            box_preds = jnp.concatenate(
                [r.reshape(B, H, W, a, -1) for r in reg_outs], axis=-1
            ).reshape(B, H, W, a * self.code_size)

        dir_preds = None
        if self.use_direction_classifier:
            dir_preds = nn.Conv(
                a * self.num_dir_bins, (1, 1), name="conv_dir_cls"
            )(x)
        return cls_preds, box_preds, dir_preds


class AnchorHeadMultiNet(nn.Module):
    """Shared conv + grouped heads (anchor_head_multi.py:150-242).

    Returns per-head pred lists; use ``concat_head_preds`` for the flat
    (B, A_total, ...) views.
    """

    model_cfg: Any
    head_groups: Sequence[Sequence[int]]
    num_anchors_per_loc_per_class: Sequence[int]
    code_size: int
    num_class: int

    @nn.compact
    def __call__(self, spatial_features_2d, train=False):
        cfg = EasyDict(self.model_cfg)
        x = spatial_features_2d
        if cfg.get("SHARED_CONV_NUM_FILTER") is not None:
            x = nn.Conv(int(cfg.SHARED_CONV_NUM_FILTER), (3, 3),
                        padding="SAME", use_bias=False, name="shared_conv")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name="shared_bn")(x)
            x = nn.relu(x)

        separate = bool(cfg.get("SEPARATE_MULTIHEAD", False))
        outs = []
        for h, grp in enumerate(self.head_groups):
            n_a = sum(self.num_anchors_per_loc_per_class[c] for c in grp)
            n_cls = len(grp) if separate else self.num_class
            outs.append(
                SingleHeadNet(
                    num_out_class=n_cls,
                    num_anchors_per_location=n_a,
                    code_size=self.code_size,
                    use_direction_classifier=cfg.get(
                        "USE_DIRECTION_CLASSIFIER", False
                    ),
                    num_dir_bins=int(cfg.get("NUM_DIR_BINS", 2)),
                    separate_reg_config=cfg.get("SEPARATE_REG_CONFIG"),
                    name=f"head_{h}",
                )(x, train)
            )
        return outs


def concat_head_preds(head_outs, head_groups, num_class, code_size,
                      num_dir_bins, separate):
    """Flatten per-head conv maps to the (B, A_total, ...) layout.

    separate heads predict only their local classes; their columns scatter
    into the global class axis (other columns forced to -inf logits so
    downstream argmax/sigmoid-max semantics match the reference's
    per-head NMS with head_label_indices)."""
    cls_list, box_list, dir_list = [], [], []
    for (cls_p, box_p, dir_p), grp in zip(head_outs, head_groups):
        B = cls_p.shape[0]
        n_cls = len(grp) if separate else num_class
        cls_flat = cls_p.reshape(B, -1, n_cls)
        if separate:
            full = jnp.full(
                cls_flat.shape[:2] + (num_class,), -1e9, cls_flat.dtype
            )
            full = full.at[..., jnp.asarray(list(grp))].set(cls_flat)
            cls_flat = full
        cls_list.append(cls_flat)
        box_list.append(box_p.reshape(B, -1, code_size))
        if dir_p is not None:
            dir_list.append(dir_p.reshape(B, -1, num_dir_bins))
    cls_preds = jnp.concatenate(cls_list, axis=1)
    box_preds = jnp.concatenate(box_list, axis=1)
    dir_preds = jnp.concatenate(dir_list, axis=1) if dir_list else None
    return cls_preds, box_preds, dir_preds


def anchor_head_multi_loss(head_outs, head_groups, head_anchor_counts,
                           targets, anchors_flat, num_class, loss_weights,
                           code_size, dir_offset=0.78539, num_dir_bins=2,
                           separate=False):
    """Multi-head cls/box/dir losses (anchor_head_multi.py:246-373):
    per-head cls focal over the head's own class columns with optional
    pos/neg class weighting; box + dir losses over the concatenated
    layout (identical math to the single head)."""
    labels = targets["box_cls_labels"]  # (B, A_total) global ids
    reg_targets = targets["box_reg_targets"]
    B = labels.shape[0]

    pos_w = loss_weights.get("pos_cls_weight", 1.0)
    neg_w = loss_weights.get("neg_cls_weight", 1.0)
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (
        neg_w * negatives.astype(jnp.float32)
        + pos_w * positives.astype(jnp.float32)
    )
    pos_norm = jnp.clip(
        jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), 1.0
    )
    cls_weights = cls_weights / pos_norm
    one_hot_full = jax.nn.one_hot(
        jnp.where(labels >= 0, labels, 0), num_class + 1, dtype=jnp.float32
    )[..., 1:]

    cls_loss = 0.0
    start = 0
    for (cls_p, _, _), grp, count in zip(
        head_outs, head_groups, head_anchor_counts
    ):
        n_cls = len(grp) if separate else num_class
        cls_flat = cls_p.reshape(B, -1, n_cls)
        sl = slice(start, start + count)
        one_hot = one_hot_full[:, sl]
        if separate:
            one_hot = one_hot[..., jnp.asarray(list(grp))]
        cls_loss = cls_loss + jnp.sum(
            loss_utils.sigmoid_focal_loss(
                cls_flat, one_hot, cls_weights[:, sl]
            )
        )
        start += count
    cls_loss = cls_loss / B * loss_weights["cls_weight"]

    reg_weights = positives.astype(jnp.float32) / pos_norm
    box_preds = jnp.concatenate(
        [o[1].reshape(B, -1, code_size) for o in head_outs], axis=1
    )
    bp_sin, rt_sin = AH.add_sin_difference(box_preds, reg_targets)
    loc_loss = jnp.sum(
        loss_utils.weighted_smooth_l1_loss(
            bp_sin, rt_sin, weights=reg_weights,
            code_weights=loss_weights.get("code_weights"),
        )
    ) / B * loss_weights["loc_weight"]

    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    total = cls_loss + loc_loss
    dir_list = [o[2] for o in head_outs if o[2] is not None]
    if dir_list:
        dir_preds = jnp.concatenate(
            [d.reshape(B, -1, num_dir_bins) for d in dir_list], axis=1
        )
        anchors_b = jnp.broadcast_to(
            anchors_flat[None], (B,) + anchors_flat.shape
        )
        dir_targets = AH.get_direction_target(
            anchors_b, reg_targets, dir_offset, num_dir_bins
        )
        dir_one_hot = jax.nn.one_hot(dir_targets, num_dir_bins)
        logp = jax.nn.log_softmax(dir_preds, axis=-1)
        dir_loss = -jnp.sum(dir_one_hot * logp, axis=-1) * reg_weights
        dir_loss = jnp.sum(dir_loss) / B * loss_weights.get(
            "dir_weight", 0.2
        )
        tb["rpn_loss_dir"] = dir_loss
        total = total + dir_loss
    tb["rpn_loss"] = total
    return total, tb
