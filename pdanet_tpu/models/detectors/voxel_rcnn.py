"""Voxel-RCNN detector — counterpart of
``pcdet/models/detectors/voxel_rcnn.py`` (:1-60): SECOND first stage +
VoxelRCNNHead second stage (multi-scale voxel neighbor pooling over RoI
grid points, box refinement with cls + reg + corner losses)."""

from typing import Any

import jax
import jax.numpy as jnp

from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..model_utils.model_nms_utils import batched_nms_candidates
from ..roi_heads import roi_head_template as RHT
from ..roi_heads.voxelrcnn_head import VoxelRCNNHeadNet
from .second import SECOND

_STRIDES = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}


class VoxelRCNN(SECOND):
    def setup(self):
        super().setup()
        roi_cfg = EasyDict(self.model_cfg).ROI_HEAD
        object.__setattr__(self, "roi_cfg", roi_cfg)
        coder = build_box_coder(
            roi_cfg.TARGET_CONFIG.BOX_CODER,
            roi_cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {}),
        )
        object.__setattr__(self, "roi_box_coder", coder)
        n_cls = 1 if roi_cfg.get("CLASS_AGNOSTIC", True) else self.num_class
        self.roi_head = VoxelRCNNHeadNet(
            model_cfg=roi_cfg, code_size=coder.code_size, num_class=n_cls,
            grid_size=self.grid_size, name="roi_head",
        )

    def __call__(self, voxels, voxel_coords, voxel_num_points, gt_boxes=None,
                 train=False):
        out = SECOND.__call__(
            self, voxels, voxel_coords, voxel_num_points, train=train
        )
        nms_cfg = self.roi_cfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        proposals = RHT.proposal_layer(
            jax.lax.stop_gradient(out["batch_cls_preds"]),
            jax.lax.stop_gradient(out["batch_box_preds"]),
            nms_cfg,
        )
        if train:
            assert gt_boxes is not None
            rng = self.make_rng("proposal")
            targets = RHT.assign_targets(
                rng, proposals, gt_boxes, self.roi_cfg.TARGET_CONFIG
            )
            rois = targets["rois"]
            out["roi_targets"] = targets
        else:
            rois = proposals["rois"]
            out["rois"] = rois
            out["roi_labels"] = proposals["roi_labels"]
            out["roi_valid"] = proposals["roi_valid"]

        ms = {
            k: jax.lax.stop_gradient(v)
            for k, v in out["multi_scale_3d_features"].items()
        }
        rcnn_cls, rcnn_reg = self.roi_head(
            ms, _STRIDES, jax.lax.stop_gradient(rois),
            self.voxel_size, self.point_cloud_range, train=train,
        )
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        if not train:
            out["batch_box_preds"] = RHT.decode_roi_boxes(
                rois, rcnn_reg, self.roi_box_coder
            )
            out["batch_cls_preds"] = rcnn_cls
        return out

    def loss(self, forward_out, gt_boxes, class_names):
        rpn_loss, tb = SECOND.loss(self, forward_out, gt_boxes, class_names)
        tb = dict(tb)
        targets = dict(forward_out["roi_targets"])
        targets["rcnn_cls"] = forward_out["rcnn_cls"]
        targets["rcnn_reg"] = forward_out["rcnn_reg"]
        cls_loss, tb_c = RHT.roi_box_cls_loss(
            forward_out["rcnn_cls"], targets["rcnn_cls_labels"],
            self.roi_cfg.LOSS_CONFIG,
        )
        reg_loss, tb_r = RHT.roi_box_reg_loss(
            targets, self.roi_box_coder, self.roi_cfg.LOSS_CONFIG
        )
        tb.update(tb_c)
        tb.update(tb_r)
        rcnn_loss = cls_loss + reg_loss
        tb["rcnn_loss"] = rcnn_loss
        return rpn_loss + rcnn_loss, tb

    # --- detector-agnostic batch interface ---

    def forward_batch(self, batch, train=False):
        return self(
            batch["voxels"], batch["voxel_coords"], batch["voxel_num_points"],
            gt_boxes=batch.get("gt_boxes"), train=train,
        )

    def loss_batch(self, forward_out, batch):
        return self.loss(
            forward_out, batch["gt_boxes"], list(self.class_names)
        )


def post_processing(forward_out, model_cfg):
    """Standard refined-box post-processing: sigmoid quality score, labels
    from the proposal stage (has_class_labels,
    detector3d_template.py:227-233), final rotated NMS."""
    post_cfg = EasyDict(model_cfg).POST_PROCESSING
    scores = jax.nn.sigmoid(jnp.max(forward_out["batch_cls_preds"], axis=-1))
    return batched_nms_candidates(
        forward_out["batch_box_preds"],
        scores,
        forward_out["roi_labels"],
        forward_out["roi_valid"],
        post_cfg.NMS_CONFIG,
        score_thresh=post_cfg.get("SCORE_THRESH", None),
    )
