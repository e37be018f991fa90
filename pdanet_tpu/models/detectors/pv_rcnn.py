"""PV-RCNN detector — counterpart of
``pcdet/models/detectors/pv_rcnn.py`` (:1-55): SECOND-style voxel RPN
first stage + VoxelSetAbstraction keypoint features + PointHeadSimple
keypoint segmentation + PVRCNNHead grid-pooled refinement.

TPU notes: raw points ride along with the voxel triplet at a static
``sample_points`` budget (the reference voxelizes unsampled ragged
clouds; a fixed budget is the TPU-static equivalent and the config sets
it at/above the typical in-range point count)."""

from typing import Any

import jax
import jax.numpy as jnp

from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..backbones_3d.pfe.voxel_set_abstraction import (
    VoxelSetAbstraction,
    multi_scale_occupancy,
)
from ..dense_heads.point_head_simple import (
    PointHeadSimpleNet,
    point_head_simple_loss,
)
from ..roi_heads import roi_head_template as RHT
from ..roi_heads.pvrcnn_head import PVRCNNHeadNet
from .second import SECOND


class PVRCNN(SECOND):
    #: this family consumes BOTH the voxel triplet and the raw points
    DEVICE_BATCH_KEYS = (
        "voxels", "voxel_coords", "voxel_num_points", "points", "gt_boxes",
    )

    def setup(self):
        super().setup()
        cfg = EasyDict(self.model_cfg)
        pfe_cfg = cfg.PFE
        object.__setattr__(self, "pfe_cfg", pfe_cfg)
        self.pfe = VoxelSetAbstraction(
            model_cfg=pfe_cfg,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            num_rawpoint_features=self.input_channels,
            name="pfe",
        )
        object.__setattr__(self, "point_cfg", cfg.POINT_HEAD)
        self.point_head = PointHeadSimpleNet(
            model_cfg=cfg.POINT_HEAD, num_class=self.num_class,
            name="point_head",
        )
        roi_cfg = cfg.ROI_HEAD
        object.__setattr__(self, "roi_cfg", roi_cfg)
        coder = build_box_coder(
            roi_cfg.TARGET_CONFIG.BOX_CODER,
            roi_cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {}),
        )
        object.__setattr__(self, "roi_box_coder", coder)
        n_cls = 1 if roi_cfg.get("CLASS_AGNOSTIC", True) else self.num_class
        self.roi_head = PVRCNNHeadNet(
            model_cfg=roi_cfg, code_size=coder.code_size, num_class=n_cls,
            name="roi_head",
        )

    def __call__(self, voxels, voxel_coords, voxel_num_points, points,
                 gt_boxes=None, train=False):
        out = SECOND.__call__(
            self, voxels, voxel_coords, voxel_num_points, train=train
        )

        # first-stage proposals (rois feed both target assign and the VSA)
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

        # VSA keypoint features (voxel_set_abstraction.py:329-411)
        strides = sorted(
            {
                int(EasyDict(self.pfe_cfg).SA_LAYER[s].DOWNSAMPLE_FACTOR)
                for s in self.pfe_cfg.FEATURES_SOURCE
                if s not in ("bev", "raw_points")
            }
        )
        # occupancy pyramid only feeds DENSE-grid voxel sources; sparse
        # backbone entries carry their own active sets (and scattering a
        # full-res bool grid would defeat the sparse formulation)
        voxel_srcs = [
            s for s in self.pfe_cfg.FEATURES_SOURCE
            if s not in ("bev", "raw_points")
        ]
        any_dense = any(
            not isinstance(out["multi_scale_3d_features"][s], tuple)
            for s in voxel_srcs
        )
        occ = (
            multi_scale_occupancy(voxel_coords, self.grid_size, strides)
            if any_dense else {}
        )
        vsa = self.pfe(
            points, out["multi_scale_3d_features"], occ,
            out["spatial_features"], bev_stride=8,
            rois=jax.lax.stop_gradient(rois), train=train,
        )
        out.update(vsa)

        # keypoint segmentation scores (point_head_simple.py:60-100)
        head_in = (
            vsa["point_features_before_fusion"]
            if EasyDict(self.point_cfg).get(
                "USE_POINT_FEATURES_BEFORE_FUSION", False
            )
            else vsa["point_features"]
        )
        point_cls_preds = self.point_head(head_in, train=train)
        point_cls_scores = jnp.max(
            jax.nn.sigmoid(point_cls_preds), axis=-1
        )  # (B, K)
        out["point_cls_preds"] = point_cls_preds
        out["point_cls_scores"] = point_cls_scores

        weighted = vsa["point_features"] * point_cls_scores[..., None]
        rcnn_cls, rcnn_reg = self.roi_head(
            vsa["point_coords"], weighted, jax.lax.stop_gradient(rois),
            train=train,
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
        point_loss, tb_p = point_head_simple_loss(
            forward_out["point_cls_preds"], forward_out["point_coords"],
            gt_boxes, self.point_cfg,
        )
        tb.update(tb_p)
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
        return rpn_loss + point_loss + rcnn_loss, tb

    # --- detector-agnostic batch interface ---

    def forward_batch(self, batch, train=False):
        return self(
            batch["voxels"], batch["voxel_coords"], batch["voxel_num_points"],
            batch["points"], gt_boxes=batch.get("gt_boxes"), train=train,
        )

    def loss_batch(self, forward_out, batch):
        return self.loss(
            forward_out, batch["gt_boxes"], list(self.class_names)
        )


class PVRCNNPlusPlus(PVRCNN):
    """PV-RCNN++ (``pcdet/models/detectors/pv_rcnn_plusplus.py:1-55``):
    identical pipeline; the config swaps in SPC keypoint sampling and
    VectorPoolAggregationModuleMSG aggregation (PFE + RoI grid pool) —
    both dispatched by the shared modules, so this class only provides
    the reference's detector name."""
