"""Detector registry (pcdet/models/detectors/__init__.py:30-37)."""

from .caddn import CaDDN
from .centerpoint import CenterPoint
from .iassd import IASSD
from .part_a2 import PartA2Net
from .part_a2_free import PartA2Free
from .point_rcnn import PointRCNN
from .pointpillar import PointPillar
from .pv_rcnn import PVRCNN, PVRCNNPlusPlus
from .second import SECOND
from .second_iou import SECONDNetIoU
from .voxel_rcnn import VoxelRCNN

__all__ = {
    "CaDDN": CaDDN,
    "CenterPoint": CenterPoint,
    "IASSD": IASSD,
    "PartA2Net": PartA2Net,
    "PartA2Free": PartA2Free,
    "PointPillar": PointPillar,
    "PointRCNN": PointRCNN,
    "PVRCNN": PVRCNN,
    "PVRCNNPlusPlus": PVRCNNPlusPlus,
    "SECOND": SECOND,
    "SECONDNetIoU": SECONDNetIoU,
    "VoxelRCNN": VoxelRCNN,
}

#: voxel-pipeline detectors that take grid geometry from the dataset
VOXEL_DETECTORS = (
    "PointPillar", "SECOND", "CenterPoint", "SECONDNetIoU", "VoxelRCNN",
    "PVRCNN", "PartA2Net", "PVRCNNPlusPlus", "PartA2Free", "CaDDN",
)


def get_post_processor(name):
    """Per-detector eval post-processing: fn(forward_out, model_cfg) ->
    fixed-shape pred dict (pred_boxes/scores/labels/counts).  Default is
    the sigmoid+argmax+NMS pipeline of detector3d_template.py:179-285."""
    if name == "CenterPoint":
        from .centerpoint import post_processing as cp_post

        return lambda out, mcfg: cp_post(out, mcfg.DENSE_HEAD.POST_PROCESSING)
    if name == "SECONDNetIoU":
        from .second_iou import post_processing as iou_post

        return iou_post
    if name in ("VoxelRCNN", "PVRCNN", "PVRCNNPlusPlus", "PartA2Net",
                "PointRCNN", "PartA2Free"):
        from .voxel_rcnn import post_processing as refined_post

        return refined_post
    from .iassd import post_processing as default_post

    return lambda out, mcfg: default_post(
        out["batch_cls_preds"], out["batch_box_preds"], mcfg.POST_PROCESSING
    )


def resolve_detector_name(model_cfg):
    """The reference overloads MODEL.NAME 'PointRCNN' for PartA2-free
    (PartA2_free.yaml wires it with a UNetV2 voxel backbone); resolve to
    the dedicated class here."""
    name = model_cfg.NAME
    if (
        name == "PointRCNN"
        and model_cfg.get("BACKBONE_3D", {}).get("NAME") == "UNetV2"
    ):
        return "PartA2Free"
    return name


def build_detector(model_cfg, num_class, input_channels=4, **kwargs):
    return __all__[resolve_detector_name(model_cfg)](
        model_cfg=model_cfg, num_class=num_class, input_channels=input_channels,
        **kwargs
    )


def build_network(model_cfg, num_class, dataset=None, input_channels=4,
                  **kwargs):
    """Mirror of the reference builder (pcdet/models/__init__.py:20-24):
    when a dataset is given, input channels and (for voxel models) grid
    geometry/class names are derived from it."""
    if dataset is not None:
        input_channels = dataset.point_feature_encoder.num_point_features
        if resolve_detector_name(model_cfg) in VOXEL_DETECTORS:
            kwargs.setdefault(
                "grid_size", tuple(int(x) for x in dataset.grid_size)
            )
            kwargs.setdefault("voxel_size", tuple(dataset.voxel_size))
            kwargs.setdefault(
                "point_cloud_range", tuple(float(x) for x in dataset.point_cloud_range)
            )
            kwargs.setdefault("class_names", tuple(dataset.class_names))
    return build_detector(model_cfg, num_class, input_channels, **kwargs)
