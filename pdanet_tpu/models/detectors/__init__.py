"""Detector registry (pcdet/models/detectors/__init__.py:30-37)."""

from .centerpoint import CenterPoint
from .iassd import IASSD
from .pointpillar import PointPillar
from .second import SECOND

__all__ = {
    "CenterPoint": CenterPoint,
    "IASSD": IASSD,
    "PointPillar": PointPillar,
    "SECOND": SECOND,
}

#: voxel-pipeline detectors that take grid geometry from the dataset
VOXEL_DETECTORS = ("PointPillar", "SECOND", "CenterPoint")


def build_detector(model_cfg, num_class, input_channels=4, **kwargs):
    return __all__[model_cfg.NAME](
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
        if model_cfg.NAME in VOXEL_DETECTORS:
            kwargs.setdefault(
                "grid_size", tuple(int(x) for x in dataset.grid_size)
            )
            kwargs.setdefault("voxel_size", tuple(dataset.voxel_size))
            kwargs.setdefault(
                "point_cloud_range", tuple(float(x) for x in dataset.point_cloud_range)
            )
            kwargs.setdefault("class_names", tuple(dataset.class_names))
    return build_detector(model_cfg, num_class, input_channels, **kwargs)
