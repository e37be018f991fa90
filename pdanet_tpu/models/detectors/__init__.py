"""Detector registry (pcdet/models/detectors/__init__.py:30-37)."""

from .iassd import IASSD
from .pointpillar import PointPillar

__all__ = {
    "IASSD": IASSD,
    "PointPillar": PointPillar,
}


def build_detector(model_cfg, num_class, input_channels=4, **kwargs):
    return __all__[model_cfg.NAME](
        model_cfg=model_cfg, num_class=num_class, input_channels=input_channels,
        **kwargs
    )


def build_network(model_cfg, num_class, input_channels=4, **kwargs):
    """Reference signature takes a dataset; here the dataset contract is the
    input channel count plus (for voxel models) grid geometry
    (pcdet/models/__init__.py:20-24)."""
    return build_detector(model_cfg, num_class, input_channels, **kwargs)
