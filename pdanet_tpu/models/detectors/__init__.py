"""Detector registry (pcdet/models/detectors/__init__.py:30-37)."""

from .iassd import IASSD

__all__ = {
    "IASSD": IASSD,
}


def build_detector(model_cfg, num_class, input_channels=4):
    return __all__[model_cfg.NAME](
        model_cfg=model_cfg, num_class=num_class, input_channels=input_channels
    )


def build_network(model_cfg, num_class, input_channels=4):
    """Reference signature takes a dataset; here the dataset contract is just
    the input channel count (pcdet/models/__init__.py:20-24)."""
    return build_detector(model_cfg, num_class, input_channels)
