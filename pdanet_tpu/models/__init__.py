"""Model registry (mirrors pcdet.models.build_network, models/__init__.py:20-24)."""

from .detectors import build_detector, build_network  # noqa: F401
