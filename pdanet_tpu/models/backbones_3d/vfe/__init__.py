"""VFE registry (pcdet/models/backbones_3d/vfe/__init__.py)."""

from .mean_vfe import MeanVFE  # noqa: F401
from .pillar_vfe import PillarVFE  # noqa: F401
