"""RoI head registry (pcdet/models/roi_heads/__init__.py)."""

from . import roi_head_template  # noqa: F401
from .second_head import SECONDHeadNet, second_head_iou_loss  # noqa: F401
