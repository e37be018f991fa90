from .iassd_backbone import IASSDBackbone  # noqa: F401
