from . import iassd_head  # noqa: F401
