from .eval_utils import eval_one_epoch  # noqa: F401
