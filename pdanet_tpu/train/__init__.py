from .optimization import build_optimizer_and_schedule  # noqa: F401
from .train_utils import (  # noqa: F401
    CheckpointError,
    TrainState,
    checkpoint_state,
    create_train_state,
    jit_train_step,
    load_checkpoint,
    load_newest_checkpoint,
    make_train_step,
    restore_train_state,
    save_checkpoint,
    train_model,
)
