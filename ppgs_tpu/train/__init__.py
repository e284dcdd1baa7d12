from .core import (
    checkpoint_state,
    load_checkpoint,
    loss,
    make_optimizer,
    make_train_step,
    train,
)
