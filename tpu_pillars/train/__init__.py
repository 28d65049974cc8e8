from tpu_pillars.train.state import TrainState, TrainConfig, create_train_state
from tpu_pillars.train.step import TrainBatch, make_train_step, make_eval_forward
from tpu_pillars.train.checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "TrainState", "TrainConfig", "create_train_state",
    "TrainBatch", "make_train_step", "make_eval_forward",
    "save_checkpoint", "restore_checkpoint",
]
