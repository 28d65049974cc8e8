from tpu_pillars.train.state import TrainState, TrainConfig, create_train_state
from tpu_pillars.train.step import TrainBatch, make_train_step, make_eval_forward
from tpu_pillars.train.checkpoint import (
    export_inference_checkpoint, restore_checkpoint, save_checkpoint,
)
from tpu_pillars.train.elastic import (
    GracefulShutdown, Heartbeat, NaNGuard, TrainingDiverged, check_heartbeat)
from tpu_pillars.train.prefetch import prefetch, device_prefetch

__all__ = [
    "TrainState", "TrainConfig", "create_train_state",
    "TrainBatch", "make_train_step", "make_eval_forward",
    "save_checkpoint", "restore_checkpoint", "export_inference_checkpoint",
    "GracefulShutdown", "Heartbeat", "NaNGuard", "TrainingDiverged",
    "check_heartbeat", "prefetch", "device_prefetch",
]
