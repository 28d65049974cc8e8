from tpu_pillars.data.synthetic import SyntheticScene, make_scene
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.data.augment import AugmentConfig, augment_scene
from tpu_pillars.data.submission import (
    parse_prediction_string, prediction_string, write_submission,
)

__all__ = [
    "SyntheticScene", "make_scene", "LyftDataset",
    "AugmentConfig", "augment_scene",
    "prediction_string", "parse_prediction_string", "write_submission",
]
