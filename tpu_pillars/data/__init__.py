from tpu_pillars.data.synthetic import SyntheticScene, make_scene
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.data.stream import SweepAccumulator
from tpu_pillars.data.augment import AugmentConfig, augment_scene
from tpu_pillars.data.gt_sampler import (
    GTDatabase, GTSampleConfig, GTSampler,
)
from tpu_pillars.data.submission import (
    parse_prediction_string, prediction_string, write_submission,
)

__all__ = [
    "SweepAccumulator",
    "SyntheticScene", "make_scene", "LyftDataset",
    "AugmentConfig", "augment_scene",
    "GTDatabase", "GTSampleConfig", "GTSampler",
    "prediction_string", "parse_prediction_string", "write_submission",
]
