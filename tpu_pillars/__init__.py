"""tpu_pillars — a TPU-native lidar 3-D object detection framework.

Brand-new implementation of the capabilities of ``mr3543/3d-Object-Detection``
(a PointPillars detector for the Kaggle Lyft Level-5 competition), re-designed
TPU-first: the whole points -> pillars -> BEV pseudo-image -> boxes pipeline is
one jit-compiled XLA program (Pallas kernels for the irregular hot ops), with
data-parallel evaluation over a ``jax.sharding.Mesh``.

Public API (mirrors the reference's L5 surface, SURVEY.md section 1):
    >>> from tpu_pillars import PillarsConfig, Detector
    >>> det = Detector(config, params)
    >>> boxes: list[Box3D] = det.predict(points)   # one lidar sweep -> boxes
"""

from tpu_pillars.config import PillarsConfig, ClassSpec, LYFT_CLASSES, tiny_config
from tpu_pillars.geometry.boxes import Box3D

__version__ = "0.1.0"

__all__ = [
    "PillarsConfig",
    "ClassSpec",
    "LYFT_CLASSES",
    "tiny_config",
    "Box3D",
    "Detector",
]


def __getattr__(name):
    # lazy: importing tpu_pillars must not pull in jax/flax model code
    if name == "Detector":
        from tpu_pillars.detector import Detector
        return Detector
    raise AttributeError(name)
