from tpu_pillars.models.pointpillars import PointPillars, ModelOutputs
from tpu_pillars.models.pfn import PillarFeatureNet, MaskedBatchNorm
from tpu_pillars.models.backbone import RPNBackbone
from tpu_pillars.models.head import SSDHead

__all__ = [
    "PointPillars", "ModelOutputs", "PillarFeatureNet", "MaskedBatchNorm",
    "RPNBackbone", "SSDHead",
]
