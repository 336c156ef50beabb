from .detector import DetectionResult, ScaleCascadeDetector
from .grouping import group_rectangles, partition_similar
from .pyramid import PyramidDetector, PyramidPlan
from .reference_impl import RefWindowEvaluator, detect_multi_scale_reference

__all__ = [
    "DetectionResult", "ScaleCascadeDetector",
    "PyramidDetector", "PyramidPlan",
    "group_rectangles", "partition_similar",
    "RefWindowEvaluator", "detect_multi_scale_reference",
]
