"""clfacedetection_tpu — a TPU-native Viola-Jones object-detection framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference CLFaceDetection project (OpenCL Haar-cascade detection benchmarked
against OpenCV 2.4's ``cvHaarDetectObjects``): cascade model loading and
compilation, fused grayscale + integral-image kernels, multi-scale
sliding-window cascade evaluation, rectangle grouping, and an
OpenCV-compatible ``CascadeClassifier`` API — built TPU-first (static
shapes, masked dense evaluation, mesh data-parallelism over frames).
"""

__version__ = "0.1.0"

from .models import CascadeSpec, load_cascade, CASCADE_NAMES
from .api import CascadeClassifier, detect_objects, WeightedRect

__all__ = [
    "CascadeSpec", "load_cascade", "CASCADE_NAMES",
    "CascadeClassifier", "detect_objects", "WeightedRect", "__version__",
]
