from .batch import BatchedPyramidDetector, MultiCascadeBatchedDetector
from .mesh import data_parallel_mesh

__all__ = ["BatchedPyramidDetector", "MultiCascadeBatchedDetector",
           "data_parallel_mesh"]
