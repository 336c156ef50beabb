from .batch import BatchedPyramidDetector
from .mesh import data_parallel_mesh

__all__ = ["BatchedPyramidDetector", "data_parallel_mesh"]
