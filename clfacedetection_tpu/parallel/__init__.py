from .sharding import detect_sharded, gather_detections

__all__ = ["detect_sharded", "gather_detections"]
