"""Device-mesh construction.

The reference's device layer is CLUtil's OpenCL bootstrap (one context +
in-order queue per GPU, SURVEY.md L0); the TPU-native equivalent is a
``jax.sharding.Mesh``.  Detection is embarrassingly parallel over frames
(SURVEY.md section 2.3: the only cross-device traffic is the final gather
of fixed-size detection buffers), so the canonical mesh is a single
"data" axis over all chips, with frames sharded along it and ICI carrying
only the [B, cap] survivor buffers back.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["data_parallel_mesh"]


def data_parallel_mesh(devices: Optional[Sequence] = None,
                       axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))
