"""Batched, mesh-sharded detection.

The reference processes frames strictly serially (the commented webcam
loop, main.cpp:104-125) and parallelizes only within one frame on one
device.  The TPU-native throughput story is the opposite: batch frames,
``vmap`` the whole single-frame program (every op in the pyramid detector
is batch-parallel), and shard the batch dimension across a device mesh —
XLA SPMD partitions the program with zero cross-chip traffic until the
host gathers the fixed-size survivor buffers (SURVEY.md sections 2.3/2.4).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..detect.detector import DetectionResult
from ..detect.grouping import group_rectangles
from ..detect.pyramid import PyramidDetector
from ..models.spec import CascadeSpec

__all__ = ["BatchedPyramidDetector"]


class BatchedPyramidDetector:
    """Fixed-batch pyramid detector, optionally sharded over a mesh.

    ``mesh`` (a 1-D ``jax.sharding.Mesh``) shards the batch dimension; the
    batch must be a multiple of the mesh size.  Without a mesh the batch
    runs on the default device.
    """

    def __init__(self, spec: CascadeSpec, image_shape: Tuple[int, int],
                 batch: int,
                 mesh: Optional[Mesh] = None,
                 axis_name: str = "data",
                 **knobs):
        self.batch = int(batch)
        self.mesh = mesh
        if mesh is not None:
            # the Pallas front kernel is not SPMD-partitionable via jit
            # shardings; the sharded path uses the (vmap-safe) XLA front
            knobs.setdefault("use_pallas_front", False)
        self.det = PyramidDetector(spec, image_shape, **knobs)
        if self.det.n_levels == 0:
            return
        # phased like the single-frame path (see PyramidDetector.
        # _tail_device): the tail's gathers need their operands on a jit
        # parameter boundary to hit the fast TPU gather emitter
        front = self.det._front_device_batch
        compact = jax.vmap(self.det._compact_device)
        tail = self.det._tail_device_batch
        if mesh is not None:
            if batch % mesh.size != 0:
                raise ValueError(f"batch {batch} not divisible by mesh "
                                 f"size {mesh.size}")
            shard = NamedSharding(mesh, P(axis_name))
            self._in_sharding = shard
            self._jit_front = jax.jit(front, in_shardings=shard)
        else:
            self._in_sharding = None
            self._jit_front = jax.jit(front)
        self._jit_compact = jax.jit(compact)
        self._jit_tail = jax.jit(tail)

    def put(self, frames: np.ndarray) -> jax.Array:
        """Transfer a [B, H, W] uint8 batch, sharded over the mesh."""
        frames = jnp.asarray(frames, jnp.uint8)
        if self._in_sharding is not None:
            frames = jax.device_put(frames, self._in_sharding)
        return frames

    def run_device(self, frames):
        """The compiled [B,H,W] -> padded-survivors step (for timing)."""
        f = self._jit_front(frames)
        surv_idx, n_surv = self._jit_compact(f["front"])
        return self._jit_tail(f["planes"], f["vnf"], surv_idx, n_surv)

    def detect(self, frames: np.ndarray,
               min_neighbors: int = 3) -> List[DetectionResult]:
        """Full batched detection; grouping per frame on host."""
        if self.det.n_levels == 0:
            empty = np.zeros((0, 4), np.int32)
            return [DetectionResult(empty, np.zeros(0, np.int32), empty,
                                    False) for _ in range(len(frames))]
        dev_frames = self.put(frames)
        out = jax.tree_util.tree_map(
            np.asarray, self.run_device(dev_frames))
        # survivor-cap auto-growth, like the single-frame path
        while bool(np.any(out["n_surv"] > self.det.cap)) \
                and self.det.cap < self.det.n_visit:
            self.det.cap = min(self.det.cap * 4, self.det.n_visit)
            self._jit_compact = jax.jit(jax.vmap(self.det._compact_device))
            self._jit_tail = jax.jit(jax.vmap(self.det._tail_device))
            out = jax.tree_util.tree_map(
                np.asarray, self.run_device(dev_frames))
        results = []
        for b in range(len(frames)):
            ok = out["ok"][b]
            overflow = bool(out["n_surv"][b] > self.det.cap)
            if ok.any():
                cand = self.det.plan.boxes_for(out["sy"][b][ok],
                                               out["sx"][b][ok])
            else:
                cand = np.zeros((0, 4), np.int32)
            if min_neighbors != 0:
                boxes, neigh = group_rectangles(cand, max(min_neighbors, 1),
                                                eps=0.2)
            else:
                boxes, neigh = cand, np.ones(len(cand), np.int32)
            results.append(DetectionResult(boxes=boxes, neighbors=neigh,
                                           candidates=cand,
                                           survivor_overflow=overflow))
        return results
