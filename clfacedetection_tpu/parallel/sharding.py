"""Explicit SPMD detection with shard_map + ICI collectives.

The runtime package's :class:`BatchedPyramidDetector` relies on XLA's SPMD
partitioner (jit + NamedSharding over the batch axis).  This module is the
explicit counterpart for users who want collective control: the per-chip
program runs under ``jax.shard_map`` and the only cross-chip communication
is one ``all_gather`` of the fixed-size survivor buffers at the end —
the TPU-native replacement for the reference's per-stage host round-trips
(SURVEY.md sections 2.3/2.4: detections gathered once; frames are sharded
per-chip so no halo exchange exists).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["detect_sharded", "gather_detections"]


def detect_sharded(det, frames: jax.Array, mesh: Mesh,
                   axis_name: str = "data") -> Dict[str, jax.Array]:
    """Run a PyramidDetector over a frame batch sharded on ``mesh``.

    ``frames`` is [B, H, W] uint8 with B divisible by the mesh size.  Each
    chip runs the full two-phase program on its local shard; the survivor
    buffers are all-gathered over ICI so every host ends up with the full
    [B, cap] results.
    """
    spec = P(axis_name)

    # the all_gather makes outputs replicated, which shard_map can't
    # statically infer -> disable the replication check
    try:
        smap = partial(jax.shard_map, mesh=mesh, in_specs=spec,
                       out_specs=P(), check_vma=False)
    except TypeError:  # older JAX spelling
        smap = partial(jax.shard_map, mesh=mesh, in_specs=spec,
                       out_specs=P(), check_rep=False)

    @smap
    def run(local_frames):
        f = jax.vmap(det._front_device)(local_frames)
        surv_idx, n_surv = jax.vmap(det._compact_device)(f["front"])
        out = jax.vmap(det._tail_device)(f["planes"], f["vnf"], surv_idx,
                                         n_surv)
        # one collective: gather fixed-size padded survivor buffers
        return jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis_name, axis=0, tiled=True),
            out)

    frames = jax.device_put(frames, NamedSharding(mesh, spec))
    return run(frames)


def gather_detections(out: Dict[str, jax.Array], det, min_neighbors: int = 3):
    """Host-side conversion of gathered survivor buffers to grouped boxes
    per frame (same post-processing as PyramidDetector.detect)."""
    import numpy as np

    from ..detect.detector import DetectionResult
    from ..detect.grouping import group_rectangles

    host = jax.tree_util.tree_map(np.asarray, out)
    results = []
    for b in range(host["ok"].shape[0]):
        ok = host["ok"][b]
        if ok.any():
            cand = det.plan.boxes_for(host["sy"][b][ok], host["sx"][b][ok])
        else:
            cand = np.zeros((0, 4), np.int32)
        if min_neighbors != 0:
            boxes, neigh = group_rectangles(cand, max(min_neighbors, 1),
                                            eps=0.2)
        else:
            boxes, neigh = cand, np.ones(len(cand), np.int32)
        results.append(DetectionResult(
            boxes=boxes, neighbors=neigh, candidates=cand,
            survivor_overflow=bool(host["n_surv"][b] > det.cap)))
    return results
