"""Batched, mesh-sharded detection.

The reference processes frames strictly serially (the commented webcam
loop, main.cpp:104-125) and parallelizes only within one frame on one
device.  The TPU-native throughput story is the opposite: batch frames
through one compiled program (the Pallas front/tail kernels carry an
explicit batch grid axis — vmap cannot cross a pallas_call with
ANY-space operands) and shard the batch dimension across a device mesh
with ``shard_map``, so each chip runs the kernels on its local shard.
No collectives are needed: frames shard the batch axis in, fixed-size
packed survivor buffers come back batch-sharded, and the host reads
them with a single transfer (SURVEY.md sections 2.3/2.4).
``detect_stream`` keeps multiple batches in flight so the tunnel's
readback latency and host-side grouping overlap device compute.
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

__all__ = ["BatchedPyramidDetector", "MultiCascadeBatchedDetector"]


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
        self.axis_name = axis_name
        self.det = PyramidDetector(spec, image_shape, **knobs)
        if self.det.n_levels == 0:
            return
        if mesh is not None and batch % mesh.size != 0:
            raise ValueError(f"batch {batch} not divisible by mesh "
                             f"size {mesh.size}")
        self._in_sharding = (NamedSharding(mesh, P(axis_name))
                            if mesh is not None else None)
        self._build_step()

    def _build_step(self):
        """One jitted [B,H,W] -> survivors program.  With a mesh, the
        whole per-frame pipeline runs under ``shard_map`` so the Pallas
        front/tail kernels execute per shard on the local batch (jit
        SPMD shardings cannot partition a pallas_call; shard_map gives
        every chip its own grid).  No collectives are needed — frames
        shard the batch axis and the fixed-size survivor buffers come
        back batch-sharded (SURVEY.md sections 2.3/2.4)."""
        det = self.det

        def step(frames):
            f = det._front_device_batch(frames)
            surv_idx, n_surv = jax.vmap(det._compact_device)(f["front"])
            return det._tail_device_batch(f["planes"], f["vnf"],
                                          surv_idx, n_surv)

        if self.mesh is not None:
            import inspect
            try:
                from jax import shard_map
            except ImportError:        # older jax
                from jax.experimental.shard_map import shard_map
            spec = P(self.axis_name)
            kw = {}
            params = inspect.signature(shard_map).parameters
            # replication checking must be off (outputs are per-shard);
            # the kwarg was renamed check_rep -> check_vma across jax
            # versions
            for name in ("check_rep", "check_vma"):
                if name in params:
                    kw[name] = False
                    break
            self._jit_step = jax.jit(shard_map(
                step, mesh=self.mesh, in_specs=spec, out_specs=spec,
                **kw))
        else:
            self._jit_step = jax.jit(step)
        # one-attribute (program, cap) snapshot: the threaded stream
        # drain can grow the cap and rebuild the step concurrently with
        # the enqueue thread; reading this single tuple gives a
        # consistent pair (reading ._jit_step and .det.cap separately
        # could mix an old program with a new cap and vacuously pass
        # the overflow check on a truncated batch)
        self._step = (self._jit_step, self.det.cap)

    def put(self, frames: np.ndarray) -> jax.Array:
        """Transfer a [B, H, W] uint8 batch, sharded over the mesh."""
        frames = jnp.asarray(frames, jnp.uint8)
        if self._in_sharding is not None:
            frames = jax.device_put(frames, self._in_sharding)
        return frames

    def run_device(self, frames):
        """The compiled [B,H,W] -> padded-survivors step (for timing)."""
        return self._jit_step(frames)

    def detect(self, frames: np.ndarray,
               min_neighbors: int = 3) -> List[DetectionResult]:
        """Full batched detection; grouping per frame on host."""
        if self.det.n_levels == 0:
            empty = np.zeros((0, 4), np.int32)
            return [DetectionResult(empty, np.zeros(0, np.int32), empty,
                                    False) for _ in range(len(frames))]
        dev_frames = self.put(frames)
        dev = self.run_device(dev_frames)
        packed, n_surv = self._read_counts(dev)
        # survivor-cap auto-growth, like the single-frame path
        while bool(np.any(n_surv > self.det.cap)) \
                and self.det.cap < self.det.n_visit:
            self.det.cap = min(self.det.cap * 4, self.det.n_visit)
            self._build_step()
            dev = self.run_device(dev_frames)
            packed, n_surv = self._read_counts(dev)
        return self._finish(len(frames), dev, packed, n_surv,
                            min_neighbors, self.det.cap)

    @staticmethod
    def _read_counts(dev):
        if "packed" in dev:
            p = np.asarray(dev["packed"])   # ONE tunnel readback
            return p, p[:, 0]
        return None, np.asarray(dev["n_surv"])

    def detect_stream(self, batches, min_neighbors: int = 3, depth: int = 2,
                      threaded: bool = True):
        """Pipelined detection over an iterable of [B, H, W] batches.

        Keeps ``depth`` batches in flight so the tunnel's readback/sync
        latency and host-side grouping hide under device compute — the
        throughput analog of the reference's (commented) webcam loop
        (main.cpp:104-125), which processed frames strictly serially.
        Yields one ``List[DetectionResult]`` per input batch, in order.
        A batch that overflows the survivor cap is transparently re-run
        via :meth:`detect` (recompiling at the grown cap).

        With ``threaded`` (default), the drain — the blocking readback
        sync (~25 ms tunnel RTT per batch) plus host grouping — runs on
        a single worker thread, so the enqueue thread never stalls on
        it; round-5 measurement (docs/PERF.md host-phase table) showed
        the serial drain adds 3-8 ms/frame that this overlap removes.
        """
        from collections import deque
        q = deque()
        if not threaded:
            for frames in batches:
                # record the (program, cap) pair in effect at enqueue
                # time: a later batch may overflow and grow det.cap
                # mid-stream, but THIS batch's device result was computed
                # (and truncated) at the old cap — comparing its n_surv
                # against the new, larger cap would silently accept
                # dropped detections
                fn, cap = self._step
                q.append((frames, fn(self.put(frames)), cap))
                if len(q) >= depth:
                    yield self._drain(*q.popleft(), min_neighbors)
            while q:
                yield self._drain(*q.popleft(), min_neighbors)
            return
        from concurrent.futures import ThreadPoolExecutor
        ex = ThreadPoolExecutor(1)  # ONE worker: drains stay ordered and
        try:                        # cap regrowth is serialized
            for frames in batches:
                fn, cap = self._step    # single read = consistent pair
                dev = fn(self.put(frames))
                q.append(ex.submit(self._drain, frames, dev, cap,
                                   min_neighbors))
                if len(q) >= depth:
                    yield q.popleft().result()
            while q:
                yield q.popleft().result()
        finally:
            ex.shutdown(wait=False)

    def _drain(self, frames, dev, cap, min_neighbors):
        packed, n_surv = self._read_counts(dev)
        if bool(np.any(n_surv > cap)) and cap < self.det.n_visit:
            return self.detect(frames, min_neighbors)
        return self._finish(len(frames), dev, packed, n_surv,
                            min_neighbors, cap)

    def _finish(self, n_frames, dev, packed, n_surv, min_neighbors, cap):
        compact_ok = packed is not None
        if compact_ok:
            acap = (packed.shape[1] - 2) // 2
            n_acc = packed[:, 1]
            compact_ok = bool(np.all(n_acc <= acap))
        if not compact_ok:
            out = {k: np.asarray(dev[k]) for k in ("sy", "sx", "ok")}
        results = []
        for b in range(n_frames):
            overflow = bool(n_surv[b] > cap)
            if compact_ok:
                na = int(n_acc[b])
                cand = (self.det.plan.boxes_for(
                            packed[b, 2:2 + na],
                            packed[b, 2 + acap:2 + acap + na])
                        if na else np.zeros((0, 4), np.int32))
            elif out["ok"][b].any():
                ok = out["ok"][b]
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


class MultiCascadeBatchedDetector:
    """Several cascades over one frame batch in ONE compiled program.

    BASELINE config 5 (batched video with profileface + upperbody +
    fullbody): the reference would run ``cvHaarDetectObjects`` once per
    cascade per frame (main.cpp:72-97 times exactly one such call); the
    TPU-native form fuses all K cascades' pyramids into a single jitted
    step over the [B, H, W] batch — one dispatch, one sharded program
    under a mesh, and (when every cascade takes the packed-tail path)
    ONE stacked [B, K, W] readback so K cascades cost one tunnel sync,
    not K.

    Each cascade keeps its own :class:`PyramidDetector` (window sizes
    differ, so canvases, scan lattices, and survivor caps are
    per-cascade); the frame batch is the shared input, uploaded once.
    """

    def __init__(self, specs: List[CascadeSpec],
                 image_shape: Tuple[int, int], batch: int,
                 mesh: Optional[Mesh] = None,
                 axis_name: str = "data", **knobs):
        if not specs:
            raise ValueError("need at least one cascade")
        self.batch = int(batch)
        self.mesh = mesh
        self.axis_name = axis_name
        if mesh is not None and batch % mesh.size != 0:
            raise ValueError(f"batch {batch} not divisible by mesh "
                             f"size {mesh.size}")
        # subs hold per-cascade state (plan, caps, _finish); their own
        # jit steps are never compiled — the combined step below is the
        # only program
        self.subs = [BatchedPyramidDetector(spec, image_shape, batch,
                                            mesh=None, **knobs)
                     for spec in specs]
        self.names = [getattr(s, "name", None) or f"cascade{i}"
                      for i, s in enumerate(specs)]
        self._active = [k for k, s in enumerate(self.subs)
                        if s.det.n_levels > 0]
        self._in_sharding = (NamedSharding(mesh, P(axis_name))
                             if mesh is not None else None)
        self._build_step()

    def _build_step(self):
        dets = [self.subs[k].det for k in self._active]

        def step(frames):
            outs = []
            for det in dets:
                f = det._front_device_batch(frames)
                surv_idx, n_surv = jax.vmap(det._compact_device)(
                    f["front"])
                outs.append(det._tail_device_batch(
                    f["planes"], f["vnf"], surv_idx, n_surv))
            res = {"outs": outs}
            if outs and all("packed" in o for o in outs):
                # fuse K packed buffers into one [B, K, Wmax] array so
                # the host pays ONE ~24ms tunnel sync for all cascades
                ws = [int(o["packed"].shape[1]) for o in outs]
                w = max(ws)
                res["packed_all"] = jnp.stack(
                    [jnp.pad(o["packed"], ((0, 0), (0, w - wk)))
                     for o, wk in zip(outs, ws)], axis=1)
            return res

        if self.mesh is not None:
            import inspect
            try:
                from jax import shard_map
            except ImportError:        # older jax
                from jax.experimental.shard_map import shard_map
            spec = P(self.axis_name)
            kw = {}
            params = inspect.signature(shard_map).parameters
            for name in ("check_rep", "check_vma"):
                if name in params:
                    kw[name] = False
                    break
            self._jit_step = jax.jit(shard_map(
                step, mesh=self.mesh, in_specs=spec, out_specs=spec,
                **kw))
        else:
            self._jit_step = jax.jit(step)
        # single-attribute (program, caps) snapshot — same role as
        # BatchedPyramidDetector._step (threaded-drain consistency)
        self._step = (self._jit_step, self._caps())

    def put(self, frames: np.ndarray) -> jax.Array:
        frames = jnp.asarray(frames, jnp.uint8)
        if self._in_sharding is not None:
            frames = jax.device_put(frames, self._in_sharding)
        return frames

    def run_device(self, frames):
        """The compiled [B,H,W] -> K-cascade survivors step."""
        return self._jit_step(frames)

    def _read(self, dev):
        """Per-active-cascade (packed, n_surv) with one sync when fused."""
        if "packed_all" in dev:
            # de-slice widths from the per-cascade buffers' STATIC shapes
            # (shape metadata costs no transfer) — never from detector
            # state, which a mid-stream cap regrowth may have rebuilt
            # after this dev dict was enqueued
            ws = [int(o["packed"].shape[1]) for o in dev["outs"]]
            p_all = np.asarray(dev["packed_all"])   # ONE tunnel readback
            packed = [p_all[:, j, :w] for j, w in enumerate(ws)]
            return packed, [p[:, 0] for p in packed]
        reads = [BatchedPyramidDetector._read_counts(o)
                 for o in dev["outs"]]
        return [r[0] for r in reads], [r[1] for r in reads]

    def _caps(self):
        return [self.subs[k].det.cap for k in self._active]

    def detect(self, frames: np.ndarray,
               min_neighbors: int = 3) -> List[List[DetectionResult]]:
        """Detect with every cascade; returns results[k][b] indexed by
        cascade then frame (cascades with no pyramid levels at this
        image size return empties)."""
        n = len(frames)
        if not self._active:
            return [self._empty_results(n) for _ in self.subs]
        dev_frames = self.put(frames)
        dev = self.run_device(dev_frames)
        packed, n_surv = self._read(dev)
        # per-cascade survivor-cap auto-growth: grow only the cascades
        # that overflowed, rebuild the fused step once, re-run
        while True:
            grew = False
            for j, k in enumerate(self._active):
                det = self.subs[k].det
                if bool(np.any(n_surv[j] > det.cap)) \
                        and det.cap < det.n_visit:
                    det.cap = min(det.cap * 4, det.n_visit)
                    grew = True
            if not grew:
                break
            self._build_step()
            dev = self.run_device(dev_frames)
            packed, n_surv = self._read(dev)
        return self._finish_all(n, dev, packed, n_surv, min_neighbors,
                                self._caps())

    def _finish_all(self, n, dev, packed, n_surv, min_neighbors, caps):
        results = [self._empty_results(n) for _ in self.subs]
        for j, k in enumerate(self._active):
            results[k] = self.subs[k]._finish(
                n, dev["outs"][j], packed[j], n_surv[j], min_neighbors,
                caps[j])
        return results

    def _empty_results(self, n):
        empty = np.zeros((0, 4), np.int32)
        return [DetectionResult(empty, np.zeros(0, np.int32), empty,
                                False) for _ in range(n)]

    def detect_stream(self, batches, min_neighbors: int = 3,
                      depth: int = 2, threaded: bool = True):
        """Pipelined multi-cascade detection over [B, H, W] batches.

        Yields one ``results[k][b]`` per input batch, in order.  Caps in
        effect at enqueue time are recorded per cascade: a later batch's
        overflow may grow a cap mid-stream, and an in-flight batch
        computed at the old cap must be judged against that old cap
        (otherwise silently truncated survivors would be accepted).
        ``threaded`` drains on a worker thread exactly like
        :meth:`BatchedPyramidDetector.detect_stream`."""
        from collections import deque
        q = deque()
        if not threaded:
            for frames in batches:
                fn, caps = self._step
                q.append((frames, fn(self.put(frames)), caps))
                if len(q) >= depth:
                    yield self._drain(*q.popleft(), min_neighbors)
            while q:
                yield self._drain(*q.popleft(), min_neighbors)
            return
        from concurrent.futures import ThreadPoolExecutor
        ex = ThreadPoolExecutor(1)
        try:
            for frames in batches:
                fn, caps = self._step
                dev = fn(self.put(frames))
                q.append(ex.submit(self._drain, frames, dev, caps,
                                   min_neighbors))
                if len(q) >= depth:
                    yield q.popleft().result()
            while q:
                yield q.popleft().result()
        finally:
            ex.shutdown(wait=False)

    def _drain(self, frames, dev, caps, min_neighbors):
        n = len(frames)
        if not self._active:
            return [self._empty_results(n) for _ in self.subs]
        packed, n_surv = self._read(dev)
        for j, k in enumerate(self._active):
            det = self.subs[k].det
            if bool(np.any(n_surv[j] > caps[j])) and caps[j] < det.n_visit:
                return self.detect(frames, min_neighbors)
        return self._finish_all(n, dev, packed, n_surv, min_neighbors,
                                caps)
