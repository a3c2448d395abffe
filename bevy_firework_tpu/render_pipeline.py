"""Asynchronous device->host render readback pipeline.

Bevy runs simulation and rendering in pipelined worlds: the render world
draws frame N-1 while the main world simulates frame N, with the extract copy
as the hand-off (`/root/reference/src/render.rs:52-54`).  The TPU analog
(SURVEY.md §7 hard part 6):

  sim thread:    step(N) -> pack(N) dispatched async -> submit(N)
  reader thread: transfers pack(N-1) planes to host, interleaves them into
                 64 B instance records inside the native C++ ring
  render thread: ring.acquire() -> newest ready frame -> draw

Because jax dispatch is asynchronous, `submit` never blocks the simulation
loop; the blocking device->host transfer happens on the reader thread and
overlaps the next frame's device compute. If the renderer falls behind, the
ring drops stale frames (latest-wins), exactly like pipelined extract.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from .native import InstanceRing
from .render import pack_instances_dense, pack_instances_planar


class AsyncRenderReader:
    """Per-spawner-type async readback into native instance rings.

    mode="dense" (default): the device emits full-pool planes with dead lanes
    at scale 0 — that pack fuses into the step kernel for FREE (measured: the
    scatter-based compaction costs 6+ ms at 1M lanes, the dense pack ~0) —
    and the C++ ring compacts live lanes while interleaving on the host.
    mode="compact": device-side prefix-sum compaction; smaller transfers,
    better for sparse pools.
    """

    def __init__(self, capacity: int, num_types: int, n_slots: int = 3, mode: str = "dense"):
        assert mode in ("dense", "compact")
        self.capacity = int(capacity)
        self.num_types = int(num_types)
        self.mode = mode
        self.rings: Dict[int, InstanceRing] = {
            t: InstanceRing(capacity, n_slots) for t in range(num_types)
        }
        self._q: "queue.Queue" = queue.Queue(maxsize=4)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._stop = False
        self._worker.start()

    # ----------------------------------------------------------------- sim
    def submit(self, params, state, frame_id: int):
        """Dispatch packing for every type and enqueue the (still on-device)
        results. Non-blocking: jax returns futures-like arrays immediately."""
        payload = []
        for t in range(self.num_types):
            if self.mode == "dense":
                planes, count = pack_instances_dense(params, state, t)
            else:
                planes, count = pack_instances_planar(params, state, t)
            payload.append(("planar", t, planes, count))
        self._enqueue(frame_id, payload)

    def submit_packed(self, static, state, packed, frame_id: int):
        """Enqueue the fused kernel's in-kernel render pack — no separate
        pack dispatch at all (the pack rode the step kernel for ~free).
        Single-type pools only (can_pack_render).

        packed is either the 9 f32 planes from step_auto_packed (positions
        and rotations then come from the state arrays), or the full f16
        record (12/16 planes, pack_render='f16') — consume that ring via
        acquire_f16."""
        if len(packed) in (12, 16):  # f16 full record
            if len(packed) == 12:  # rotation elided: identity from defaults
                planes16 = tuple(packed[:4]) + (None,) * 4 + tuple(packed[4:])
            else:
                planes16 = tuple(packed)
            self._enqueue(frame_id, [("ptrs16", 0, planes16, None)])
            return
        if static.elide_rotation:
            q = (None, None, None, None)
        else:
            q = (state.qx, state.qy, state.qz, state.qw)
        planes16 = (
            state.px, state.py, state.pz, packed[0],
            q[0], q[1], q[2], q[3],
            packed[1], packed[2], packed[3], packed[4],
            packed[5], packed[6], packed[7], packed[8],
        )
        self._enqueue(frame_id, [("ptrs", 0, planes16, None)])

    def _enqueue(self, frame_id, payload):
        while True:
            try:
                self._q.put_nowait((frame_id, payload))
                break
            except queue.Full:
                # simulation ahead of readback: evict the OLDEST queued frame
                # so the newest always gets through (true latest-wins)
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    pass

    # -------------------------------------------------------------- reader
    def _run(self):
        defaults = [0.0] * 16
        defaults[7] = 1.0  # identity quaternion w
        while not self._stop:
            try:
                frame_id, payload = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            for kind, t, planes, count in payload:
                if kind == "ptrs":
                    host = [None if p is None else np.asarray(p) for p in planes]
                    self.rings[t].publish_dense_planes(host, defaults, frame_id)
                    continue
                if kind == "ptrs16":
                    host = [None if p is None else np.asarray(p) for p in planes]
                    self.rings[t].publish_dense_planes_f16(host, defaults, frame_id)
                    continue
                c = int(count)  # blocks until the device finished this frame
                if c == 0:
                    continue
                host_planes = np.asarray(planes)  # device->host transfer
                if self.mode == "dense":
                    self.rings[t].publish_dense(host_planes, frame_id)
                else:
                    self.rings[t].publish(host_planes[:, :c], c, frame_id)

    # -------------------------------------------------------------- render
    def acquire(self, type_index: int) -> Optional[Tuple[np.ndarray, int]]:
        """Newest ready instance buffer for one type, or None. Call
        `release(type_index)` after uploading/drawing."""
        return self.rings[type_index].acquire()

    def release(self, type_index: int):
        self.rings[type_index].release()

    def close(self):
        self._stop = True
        self._worker.join(timeout=1.0)
        for r in self.rings.values():
            r.close()
