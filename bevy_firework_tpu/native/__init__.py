"""Native (C++) render-bridge runtime bindings.

Builds `instance_ring.cpp` on first import (g++ -O3 -shared), binds it via
ctypes, and exposes `InstanceRing` — the double-buffered host-side hand-off
of packed instance buffers from simulation to renderer (the TPU analog of
the reference's per-frame vertex-buffer upload + pipelined extract,
`/root/reference/src/render.rs:52-54,568-584`).

Falls back to a pure-numpy implementation when no compiler is available, so
the library never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "instance_ring.cpp")
_SO = os.path.join(_HERE, "_instance_ring.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_capacity.restype = ctypes.c_int64
        lib.ring_capacity.argtypes = [ctypes.c_void_p]
        lib.ring_begin_write.restype = ctypes.c_int
        lib.ring_begin_write.argtypes = [ctypes.c_void_p]
        lib.ring_slot_data.restype = ctypes.POINTER(ctypes.c_float)
        lib.ring_slot_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ring_publish_planar.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.ring_publish_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.ring_publish_dense.restype = ctypes.c_int64
        lib.ring_publish_dense.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.ring_publish_dense_f16.restype = ctypes.c_int64
        lib.ring_publish_dense_f16.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.ring_acquire.restype = ctypes.c_int
        lib.ring_acquire.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ring_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.transpose_planes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.compact_dense.restype = ctypes.c_int64
        lib.compact_dense.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.compact_dense_ptrs.restype = ctypes.c_int64
        lib.compact_dense_ptrs.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.ring_publish_dense_ptrs.restype = ctypes.c_int64
        lib.ring_publish_dense_ptrs.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.ring_publish_dense_ptrs_f16.restype = ctypes.c_int64
        lib.ring_publish_dense_ptrs_f16.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class InstanceRing:
    """Double-buffered instance hand-off.

    Producer side (simulation loop):
        slot = ring.publish(planes, count, frame_id)   # planes: [16, M] f32
    Consumer side (render loop, possibly another thread):
        view = ring.acquire()       # -> (instances [count,16] view, frame_id)
        ...upload / draw...
        ring.release()

    If the consumer falls behind, the producer overwrites the oldest ready
    slot — only the latest frame is rendered, like Bevy's pipelined extract.
    """

    def __init__(self, capacity: int, n_slots: int = 3):
        self._lib = get_lib()
        self.capacity = int(capacity)
        self.n_slots = int(n_slots)
        self._acquired = None
        if self._lib is not None:
            self._h = self._lib.ring_create(self.capacity, self.n_slots)
        else:  # numpy fallback (single lock guards slot state transitions)
            import threading

            self._h = None
            self._lock = threading.Lock()
            self._bufs = [np.zeros((self.capacity, 16), np.float32) for _ in range(n_slots)]
            self._state = [0] * n_slots
            self._meta = [(0, -1)] * n_slots

    def _fallback_claim_slot(self):
        """Free slot, else steal the oldest ready one (latest-wins), else -1."""
        with self._lock:
            if 0 in self._state:
                slot = self._state.index(0)
            else:
                ready = [(self._meta[i][1], i) for i in range(self.n_slots) if self._state[i] == 2]
                if not ready:
                    return -1
                slot = min(ready)[1]
            self._state[slot] = 1
            return slot

    def close(self):
        if self._lib is not None and self._h:
            self._lib.ring_destroy(self._h)
            self._h = None

    # ------------------------------------------------------------- producer
    def publish(self, planes: np.ndarray, count: int, frame_id: int) -> int:
        """planes: [16, M] f32 (component-planar, the device's fast output
        layout); interleaves into the 64 B/particle contract records."""
        planes = np.ascontiguousarray(planes, dtype=np.float32)
        count = min(int(count), self.capacity, planes.shape[1])
        if self._lib is not None:
            slot = self._lib.ring_begin_write(self._h)
            self._lib.ring_publish_planar(self._h, slot, _fptr(planes), planes.shape[1], count, frame_id)
            return slot
        slot = self._fallback_claim_slot()
        if slot < 0:
            return -1
        self._bufs[slot][:count] = planes[:, :count].T
        with self._lock:
            self._meta[slot] = (count, frame_id)
            self._state[slot] = 2
        return slot

    def publish_dense(self, planes: np.ndarray, frame_id: int) -> int:
        """planes: [16, N] covering every pool lane with dead lanes at
        scale == 0 (the `pack_instances_dense` output): compacts live lanes
        while interleaving. Returns the slot index (live count is carried to
        the consumer via acquire)."""
        planes = np.ascontiguousarray(planes, dtype=np.float32)
        if self._lib is not None:
            slot = self._lib.ring_begin_write(self._h)
            self._lib.ring_publish_dense(self._h, slot, _fptr(planes), planes.shape[1], planes.shape[1], frame_id)
            return slot
        live = planes[3] != 0.0
        rows = planes[:, live].T[: self.capacity]
        slot = self._fallback_claim_slot()
        if slot < 0:
            return -1
        self._bufs[slot][: len(rows)] = rows
        with self._lock:
            self._meta[slot] = (len(rows), frame_id)
            self._state[slot] = 2
        return slot

    def publish_dense_planes(self, planes, defaults, frame_id: int) -> int:
        """publish_dense from 16 SEPARATE [N] f32 plane arrays (None => the
        constant defaults[p]); the in-kernel render-pack hand-off. Compacts
        live lanes (plane 3 scale != 0) while interleaving."""
        arrs = [None if p is None else np.ascontiguousarray(p, dtype=np.float32) for p in planes]
        n = arrs[3].shape[0]
        if self._lib is not None:
            ptr_t = ctypes.POINTER(ctypes.c_float)
            ptrs = (ptr_t * 16)(*[
                (a.ctypes.data_as(ptr_t) if a is not None else ptr_t()) for a in arrs
            ])
            dflt = np.asarray(defaults, dtype=np.float32)
            slot = self._lib.ring_begin_write(self._h)
            self._lib.ring_publish_dense_ptrs(self._h, slot, ptrs, _fptr(dflt), n, frame_id)
            return slot
        live = arrs[3] != 0.0
        count = min(int(live.sum()), self.capacity)
        slot = self._fallback_claim_slot()
        if slot < 0:
            return -1
        buf = self._bufs[slot]
        for p in range(16):
            col = arrs[p][live][:count] if arrs[p] is not None else np.float32(defaults[p])
            buf[:count, p] = col
        with self._lock:
            self._meta[slot] = (count, frame_id)
            self._state[slot] = 2
        return slot

    def publish_dense_planes_f16(self, planes, defaults, frame_id: int) -> int:
        """publish_dense_planes for float16 plane arrays (None => the f16
        defaults[p]); the slot then holds f16 rows — consume via
        acquire_f16. Halves the hand-off bandwidth (32 B/particle)."""
        arrs = [None if p is None else np.ascontiguousarray(p, dtype=np.float16) for p in planes]
        n = arrs[3].shape[0]
        dflt16 = np.asarray(defaults, dtype=np.float16).view(np.uint16)
        if self._lib is not None:
            ptr_t = ctypes.POINTER(ctypes.c_uint16)
            ptrs = (ptr_t * 16)(*[
                (a.view(np.uint16).ctypes.data_as(ptr_t) if a is not None else ptr_t())
                for a in arrs
            ])
            slot = self._lib.ring_begin_write(self._h)
            self._lib.ring_publish_dense_ptrs_f16(
                self._h, slot, ptrs, dflt16.ctypes.data_as(ptr_t), n, frame_id
            )
            return slot
        live = (arrs[3].view(np.uint16) & 0x7FFF) != 0
        count = min(int(live.sum()), self.capacity)
        slot = self._fallback_claim_slot()
        if slot < 0:
            return -1
        raw16 = self._bufs[slot].reshape(-1).view(np.float16)[: self.capacity * 16].reshape(self.capacity, 16)
        for p in range(16):
            col = arrs[p][live][:count] if arrs[p] is not None else np.float16(defaults[p])
            raw16[:count, p] = col
        with self._lock:
            self._meta[slot] = (count, frame_id)
            self._state[slot] = 2
        return slot

    def publish_dense_f16(self, planes: np.ndarray, frame_id: int) -> int:
        """f16 variant of publish_dense: planes [16, N] float16. The slot
        buffer then holds float16 rows (acquire_f16 to view them)."""
        planes = np.ascontiguousarray(planes, dtype=np.float16)
        u16 = planes.view(np.uint16)
        if self._lib is not None:
            slot = self._lib.ring_begin_write(self._h)
            ptr = u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
            self._lib.ring_publish_dense_f16(self._h, slot, ptr, planes.shape[1], planes.shape[1], frame_id)
            return slot
        live = (planes[3].view(np.uint16) & 0x7FFF) != 0
        rows = planes[:, live].T[: self.capacity]
        slot = self._fallback_claim_slot()
        if slot < 0:
            return -1
        raw16 = self._bufs[slot].reshape(-1).view(np.float16)
        raw16[: rows.size] = rows.reshape(-1)
        with self._lock:
            self._meta[slot] = (rows.shape[0], frame_id)
            self._state[slot] = 2
        return slot

    def acquire_f16(self):
        """Like acquire() but returns a float16 [count, 16] view (after a
        publish_dense_f16: the slot holds f16 rows packed at its start)."""
        got = self.acquire()
        if got is None:
            return None
        buf, fid = got
        count = buf.shape[0]
        raw = buf.reshape(-1).view(np.float16)
        return raw[: count * 16].reshape(count, 16), fid

    def publish_rows(self, rows: np.ndarray, frame_id: int) -> int:
        rows = np.ascontiguousarray(rows, dtype=np.float32)
        count = min(rows.shape[0], self.capacity)
        if self._lib is not None:
            slot = self._lib.ring_begin_write(self._h)
            self._lib.ring_publish_rows(self._h, slot, _fptr(rows), count, frame_id)
            return slot
        slot = self._fallback_claim_slot()
        if slot < 0:
            return -1
        self._bufs[slot][:count] = rows[:count]
        with self._lock:
            self._meta[slot] = (count, frame_id)
            self._state[slot] = 2
        return slot

    # ------------------------------------------------------------- consumer
    def acquire(self):
        """Returns (instances_view [count, 16] f32, frame_id) or None."""
        if self._lib is not None:
            cnt = ctypes.c_int64()
            fid = ctypes.c_int64()
            slot = self._lib.ring_acquire(self._h, ctypes.byref(cnt), ctypes.byref(fid))
            if slot < 0:
                return None
            ptr = self._lib.ring_slot_data(self._h, slot)
            buf = np.ctypeslib.as_array(ptr, shape=(self.capacity, 16))
            self._acquired = slot
            return buf[: cnt.value], fid.value
        with self._lock:
            ready = [(self._meta[i][1], i) for i in range(self.n_slots) if self._state[i] == 2]
            if not ready:
                return None
            _, slot = max(ready)
            self._state[slot] = 3
            self._acquired = slot
            cnt, fid = self._meta[slot]
        return self._bufs[slot][:cnt], fid

    def release(self):
        if self._acquired is None:
            return
        if self._lib is not None:
            self._lib.ring_release(self._h, self._acquired)
        else:
            with self._lock:
                self._state[self._acquired] = 0
        self._acquired = None


def compact_dense(planes: np.ndarray) -> np.ndarray:
    """[16, N] dense planes (dead lanes at scale==0 in plane 3) -> compacted
    [count, 16] interleaved instance rows, slot order preserved. Native when
    available; numpy fallback otherwise. The synchronous extract fast path:
    the device's dense pack is elementwise (fuses with the step, ~0 device
    ms even at 1M lanes), and this host pass compacts at memcpy speed —
    replacing the ~6 ms device-side scatter compaction."""
    planes = np.ascontiguousarray(planes, dtype=np.float32)
    n = planes.shape[1]
    lib = get_lib()
    if lib is None:
        live = planes[3] != 0.0
        return np.ascontiguousarray(planes[:, live].T)
    out = np.empty((n, 16), np.float32)
    count = lib.compact_dense(_fptr(out), _fptr(planes), n, n)
    return out[:count]


def compact_dense_planes(planes, defaults) -> np.ndarray:
    """16 SEPARATE [N] f32 plane arrays (or None for an invariant component,
    whose value comes from defaults[p]) -> compacted [count, 16] rows, slot
    order preserved. Plane 3 (scale) is required; scale == 0 marks dead.
    Used by the in-kernel render-pack path, where scale/colors arrive as
    individual device arrays and elided rotation planes are never
    transferred at all."""
    arrs = [None if p is None else np.ascontiguousarray(p, dtype=np.float32) for p in planes]
    n = arrs[3].shape[0]
    lib = get_lib()
    if lib is None:
        live = arrs[3] != 0.0
        count = int(live.sum())
        out = np.empty((count, 16), np.float32)
        for p in range(16):
            out[:, p] = arrs[p][live] if arrs[p] is not None else np.float32(defaults[p])
        return out
    ptr_t = ctypes.POINTER(ctypes.c_float)
    ptrs = (ptr_t * 16)(*[
        (a.ctypes.data_as(ptr_t) if a is not None else ptr_t()) for a in arrs
    ])
    dflt = np.asarray(defaults, dtype=np.float32)
    out = np.empty((n, 16), np.float32)
    count = lib.compact_dense_ptrs(_fptr(out), ptrs, _fptr(dflt), n)
    return out[:count]


def transpose_planes(planes: np.ndarray) -> np.ndarray:
    """[16, M] planar f32 -> [M, 16] interleaved instance rows (native when
    available)."""
    planes = np.ascontiguousarray(planes, dtype=np.float32)
    m = planes.shape[1]
    lib = get_lib()
    if lib is None:
        return np.ascontiguousarray(planes.T)
    out = np.empty((m, 16), np.float32)
    lib.transpose_planes(_fptr(out), _fptr(planes), m, m)
    return out
