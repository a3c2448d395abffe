"""Flat argument/result capsules for tunnel-cheap dispatch (VERDICT r4 #1).

On the tunneled TPU attach, every BUFFER in a jitted call's argument or
result tree costs ~8-20 us of per-dispatch overhead regardless of size
(measured in tools/scene_wall_profile_tpu.py + a handle-count microbench:
400 trivial buffers -> ~3.8 ms/frame round-trip, 2 buffers -> ~0.85 ms).
The interactive Scene dispatch used to carry ~400 handles for a 4-archetype
scene (stacked PoolState 21 leaves + params ~30 + frames ~7, each way, per
group); a capsule packs a whole pytree into ONE flat buffer per element
width, so the same dispatch carries a handful.

Packing is pure bit movement: 4-byte leaves (f32 / i32 / u32) are bitcast
to i32 and concatenated (bool is cast to i32 — exact both ways), 2-byte
leaves (f16 / bf16) to i16, 1-byte to u8. Unpacking slices, reshapes and
bitcasts back — bit-exact round trip by construction, verified in
tests/test_capsule.py. `pack_host` is the numpy twin producing the same
byte layout for host-built trees (frame inputs), so one `device_put` ships
the whole tree.

The reference has no analog (single-process CPU library); this is the
TPU-native answer to its zero-cost in-process hand-offs
(`/root/reference/src/render.rs:439-461`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# bucket id -> (carrier dtype, numpy carrier)
_BUCKETS = {
    4: (jnp.int32, np.int32),
    2: (jnp.int16, np.int16),
    1: (jnp.uint8, np.uint8),
}


def _bucket_of(dtype) -> int:
    w = np.dtype(dtype).itemsize
    if np.dtype(dtype) == np.bool_:
        return 4  # bools ride the 4-byte bucket as i32 (exact both ways)
    if w not in _BUCKETS:
        raise TypeError(f"capsule: unsupported dtype {dtype}")
    return w


@dataclasses.dataclass(frozen=True)
class CapsuleSpec:
    """Static layout of a packed pytree: the treedef plus, per leaf (in
    flatten order), its dtype name, shape, bucket width and flat offset.
    Hashable, so it can key jit static arguments."""

    treedef: Any
    leaves: Tuple[Tuple[str, Tuple[int, ...], int, int], ...]
    buckets: Tuple[Tuple[int, int], ...]  # (width, total elements), nonempty only
    n_native: int = 0  # leaves passed through unpacked (>= _TILE elements)

    @property
    def n_buffers(self) -> int:
        return len(self.buckets) + self.n_native


# TPU f32/i32 tile = (8 sublanes, 128 lanes). Leaves at least this big stay
# NATIVE (pass through unpacked): packing a pool-sized plane into a 1-D
# buffer forces a tiled<->linear relayout copy each way at the dispatch
# boundary — measured ~10 ms/frame of pure relayout on a 4-group scene.
# Small leaves (params, frame scalars, per-emitter rows) pack into the flat
# buffers, which is where the handle-count win lives (~8-20 us/handle).
_TILE = 8 * 128
_NATIVE_BUCKET = 0  # bucket id for native (unpacked) leaves


def spec_of(tree) -> CapsuleSpec:
    """Build the capsule layout from a concrete tree (numpy / jax arrays /
    ShapeDtypeStructs — anything with .shape/.dtype; python scalars are
    normalized the way jnp.asarray would). Leaves of >= _TILE elements stay
    native (their `off` is the index in the natives tuple); the rest pack
    per element width."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    totals: dict[int, int] = {}
    n_native = 0
    rows = []
    for leaf in leaves:
        a = np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf
        size = int(np.prod(a.shape, dtype=np.int64)) if a.shape else 1
        if size >= _TILE:
            rows.append((np.dtype(a.dtype).name, tuple(int(s) for s in a.shape),
                         _NATIVE_BUCKET, n_native))
            n_native += 1
            continue
        b = _bucket_of(a.dtype)
        off = totals.get(b, 0)
        rows.append((np.dtype(a.dtype).name, tuple(int(s) for s in a.shape), b, off))
        totals[b] = off + size
    buckets = tuple(sorted((w, n) for w, n in totals.items()))
    return CapsuleSpec(treedef=treedef, leaves=tuple(rows), buckets=buckets,
                       n_native=n_native)


def _to_carrier(x, width):
    carrier = _BUCKETS[width][0]
    if x.dtype == jnp.bool_:
        return x.astype(carrier).ravel()
    if x.dtype == carrier:
        return x.ravel()
    return lax.bitcast_convert_type(x, carrier).ravel()


def _from_carrier(seg, dtype_name, shape):
    dt = jnp.dtype(dtype_name)
    seg = seg.reshape(shape)
    if dt == jnp.bool_:
        return seg.astype(jnp.bool_)
    if seg.dtype == dt:
        return seg
    return lax.bitcast_convert_type(seg, dt)


def pack(tree, spec: CapsuleSpec) -> Tuple:
    """Traced: flatten `tree` into (one buffer per bucket) + native leaves
    passed through untouched. The tree MUST match the spec."""
    leaves = jax.tree_util.tree_leaves(tree)
    per_bucket: dict[int, list] = {w: [] for w, _ in spec.buckets}
    natives = [None] * spec.n_native
    for leaf, (dname, shape, b, off) in zip(leaves, spec.leaves):
        x = jnp.asarray(leaf)
        if x.shape != shape or x.dtype != jnp.dtype(dname):
            raise ValueError(
                f"capsule pack: leaf {x.shape}/{x.dtype} does not match "
                f"spec {shape}/{dname}")
        if b == _NATIVE_BUCKET:
            natives[off] = x
            continue
        per_bucket[b].append((off, _to_carrier(x, b)))
    out = []
    for w, _n in spec.buckets:
        segs = [seg for _o, seg in sorted(per_bucket[w], key=lambda t: t[0])]
        out.append(jnp.concatenate(segs) if len(segs) > 1 else segs[0])
    return tuple(out) + tuple(natives)


def pack_host(tree, spec: CapsuleSpec) -> Tuple[np.ndarray, ...]:
    """Numpy twin of `pack` with the identical byte layout: packs a
    host-built tree (e.g. stacked frame inputs) so ONE device_put ships it."""
    leaves = jax.tree_util.tree_leaves(tree)
    per_bucket: dict[int, list] = {w: [] for w, _ in spec.buckets}
    natives = [None] * spec.n_native
    for leaf, (dname, shape, b, off) in zip(leaves, spec.leaves):
        a = np.asarray(leaf)
        if b == _NATIVE_BUCKET:
            natives[off] = a
            continue
        carrier = _BUCKETS[b][1]
        if a.dtype == np.bool_:
            flat = a.astype(carrier).ravel()
        elif a.dtype == carrier:
            flat = a.ravel()
        else:
            flat = np.ascontiguousarray(a).view(carrier).ravel()
        per_bucket[b].append((off, flat))
    return tuple(
        np.concatenate([seg for _o, seg in sorted(per_bucket[w], key=lambda t: t[0])])
        for w, _n in spec.buckets
    ) + tuple(natives)


def unpack(bufs: Tuple, spec: CapsuleSpec):
    """Traced: rebuild the tree from (bucket buffers + native leaves) —
    bit-exact inverse of pack (slice + reshape + bitcast for packed
    leaves; natives pass straight through)."""
    nb = len(spec.buckets)
    by_width = {w: buf for (w, _n), buf in zip(spec.buckets, bufs[:nb])}
    natives = bufs[nb:]
    leaves = []
    for dname, shape, b, off in spec.leaves:
        if b == _NATIVE_BUCKET:
            leaves.append(natives[off])
            continue
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        seg = lax.slice(by_width[b], (off,), (off + size,))
        leaves.append(_from_carrier(seg, dname, shape))
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)
