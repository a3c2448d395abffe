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

    @property
    def n_buffers(self) -> int:
        return len(self.buckets)


def spec_of(tree) -> CapsuleSpec:
    """Build the capsule layout from a concrete tree (numpy / jax arrays /
    ShapeDtypeStructs — anything with .shape/.dtype; python scalars are
    normalized the way jnp.asarray would)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    totals: dict[int, int] = {}
    rows = []
    for leaf in leaves:
        a = np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf
        b = _bucket_of(a.dtype)
        off = totals.get(b, 0)
        size = int(np.prod(a.shape, dtype=np.int64)) if a.shape else 1
        rows.append((np.dtype(a.dtype).name, tuple(int(s) for s in a.shape), b, off))
        totals[b] = off + size
    buckets = tuple(sorted((w, n) for w, n in totals.items()))
    return CapsuleSpec(treedef=treedef, leaves=tuple(rows), buckets=buckets)


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


def pack(tree, spec: CapsuleSpec) -> Tuple[jax.Array, ...]:
    """Traced: flatten `tree` into one buffer per bucket (spec.buckets
    order). The tree MUST match the spec's treedef/shapes/dtypes."""
    leaves = jax.tree_util.tree_leaves(tree)
    per_bucket: dict[int, list] = {w: [] for w, _ in spec.buckets}
    for leaf, (dname, shape, b, _off) in zip(leaves, spec.leaves):
        x = jnp.asarray(leaf)
        per_bucket[b].append(_to_carrier(x, b))
    return tuple(
        jnp.concatenate(per_bucket[w]) if len(per_bucket[w]) > 1 else per_bucket[w][0]
        for w, _n in spec.buckets
    )


def pack_host(tree, spec: CapsuleSpec) -> Tuple[np.ndarray, ...]:
    """Numpy twin of `pack` with the identical byte layout: packs a
    host-built tree (e.g. stacked frame inputs) so ONE device_put ships it."""
    leaves = jax.tree_util.tree_leaves(tree)
    per_bucket: dict[int, list] = {w: [] for w, _ in spec.buckets}
    for leaf, (dname, shape, b, _off) in zip(leaves, spec.leaves):
        a = np.asarray(leaf)
        carrier = _BUCKETS[b][1]
        if a.dtype == np.bool_:
            flat = a.astype(carrier).ravel()
        elif a.dtype == carrier:
            flat = a.ravel()
        else:
            flat = np.ascontiguousarray(a).view(carrier).ravel()
        per_bucket[b].append(flat)
    return tuple(np.concatenate(per_bucket[w]) for w, _n in spec.buckets)


def unpack(bufs: Tuple[jax.Array, ...], spec: CapsuleSpec):
    """Traced: rebuild the tree from capsule buffers (slice + reshape +
    bitcast — bit-exact inverse of pack)."""
    by_width = {w: buf for (w, _n), buf in zip(spec.buckets, bufs)}
    leaves = []
    for dname, shape, b, off in spec.leaves:
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        seg = lax.slice(by_width[b], (off,), (off + size,))
        leaves.append(_from_carrier(seg, dname, shape))
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)
