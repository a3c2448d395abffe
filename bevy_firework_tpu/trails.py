"""Trail / ribbon rendering: per-particle position history + segment records.

Beyond the reference's feature set — bevy_firework has no trails
(`/root/reference/README.md:21-50` feature list) — but a natural extension
that the SoA pool makes cheap on TPU:

  * The history is a CIRCULAR [K, N] buffer per coordinate with a head
    cursor, so the per-frame device cost is ONE [N]-row dynamic-update-slice
    per coordinate plus an [N] validity update — not a K x N shift.
  * Respawn detection needs no particle ids: a slot restarted iff it is
    alive now and either was dead at the last record, its age went
    backwards (same-frame ring reuse reads a younger tenant), or -- across
    a step_n fast-forward window -- it is younger than a continuing tenant
    could be (see update_trails' `elapsed`).
  * Segment extraction is a static gather of K-1 row pairs off the head
    cursor, packed into 64-byte records whose invalid rows carry width 0 —
    exactly the key the native dense compaction (`native.compact_dense`)
    already drops, so trails reuse the render bridge unchanged.

Segment record (16 f32 = 64 B, mirroring the instance-record discipline of
`render.rs:95-115`):

    [p0.x, p0.y, p0.z, w0,  p1.x, p1.y, p1.z, w1,  r, g, b, a0,  r, g, b, a1]

p0 is the newer end (toward the particle), p1 the older; w* are world-space
ribbon half-widths; the color is the particle's CURRENT base color with the
alpha tapered toward the tail (a consumer draws a camera-facing quad per
segment, interpolating width and alpha along it).

Group batching: when every member of a vmapped archetype group is trailed
with EQUAL TrailSettings, Scene updates the whole group's trails in ONE
vmapped dispatch (`update_trails_stacked`; the stacked authority lives in
the group batch and slots slice it lazily, like pool state). Mixed or
unequal-settings groups fall back to per-slot updates.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pool import PoolState
from .render import FireworkUniform, compute_render_fields


@dataclasses.dataclass(frozen=True)
class TrailSettings:
    """Per-spawner trail config (compile-time static: `length` sizes the
    history buffer and the packed segment count)."""

    length: int = 8  # history points K (>= 2); up to K-1 segments drawn
    width: float = 0.25  # ribbon half-width as a fraction of particle scale
    taper: bool = True  # linearly taper width and alpha toward the tail

    def __post_init__(self):
        if self.length < 2:
            raise ValueError("TrailSettings.length must be >= 2")
        if self.width <= 0.0:
            raise ValueError("TrailSettings.width must be > 0 (w == 0 is the compaction drop key)")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrailState:
    """Circular position history for one spawner's pool."""

    hx: jax.Array  # [K, N] f32
    hy: jax.Array  # [K, N] f32
    hz: jax.Array  # [K, N] f32
    hcount: jax.Array  # [N] int32: valid history points per slot (0..K)
    head: jax.Array  # scalar int32: row of the most recent point
    prev_age: jax.Array  # [N] f32: age at the last recorded point
    prev_alive: jax.Array  # [N] bool

    @property
    def length(self) -> int:
        return self.hx.shape[0]

    @property
    def capacity(self) -> int:
        return self.hx.shape[1]


def init_trail_state(settings: TrailSettings, capacity: int) -> TrailState:
    k = settings.length

    # three DISTINCT buffers: update_trails donates the trail state, and a
    # shared zeros array would be one buffer donated three times
    def z():
        return jnp.zeros((k, capacity), jnp.float32)

    return TrailState(
        hx=z(), hy=z(), hz=z(),
        hcount=jnp.zeros((capacity,), jnp.int32),
        head=jnp.zeros((), jnp.int32),
        prev_age=jnp.zeros((capacity,), jnp.float32),
        prev_alive=jnp.zeros((capacity,), bool),
    )


def _update_trails_impl(trail: TrailState, state: PoolState, elapsed=None) -> TrailState:
    """Record one history point from the post-step pool state.

    Call AFTER stepping (Scene does this for trailed spawners). Slots that
    (re)started since the LAST RECORDED point — newly alive, age running
    backwards (a re-tenant younger than the old tenant was), or, when
    `elapsed` is given, younger than a continuing tenant could possibly be
    — restart their history at the current position; stale rows behind
    them are hidden by hcount.

    elapsed: sim time advanced since the previous recorded point. Pass
    n*dt after a step_n fast-forward — REQUIRED for correctness there: a
    slot whose tenant died mid-window and was re-claimed can come back
    OLDER than the previous record (age grew), which the age-regression
    rule alone cannot see; a continuing tenant carries exactly
    prev_age + elapsed while any mid-window re-tenant carries age <=
    elapsed, so the split `age < prev_age/2 + elapsed` separates them with
    an f32 margin of prev_age/2 (>= one frame). With elapsed=None only the
    single-frame rules apply (sound for Scene.step: within one frame,
    spawn precedes aging, so a same-frame re-tenant always reads a
    smaller age).

    `trail` is DONATED: the circular buffers update in place (XLA would
    otherwise copy all K x N history bytes per frame to write one row —
    measured 6x the HBM traffic at 1M lanes). The returned state replaces
    the argument; don't reuse the argument after the call."""
    k = trail.length
    restarted = state.alive & (~trail.prev_alive | (state.age < trail.prev_age))
    if elapsed is not None:
        restarted = restarted | (
            state.alive & (state.age < trail.prev_age * 0.5 + elapsed)
        )
    head = jax.lax.rem(trail.head + 1, jnp.int32(k))
    hx = jax.lax.dynamic_update_index_in_dim(trail.hx, state.px, head, 0)
    hy = jax.lax.dynamic_update_index_in_dim(trail.hy, state.py, head, 0)
    hz = jax.lax.dynamic_update_index_in_dim(trail.hz, state.pz, head, 0)
    hcount = jnp.where(
        state.alive,
        jnp.where(restarted, 1, jnp.minimum(trail.hcount + 1, k)),
        0,
    ).astype(jnp.int32)
    return TrailState(
        hx=hx, hy=hy, hz=hz, hcount=hcount, head=head,
        prev_age=state.age, prev_alive=state.alive,
    )


update_trails = partial(jax.jit, donate_argnums=(0,))(_update_trails_impl)


@partial(jax.jit, donate_argnums=(0,))
def update_trails_stacked(trails: TrailState, states: PoolState, elapsed=None) -> TrailState:
    """One dispatch for a whole archetype group: vmap of _update_trails_impl
    over stacked [S, ...] trail/pool trees (Scene's group batching). Same
    donation semantics as update_trails — the stacked argument updates in
    place and must not be reused."""
    return jax.vmap(lambda t, s: _update_trails_impl(t, s, elapsed))(trails, states)


@partial(jax.jit, static_argnums=(0, 4))
def pack_trail_segments(
    settings: TrailSettings,
    params,
    state: PoolState,
    trail: TrailState,
    type_index: int,
) -> Tuple[jax.Array, jax.Array]:
    """Emit dense segment planes [16, (K-1)*N] f32 + the valid-segment count.

    Row s of the (K-1)-stack joins history points s and s+1 behind the head;
    a segment is valid iff its slot is alive, of `type_index`, and has
    recorded both endpoints (hcount >= s+2). Invalid lanes carry w0 == 0 —
    the same drop key as the dense instance pack — so
    `native.compact_dense(np.asarray(planes))` yields the final [count, 16]
    records at host memcpy speed. The returned count is the number of rows
    the compaction yields (w0 > 0): a valid segment whose scale curve
    evaluates to exactly 0 drops, like the instance pack's zero-scale
    caveat."""
    k = settings.length
    s = jnp.arange(k - 1, dtype=jnp.int32)  # segment index, 0 = newest
    # one K-row gather per coordinate (newest first); consecutive rows are
    # the segment endpoints — half the history reads of two (K-1) gathers
    idx = jax.lax.rem(trail.head - jnp.arange(k, dtype=jnp.int32) + jnp.int32(2 * k), jnp.int32(k))
    hx, hy, hz = trail.hx[idx], trail.hy[idx], trail.hz[idx]
    p0 = (hx[:-1], hy[:-1], hz[:-1])  # each [K-1, N]
    p1 = (hx[1:], hy[1:], hz[1:])

    sel = state.alive & (state.ptype == type_index)
    valid = sel[None, :] & (trail.hcount[None, :] >= (s + 2)[:, None])

    scale, base, _emis = compute_render_fields(params, state, type_index)
    if settings.taper:
        t0 = (1.0 - s.astype(jnp.float32) / np.float32(k - 1))[:, None]
        t1 = (1.0 - (s + 1).astype(jnp.float32) / np.float32(k - 1))[:, None]
    else:
        t0 = jnp.ones((k - 1, 1), jnp.float32)
        t1 = jnp.ones((k - 1, 1), jnp.float32)
    half_w = scale[None, :] * np.float32(settings.width)
    w0 = jnp.where(valid, half_w * t0, 0.0)
    w1 = half_w * t1

    count = jnp.sum((w0 > 0).astype(jnp.int32))  # == rows the compaction yields
    zero = jnp.zeros_like(w0)
    planes = jnp.stack(
        [
            p0[0], p0[1], p0[2], w0,
            p1[0], p1[1], p1[2], w1,
            base[0][None, :] + zero, base[1][None, :] + zero,
            base[2][None, :] + zero, base[3][None, :] * t0,
            base[0][None, :] + zero, base[1][None, :] + zero,
            base[2][None, :] + zero, base[3][None, :] * t1,
        ]
    ).reshape(16, -1)
    return planes, count


@dataclasses.dataclass(frozen=True)
class TrailItem:
    """One ribbon draw's worth of data, per (spawner x non-empty type)."""

    spawner_id: int
    type_index: int
    segments: np.ndarray  # [count, 16] f32 (see module docstring layout)
    count: int
    uniform: FireworkUniform
    # RenderLayers bitmask carried from the spawner (render.rs:414-418)
    layers: int = 1


def sort_segments_back_to_front(segments: np.ndarray, camera_pos) -> np.ndarray:
    """Stable farthest-first reorder by segment midpoint distance (the
    ribbon analog of `render.sort_instances_back_to_front`)."""
    if segments.shape[0] <= 1:
        return segments
    cam = np.asarray(camera_pos, np.float32).reshape(3)
    mid = 0.5 * (segments[:, 0:3] + segments[:, 4:7]) - cam
    d2 = (mid * mid).sum(axis=1)
    return segments[np.argsort(-d2, kind="stable")]
