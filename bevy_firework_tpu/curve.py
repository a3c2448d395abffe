"""Curves and gradients over normalized particle lifetime.

Authoring-side equivalents of the reference's `FireworkCurve<T>` /
`FireworkGradient<T>` (`/root/reference/src/curve.rs:8-75,170-239`), which wrap
bevy's Constant / evenly-sampled / unevenly-sampled interpolation cores.  The
TPU-side representation is a fixed-width keyframe table (`CurveTable`) whose
evaluation is a branchless clamp + segment-select + lerp that vmaps over a
particle pool (SURVEY.md #4).

Semantics reproduced exactly (f32):
  * Constant: same value everywhere, domain [0, 1].
  * Even (`SampleAutoCurve` / `ColorSampleAutoCurve`): n keyframes equally
    spaced on [0, 1]; sample_clamped clamps t to [0,1], picks segment
    i = min(floor(t * (n-1)), n-2), lerps with local fraction.
  * Uneven (`UnevenSampleAutoCurve` / `ColorSampleUnevenAutoCurve`): explicit
    sorted knots; t clamped to [t0, t_last]; lerp within containing segment.

Values may be scalars (scale curve) or RGBA 4-vectors (color gradients);
color mixing is componentwise lerp in linear space (bevy `LinearRgba::mix`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

CURVE_CONSTANT = 0
CURVE_EVEN = 1
CURVE_UNEVEN = 2

# Default keyframe-table width. Within one archetype all curves compile to
# the SAME width so they stack into one [T, K(, C)] array; the width is a
# per-archetype compile constant (compiled.py passes k_pad = the archetype's
# largest knot count) so authoring-side curves may hold any number of knots —
# the reference's sample vecs are unbounded (/root/reference/src/curve.rs:8-75).
# 8 covers every reference example (max observed: 5 keyframes in sparks).
K_MAX = 8


@dataclasses.dataclass(frozen=True)
class FireworkCurve:
    """Scalar (or vector) keyframe curve with unit domain.

    kind: one of CURVE_CONSTANT / CURVE_EVEN / CURVE_UNEVEN.
    ts:   knot positions, len n (ignored for constant/even).
    vs:   knot values, shape (n,) scalars or (n, C) vectors.
    """

    kind: int
    ts: tuple
    vs: tuple

    # -- constructors mirroring /root/reference/src/curve.rs:35-75 -----------
    @staticmethod
    def constant(value) -> "FireworkCurve":
        return FireworkCurve(CURVE_CONSTANT, (0.0, 1.0), (_tup(value), _tup(value)))

    @staticmethod
    def even_samples(samples: Sequence) -> "FireworkCurve":
        samples = list(samples)
        if len(samples) == 0:
            raise ValueError("Cannot create curve from 0 samples")
        if len(samples) == 1:
            return FireworkCurve.constant(samples[0])
        ts = tuple(float(i) / (len(samples) - 1) for i in range(len(samples)))
        return FireworkCurve(CURVE_EVEN, ts, tuple(_tup(v) for v in samples))

    @staticmethod
    def uneven_samples(samples: Sequence) -> "FireworkCurve":
        samples = list(samples)
        if len(samples) == 0:
            raise ValueError("Cannot create curve from 0 samples")
        if len(samples) == 1:
            return FireworkCurve.constant(samples[0][1])
        ts = tuple(float(t) for t, _ in samples)
        if any(b <= a for a, b in zip(ts, ts[1:])):
            raise ValueError("Uneven curve knots must be strictly increasing")
        return FireworkCurve(CURVE_UNEVEN, ts, tuple(_tup(v) for _, v in samples))

    @property
    def n(self) -> int:
        return len(self.ts)

    @property
    def channels(self) -> int:
        v0 = self.vs[0]
        return len(v0) if isinstance(v0, tuple) else 0

    # -- host-side reference evaluation (numpy f32, the parity oracle) -------
    def sample_clamped(self, t: float):
        t = np.float32(t)
        vs = np.asarray(self.vs, dtype=np.float32)
        if self.kind == CURVE_CONSTANT:
            return vs[0]
        if self.kind == CURVE_EVEN:
            n = len(self.vs)
            tc = min(max(float(t), 0.0), 1.0)
            x = np.float32(tc) * np.float32(n - 1)
            i = min(int(np.floor(x)), n - 2)
            frac = np.float32(x - np.float32(i))
            return (vs[i] + (vs[i + 1] - vs[i]) * frac).astype(np.float32)
        ts = np.asarray(self.ts, dtype=np.float32)
        tc = np.float32(min(max(float(t), float(ts[0])), float(ts[-1])))
        i = int(np.clip(np.searchsorted(ts, tc, side="right") - 1, 0, len(ts) - 2))
        frac = np.float32((tc - ts[i]) / (ts[i + 1] - ts[i]))
        return (vs[i] + (vs[i + 1] - vs[i]) * frac).astype(np.float32)

    # -- serde ----------------------------------------------------------------
    def to_dict(self) -> dict:
        return {"kind": ["constant", "even", "uneven"][self.kind], "ts": list(self.ts), "vs": [list(v) if isinstance(v, tuple) else v for v in self.vs]}

    @staticmethod
    def from_dict(d: dict) -> "FireworkCurve":
        kind = {"constant": CURVE_CONSTANT, "even": CURVE_EVEN, "uneven": CURVE_UNEVEN}[d["kind"]]
        vs = tuple(_tup(v) for v in d["vs"])
        return FireworkCurve(kind, tuple(float(t) for t in d["ts"]), vs)


# The reference uses a distinct FireworkGradient type only because bevy colors
# implement Mix rather than StableInterpolate (`/root/reference/src/curve.rs:166-169`);
# numerically both are clamp+lerp, so here a gradient IS a 4-channel curve.
FireworkGradient = FireworkCurve


def gradient_constant(rgba) -> FireworkCurve:
    return FireworkCurve.constant(tuple(float(c) for c in rgba))


def gradient_uneven_samples(samples) -> FireworkCurve:
    return FireworkCurve.uneven_samples([(t, tuple(float(c) for c in v)) for t, v in samples])


def gradient_even_samples(samples) -> FireworkCurve:
    return FireworkCurve.even_samples([tuple(float(c) for c in v) for v in samples])


def _tup(v) -> Any:
    if isinstance(v, (tuple, list, np.ndarray)):
        return tuple(float(c) for c in v)
    return float(v)


# ---------------------------------------------------------------------------
# Compiled table representation + jittable evaluation
# ---------------------------------------------------------------------------


def compile_curve(curve: FireworkCurve, channels: int = 0, k_pad: int = None):
    """Pack a curve into fixed-width (ts[K], vs[K(,C)], n) f32 arrays, where
    K = k_pad (defaults to max(K_MAX, n) — callers stacking several curves
    into one table pass their common width).

    Padding: ts beyond n-1 are +inf (so segment search never selects them);
    vs beyond n-1 repeat the last value (so clamping to the end is free).
    """
    n = curve.n
    if k_pad is None:
        k_pad = max(K_MAX, n)
    assert n <= k_pad, (n, k_pad)
    if curve.kind == CURVE_EVEN:
        ts = np.array([i / (n - 1) for i in range(n)], dtype=np.float32)
    else:
        ts = np.asarray(curve.ts, dtype=np.float32)
    ts_pad = np.full((k_pad,), np.inf, dtype=np.float32)
    ts_pad[:n] = ts
    vs = np.asarray(curve.vs, dtype=np.float32)
    if channels and vs.ndim == 1:
        vs = np.broadcast_to(vs[:, None], (n, channels)).copy()
    shape = (k_pad, channels) if channels else (k_pad,)
    vs_pad = np.zeros(shape, dtype=np.float32)
    vs_pad[:n] = vs
    vs_pad[n:] = vs[-1]
    return ts_pad, vs_pad, np.int32(n), np.int32(curve.kind)


def curve_index_frac(ts, n, kind, t):
    """Segment index + interpolation fraction for a padded keyframe table.

    ts: [K] knots (+inf padded); n: knot count (int32); kind: CURVE_* (int32,
    traced or static); t: [...] query times. Returns (i:int32[...], frac[...]).

    Works under vmap/jit; the even-curve path recomputes knots implicitly via
    index scaling so it matches bevy's EvenCore exactly, and the uneven path
    clamps t into [ts[0], ts[n-1]] first (bevy UnevenCore::sample_with).
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    nf = n.astype(jnp.float32) if hasattr(n, "astype") else jnp.float32(n)
    n_i = jnp.asarray(n, dtype=jnp.int32)
    t_end = jnp.take(ts, n_i - 1, axis=0)

    # --- even path: segment from scaled index --------------------------------
    tc_even = jnp.clip(t, 0.0, 1.0)
    x = tc_even * (nf - 1.0)
    i_even = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n_i - 2)
    frac_even = x - i_even.astype(jnp.float32)

    # --- uneven path: count knots <= t ---------------------------------------
    tc_un = jnp.clip(t, ts[0], t_end)
    # segment index = (number of interior knots ts[k] (1<=k) that are <= t) clamped
    cmp = (tc_un[..., None] >= ts[1:]).astype(jnp.int32)  # padding=+inf never counts
    i_un = jnp.clip(jnp.sum(cmp, axis=-1), 0, n_i - 2)
    t0 = jnp.take(ts, i_un, axis=0)
    t1 = jnp.take(ts, i_un + 1, axis=0)
    frac_un = (tc_un - t0) / (t1 - t0)

    is_even = jnp.asarray(kind, jnp.int32) == CURVE_EVEN
    is_const = jnp.asarray(kind, jnp.int32) == CURVE_CONSTANT
    i = jnp.where(is_even, i_even, i_un)
    frac = jnp.where(is_even, frac_even, frac_un)
    frac = jnp.where(is_const, 0.0, frac)
    i = jnp.where(is_const, 0, i)
    return i, frac


def eval_curve_table(ts, vs, n, kind, t):
    """Branchless sample_clamped. vs: [K] or [K, C]; returns [...] or [..., C].

    PERF (TPU): multi-channel values gather each channel from its own [K] row
    (`vs.T[c]`) instead of row-gathering [.., C] — a [N, C] gather with tiny
    minor dim pads C to the 128-lane tile and is ~10x slower.
    """
    i, frac = curve_index_frac(ts, n, kind, t)
    if vs.ndim == 2:
        return jnp.stack(eval_curve_table_channels(ts, vs, n, kind, t, _if=(i, frac)), axis=-1)
    v0 = jnp.take(vs, i, axis=0)
    v1 = jnp.take(vs, i + 1, axis=0)
    return v0 + (v1 - v0) * frac


def eval_curve_table_channels(ts, vs, n, kind, t, _if=None):
    """Channel-split evaluation: vs [K, C] -> tuple of C arrays shaped like t.
    The hot-path form: everything stays in component-split [N] layout."""
    i, frac = curve_index_frac(ts, n, kind, t) if _if is None else _if
    vs_t = vs.T  # [C, K]
    out = []
    for c in range(vs.shape[1]):
        v0 = jnp.take(vs_t[c], i, axis=0)
        v1 = jnp.take(vs_t[c], i + 1, axis=0)
        out.append(v0 + (v1 - v0) * frac)
    return tuple(out)
