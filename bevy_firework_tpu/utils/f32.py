"""f32-exact scalar math helpers matching Rust float semantics.

The reference engine's emission cadence (`/root/reference/src/core.rs:553-575`)
relies on Rust's `f32::div_euclid` / `f32::rem_euclid`, whose edge-case
behaviour (truncating `%`, Euclidean adjustment) must be reproduced exactly in
f32 for trajectory/cadence parity. These helpers work on both numpy and
jax.numpy arrays (anything implementing the array API we use).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = np.float32


def trunc_rem(a, b):
    """Rust's `%` on floats: truncating remainder (C fmod). a - trunc(a/b)*b."""
    return a - jnp.trunc(a / b) * b


def rem_euclid(a, b):
    """Rust `f32::rem_euclid`: r = a % b; if r < 0 { r + |b| } else { r }."""
    r = trunc_rem(a, b)
    return jnp.where(r < 0, r + jnp.abs(b), r)


def div_euclid(a, b):
    """Rust `f32::div_euclid`: q = trunc(a/b); adjust when a % b < 0."""
    q = jnp.trunc(a / b)
    r = trunc_rem(a, b)
    adj = jnp.where(b > 0, q - 1, q + 1)
    return jnp.where(r < 0, adj, q)


def np_trunc_rem(a: np.float32, b: np.float32) -> np.float32:
    a, b = F32(a), F32(b)
    return F32(a - F32(np.trunc(F32(a / b))) * b)


def np_rem_euclid(a: np.float32, b: np.float32) -> np.float32:
    r = np_trunc_rem(a, b)
    return F32(r + abs(F32(b))) if r < 0 else r


def np_div_euclid(a: np.float32, b: np.float32) -> np.float32:
    a, b = F32(a), F32(b)
    q = F32(np.trunc(F32(a / b)))
    r = np_trunc_rem(a, b)
    if r < 0:
        return F32(q - 1) if b > 0 else F32(q + 1)
    return q


F32_MIN = np.float32(np.finfo(np.float32).min)  # Rust f32::MIN = -3.4028235e38
