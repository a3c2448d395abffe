"""Stage-level ablation of _nested_spawn inside the REAL nested-stress step.

Monkeypatches bevy_firework_tpu.step._nested_spawn with truncated variants
(DCE-proofed via an epsilon write into a live field) and times the full
multi_step. Differences between consecutive levels isolate each stage.
Run: python tools/nested_stage_ablation_tpu.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import importlib

stepmod = importlib.import_module("bevy_firework_tpu.step")
from bevy_firework_tpu import compile_spawner, init_pool, make_frame_input
from bevy_firework_tpu.step import MAX_NESTED_SPAWN_PER_FRAME, _monotone_inverse
from tools.nested_perf_tpu import CAPACITY, nested_stress

ORIG = stepmod._nested_spawn


def make_variant(level):
    def variant(static, params, frame, fields, e, counts, cum, total, frame_key):
        if level >= 4:
            return ORIG(static, params, frame, fields, e, counts, cum, total, frame_key)
        eps = jnp.float32(0.0)
        if level >= 1:  # inverses
            N = fields["alive"].shape[0]
            M = min(MAX_NESTED_SPAWN_PER_FRAME, N)
            parent_for_rank = _monotone_inverse(cum, M)
            child_parent = jnp.clip(parent_for_rank, 0, N - 1)
            dead_cum = jnp.cumsum((~fields["alive"]).astype(jnp.int32))
            slot_for_rank = _monotone_inverse(dead_cum, M)
            eps = eps + (child_parent.sum() + slot_for_rank.sum()).astype(jnp.float32) * 1e-30
        if level >= 2:  # stacked parent gather
            pstack = jnp.stack(
                [fields[k] for k in ("px", "py", "pz", "qx", "qy", "qz", "qw", "vx", "vy", "vz")]
            )
            pg = pstack[:, child_parent]
            eps = eps + pg.sum() * 1e-30
        if level >= 3:  # child init draws + samplers
            uni = jax.random.uniform(jax.random.fold_in(frame_key, 1000 + e), (12, M), jnp.float32)
            eps = eps + uni.sum() * 1e-30
        fields["age"] = fields["age"] + eps
        return jnp.zeros((), jnp.int32)  # _nested_spawn's dropped-count contract

    return variant


def measure(level, warmup=150, n=100):
    import numpy as np

    stepmod._nested_spawn = make_variant(level)
    try:
        from bevy_firework_tpu.step import multi_step

        sp = nested_stress()
        c = compile_spawner(sp)
        state = init_pool(CAPACITY, c.num_emitters, True, 0)
        frame = make_frame_input(1 / 60)
        raw = multi_step.__wrapped__

        # fresh function identity per level — jax's jit cache would otherwise
        # reuse the first level's executable across all monkeypatched variants
        def fresh(static, params, colliders, st, fr, nf):
            return raw(static, params, colliders, st, fr, nf)

        ms = jax.jit(fresh, static_argnums=(0, 5))
        state, out = ms(c.static, c.params, None, state, frame, warmup)
        np.asarray(state.px)

        def run(k):
            s, _ = ms(c.static, c.params, None, state, frame, k)
            np.asarray(s.px)  # forced fence; block_until_ready can return early

        run(n)
        run(2 * n)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            run(n)
            t1 = time.perf_counter()
            run(2 * n)
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / n * 1e3)
        return int(out.alive_count), best
    finally:
        stepmod._nested_spawn = ORIG


def main():
    labels = {
        0: "lv0 cadence+cumsum only (spawn disabled)",
        1: "lv1 + monotone inverses",
        2: "lv2 + parent gather [10,M]",
        3: "lv3 + child-init draws",
        4: "lv4 FULL (incl. pool write-back)",
    }
    prev = None
    for lv in range(5):
        live, ms = measure(lv)
        d = f"  (+{ms - prev:.3f})" if prev is not None else ""
        print(f"{labels[lv]}: {ms:.3f} ms, {live} live{d}")
        prev = ms


if __name__ == "__main__":
    main()
