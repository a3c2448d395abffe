"""Production burn-in: hours of simulated wall-clock on the real chip.

Runs the flagship archetypes in long on-device chains (the deployment
shape) and checks the invariants that matter for serving: finite state,
steady-state live counts that neither leak nor decay, bounded resting
contact, conserved nested cadence, and a bit-exact checkpoint/resume
mid-burn. The reference's analog is "leave the Bevy demo running" —
this is the headless, asserted version.

Run: python tools/burnin_tpu.py [minutes]   (default ~2 simulated hours
of the stress scene in a few real minutes; exits non-zero on any drift)
"""

import sys
import time

sys.path.insert(0, ".")

import dataclasses

import numpy as np

from bevy_firework_tpu import (
    Collider,
    ForceField,
    compile_colliders,
    compile_force_fields,
    compile_spawner,
    init_pool_for,
    make_frame_input,
)
from bevy_firework_tpu.checkpoint import pool_from_arrays, pool_to_arrays
from bevy_firework_tpu.models import effects
from bevy_firework_tpu.ops.fused_step import multi_step_auto

DT = 1.0 / 60.0
CHUNK = 600  # frames per on-device chain (10 s of sim time)


def finite(state, fields=("px", "py", "pz", "vx", "vy", "vz", "age")):
    alive = np.asarray(state.alive)
    for f in fields:
        v = np.asarray(getattr(state, f))[alive]
        if not np.isfinite(v).all():
            return f"non-finite {f}"
    return None


def burn(label, c, table, frame, capacity, n_chunks, live_lo, live_hi, extra=None):
    state = init_pool_for(c, capacity, 0)
    state, out = multi_step_auto(c.static, c.params, table, state, frame, 240)  # fill
    t0 = time.time()
    for ci in range(n_chunks):
        state, out = multi_step_auto(c.static, c.params, table, state, frame, CHUNK)
        live = int(out.alive_count)
        err = finite(state)
        if err:
            print(f"{label}: FAIL chunk {ci}: {err}")
            return 1
        if not (live_lo <= live <= live_hi):
            print(f"{label}: FAIL chunk {ci}: live {live} outside [{live_lo}, {live_hi}]")
            return 1
        if extra:
            err = extra(state, out)
            if err:
                print(f"{label}: FAIL chunk {ci}: {err}")
                return 1
        if ci == n_chunks // 2:  # mid-burn checkpoint round-trip, bit-exact
            state2 = pool_from_arrays(pool_to_arrays(state))
            for f in ("px", "age", "ring_cursor"):
                if not np.array_equal(np.asarray(getattr(state, f)), np.asarray(getattr(state2, f))):
                    print(f"{label}: FAIL checkpoint round-trip field {f}")
                    return 1
            state = state2  # continue from the restored copy
    sim_s = n_chunks * CHUNK * DT
    print(f"{label}: OK — {n_chunks * CHUNK} frames ({sim_s/60:.0f} sim-min) "
          f"in {time.time()-t0:.0f}s wall, steady live {live}")
    return 0


def main(minutes=2.0):
    frame = make_frame_input(DT)
    failures = 0

    # 1. stress_test at 1M live: the headline archetype, U=8 unrolled chains
    sp, _t = effects.stress_test()
    es = dataclasses.replace(sp.emission_settings[0],
                             emission_pacing=__import__("bevy_firework_tpu").EmissionPacing.rate(983333.0))
    sp = dataclasses.replace(sp, emission_settings=(es,))
    c = compile_spawner(sp)
    n = max(2, int(minutes * 60 / 0.12))  # ~0.12 s/chunk measured
    # steady live = rate x (lifetime - dt): emission replaces the cohort
    # that dies this frame, so one dt of the window is always empty
    failures += burn("stress 1M", c, None, frame, 160 * 8192, n, 960_000, 985_000)

    # 2. collision resting contact: energy must never grow
    spc, _t2, cols = effects.stress_test_collision()
    esc = dataclasses.replace(spc.emission_settings[0],
                              emission_pacing=__import__("bevy_firework_tpu").EmissionPacing.rate(200_000.0))
    spc = dataclasses.replace(spc, emission_settings=(esc,))
    cc = compile_spawner(spc)

    def bounded_energy(state, out):
        alive = np.asarray(state.alive)
        vy = np.asarray(state.vy)[alive]
        py = np.asarray(state.py)[alive]
        if np.abs(vy).max(initial=0.0) > 60.0:  # launch ~12 + 2s of g is < 32
            return f"runaway vy {np.abs(vy).max():.1f}"
        # the scene's floor is a FINITE cuboid: lanes spawned past its edge
        # legitimately fall until lifetime (2 s => ~19.6 m); tunneling
        # THROUGH the floor would show far deeper within one frame's travel
        if py.min(initial=0.0) < -25.0:
            return f"fell beyond the free-fall envelope: y {py.min():.1f}"
        return None

    failures += burn("collision 400k", cc, compile_colliders(cols), frame, 64 * 8192,
                     max(2, n // 3), 375_000, 405_000, extra=bounded_energy)

    # 3. force-field orbit (point attractor): bound forever, never escapes
    from bevy_firework_tpu import (
        EmissionPacing,
        EmissionSettings,
        EmissionShape,
        ParticleSettings,
        ParticleSpawner,
        RandF32,
    )

    spo = ParticleSpawner(
        particle_settings=[ParticleSettings(
            lifetime=RandF32.constant(10.0), initial_scale=RandF32.constant(0.1),
            acceleration=(0.0, 0.0, 0.0), linear_drag=0.0)],
        emission_settings=[EmissionSettings(
            emission_pacing=EmissionPacing.rate(800.0),
            emission_shape=EmissionShape.sphere(1.5))],
    )
    co = compile_spawner(spo)
    ftable = compile_force_fields([ForceField.point((0.0, 0.0, 0.0), 6.0, 30.0)])
    oframe = make_frame_input(DT, force_fields=ftable)

    def bounded_orbit(state, out):
        alive = np.asarray(state.alive)
        r = np.sqrt(np.asarray(state.px)[alive] ** 2 + np.asarray(state.py)[alive] ** 2
                    + np.asarray(state.pz)[alive] ** 2)
        if r.max(initial=0.0) > 8.0:
            return f"orbit escaped to r {r.max():.1f}"
        return None

    failures += burn("attractor orbit 8k", co, None, oframe, 8192,
                     max(2, n // 3), 7_500, 8_100, extra=bounded_orbit)

    print("BURN-IN", "FAILED" if failures else "PASSED")
    return failures


if __name__ == "__main__":
    sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 2.0))
