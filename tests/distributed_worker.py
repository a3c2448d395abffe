"""One 'host' process of a multi-process CPU fleet (tests/test_distributed.py).

Each worker owns 2 virtual CPU devices, joins the jax.distributed coordinator,
and steps a 2-spawner fleet on the (hosts x chips) mesh from
`parallel.sharding.make_mesh_2d` — the fleet axis crosses the process (DCN)
boundary, each pool's particle axis stays on the process-local devices (the
ICI analog). It then saves its *addressable* shard of the result so the
parent test can check that each host computed exactly its own spawner and
that the values match an unsharded single-process run.

Run: python tests/distributed_worker.py <coordinator> <nproc> <pid> <out.npz>
"""

import os
import sys


def _force_local_cpu(n_local: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    flags = (
        flags
        + f" --xla_force_host_platform_device_count={n_local}"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"


def fleet_spawner():
    """Same archetype as tests/test_sharding.spawner (kept inline so the
    worker doesn't import test modules)."""
    from bevy_firework_tpu import (
        EmissionPacing,
        EmissionSettings,
        ParticleSettings,
        ParticleSpawner,
        RandF32,
        RandVec3,
    )

    return ParticleSpawner(
        particle_settings=[
            ParticleSettings(lifetime=RandF32.constant(0.4), initial_scale=RandF32.constant(0.1))
        ],
        emission_settings=[
            EmissionSettings(
                emission_pacing=EmissionPacing.rate(300.0),
                initial_velocity=RandVec3.constant((0.5, 2.0, 0.0)),
            )
        ],
    )


N_PER_POOL = 256
N_FRAMES = 15
CHIPS_PER_HOST = 2


def main() -> None:
    coordinator, nproc, pid, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    _force_local_cpu(CHIPS_PER_HOST)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == CHIPS_PER_HOST
    assert len(jax.devices()) == nproc * CHIPS_PER_HOST

    import numpy as np

    from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input
    from bevy_firework_tpu.parallel.sharding import (
        fleet_pool_shardings,
        make_fleet_step_2d,
        make_mesh_2d,
        stack_frames,
        stack_params,
        stack_pools,
    )

    compiled = compile_spawner(fleet_spawner())
    S = nproc
    # device_put onto a sharding that spans processes requires the committed
    # value to be identical everywhere — build pools as host (numpy) leaves
    # from the same seeds on every process.
    pools = [init_pool_for(compiled, N_PER_POOL, seed=i) for i in range(S)]
    host_state = jax.tree_util.tree_map(np.asarray, stack_pools(pools))
    params = jax.tree_util.tree_map(np.asarray, stack_params([compiled.params] * S))
    frames = jax.tree_util.tree_map(
        np.asarray,
        stack_frames(
            [make_frame_input(1 / 60, translation=(float(i), 0.0, 0.0)) for i in range(S)]
        ),
    )

    mesh = make_mesh_2d(n_hosts=nproc, chips_per_host=CHIPS_PER_HOST)
    sh = fleet_pool_shardings(mesh)
    states = jax.tree_util.tree_map(jax.device_put, host_state, sh)
    # params/frames are fleet-sharded jit inputs too: multi-process jit
    # refuses raw numpy against a non-trivial in_sharding, so place them
    # explicitly (identical host values everywhere makes device_put legal
    # across processes, same as the pool state above)
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = NamedSharding(mesh, P("host"))
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, dp), params)
    frames = jax.tree_util.tree_map(lambda x: jax.device_put(x, dp), frames)
    fleet2d = make_fleet_step_2d(compiled.static, mesh)

    for _ in range(N_FRAMES):
        states, outs = fleet2d(params, states, frames)
    jax.block_until_ready(states.px)

    def local_row(arr):
        """Assemble this process's addressable shards of a [S, N] array into
        the (row_index, [N] values) it owns. Asserts single-owner rows."""
        rows = set()
        full = np.full(arr.shape, np.nan, dtype=np.asarray(arr.addressable_shards[0].data).dtype)
        for s in arr.addressable_shards:
            full[s.index] = np.asarray(s.data)
            rows.add(s.index[0].start if s.index[0].start is not None else 0)
        assert rows == {pid}, f"process {pid} owns fleet rows {rows}"
        row = full[pid]
        assert not np.isnan(row.astype(np.float64)).any(), "holes in local shard"
        return row

    px = local_row(states.px)
    age = local_row(states.age)
    alive_count = int(np.asarray(outs.alive_count.addressable_shards[0].data).reshape(-1)[0])
    np.savez(out_path, pid=pid, px=px, age=age, alive_count=alive_count)
    print(f"worker {pid}: alive={alive_count} OK", flush=True)


if __name__ == "__main__":
    main()
