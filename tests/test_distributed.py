"""True multi-process (DCN) fleet test: two OS processes, each owning 2
virtual CPU devices, joined via `jax.distributed` — the executable version of
the multi-host story in `parallel/sharding.py` (fleet axis across processes,
particle axis on process-local devices). SURVEY.md §2a maps the reference's
single-process parallelism to exactly these two axes; the reference itself has
no distributed backend, so the oracle here is the unsharded vmapped step.

The in-process 2x4 virtual-mesh variant lives in
tests/test_sharding.py::test_2d_dcn_fleet_step_matches_unsharded; this test
covers what that one cannot: coordinator bring-up, cross-process global-array
placement (device_put of identical host values onto a multi-process sharding),
and that each host's addressable shard is exactly its own spawner's pool.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_fleet(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # the workers force their own device count / platform; don't leak the
    # parent conftest's 8-device XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO)

    outs = [tmp_path / f"worker{i}.npz" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), f"127.0.0.1:{port}", "2", str(i), str(outs[i])],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"

    # ground truth: the identical fleet stepped unsharded in this process
    from bevy_firework_tpu import compile_spawner, init_pool_for, make_frame_input, step_jit
    from bevy_firework_tpu.parallel.sharding import stack_frames, stack_params, stack_pools
    from tests.distributed_worker import N_FRAMES, N_PER_POOL, fleet_spawner

    import jax

    compiled = compile_spawner(fleet_spawner())
    S = 2
    states = stack_pools([init_pool_for(compiled, N_PER_POOL, seed=i) for i in range(S)])
    params = stack_params([compiled.params] * S)
    frames = stack_frames(
        [make_frame_input(1 / 60, translation=(float(i), 0.0, 0.0)) for i in range(S)]
    )
    ref = jax.jit(
        jax.vmap(lambda p, s, f: step_jit(compiled.static, p, None, s, f), in_axes=(0, 0, 0))
    )
    for _ in range(N_FRAMES):
        states, out_ref = ref(params, states, frames)

    for i in range(2):
        got = np.load(outs[i])
        assert int(got["pid"]) == i
        assert int(got["alive_count"]) == int(np.asarray(out_ref.alive_count)[i]), logs[i]
        np.testing.assert_allclose(got["px"], np.asarray(states.px)[i], atol=1e-6)
        np.testing.assert_allclose(got["age"], np.asarray(states.age)[i], atol=1e-6)
