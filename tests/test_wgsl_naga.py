"""Real-compiler WGSL validation via wgpu-native (naga) — VERDICT r3 #4.

The reference gets naga validation free on every run (Bevy compiles
`src/particles.wgsl` at plugin init, `/root/reference/src/plugin.rs:36-41`).
This image cannot install wgpu, so these tests self-skip locally; the CI
`test-wgsl` job (ubuntu-latest, `.github/workflows/ci.yaml`) installs
`wgpu` + mesa's software Vulkan driver and runs them, so every shipped
shader AND every specialize def-combination passes a real compiler — the
hand-written checker (`shaders/wgsl_check.py` / `wgsl_types.py`) remains the
always-on gate, this is the periodic ground truth.
"""

import itertools

import pytest

wgpu = pytest.importorskip("wgpu")

from bevy_firework_tpu.shaders import particles_wgsl_source, ribbons_wgsl_source
from bevy_firework_tpu.shaders.specialize import preprocess

PARTICLE_DEFS = ("MULTISAMPLED", "DEPTH_PREPASS", "SHADOW_MAP", "FOG", "LIGHTS", "SHADOW_ATLAS")


@pytest.fixture(scope="module")
def device():
    try:
        adapter = wgpu.gpu.request_adapter_sync(force_fallback_adapter=True)
    except Exception:
        try:  # fall back to any adapter (CI installs lavapipe)
            adapter = wgpu.gpu.request_adapter_sync()
        except Exception as e:  # pragma: no cover - environment-dependent
            pytest.skip(f"no wgpu adapter available: {e}")
    return adapter.request_device_sync()


def _validate(device, code: str):
    """Compile `code`; return a list of error strings ([] = valid)."""
    try:
        module = device.create_shader_module(code=code)
    except Exception as e:
        return [str(e)]
    try:
        info = module.get_compilation_info_sync()
    except Exception:
        return []  # older wgpu-py: creation raising is the only signal
    return [str(m) for m in info if getattr(m, "type", "") == "error"]


@pytest.mark.parametrize(
    "defs",
    [frozenset(c) for r in range(len(PARTICLE_DEFS) + 1)
     for c in itertools.combinations(PARTICLE_DEFS, r)],
    ids=lambda d: "+".join(sorted(d)) or "default",
)
def test_particles_variants_pass_naga(device, defs):
    errors = _validate(device, preprocess(particles_wgsl_source(), defs))
    assert not errors, errors


def test_ribbons_passes_naga(device):
    errors = _validate(device, preprocess(ribbons_wgsl_source(), frozenset()))
    assert not errors, errors


def test_naga_gate_is_live(device):
    """A deliberately type-broken shader must FAIL real validation — proves
    the job tests something (the checker-liveness pattern of
    test_wgsl_types.py, applied to the external compiler)."""
    broken = preprocess(particles_wgsl_source(), frozenset()).replace(
        "fn vertex(", "fn _broken() -> f32 { return vec3<f32>(1.0); }\nfn vertex(", 1)
    assert _validate(device, broken), "naga accepted a type-broken shader"
