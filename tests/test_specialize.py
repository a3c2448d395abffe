"""Pipeline specialization: the reference's exact key->variant mapping,
executed (SURVEY components #18/#19).

Pins, against `/root/reference/src/render.rs`:
  * every reachable (msaa x prepass x hdr x alpha_mode) variant of the
    shipped WGSL preprocesses AND passes the static checker — shader rot
    in any branch of an `#ifdef` fails here, not at a consumer;
  * the target blend state is ALWAYS standard alpha blending
    (`render.rs:855-859`), regardless of alpha_mode;
  * alpha_mode -> key bits (`render.rs:519-535`), with Premultiplied and
    Add sharing one key;
  * MULTISAMPLED swaps the depth binding to the multisampled texture type
    and the textureLoad gains a sample index (`particles.wgsl:241-249`);
  * DEPTH_PREPASS compiles the scene-fade block in/out;
  * dummy bindings: every layout slot is filled — absent textures get 1x1
    dummies, absent prepass gets the per-sample-count depth dummy
    (`render.rs:85-241`).
"""

import itertools

import numpy as np
import pytest

from bevy_firework_tpu.shaders import particles_wgsl_source
from bevy_firework_tpu.shaders.specialize import (
    ALPHA_ADD,
    ALPHA_BLEND,
    ALPHA_BLENDING,
    ALPHA_MASK,
    ALPHA_MULTIPLY,
    ALPHA_OPAQUE,
    ALPHA_PREMULTIPLIED,
    BLEND_ALPHA,
    BLEND_MULTIPLY,
    BLEND_PREMULTIPLIED_ALPHA,
    MAY_DISCARD,
    DummyTextures,
    PipelineCache,
    PipelineKey,
    key_for,
    preprocess,
)
from bevy_firework_tpu.shaders.wgsl_check import check_wgsl

ALL_ALPHA_MODES = (ALPHA_OPAQUE, ALPHA_MASK, ALPHA_BLEND, ALPHA_PREMULTIPLIED, ALPHA_ADD, ALPHA_MULTIPLY)


# ---------------------------------------------------------------------------
# preprocessor
# ---------------------------------------------------------------------------


def test_preprocess_basic_branches():
    src = "a\n#ifdef X\nb\n#else\nc\n#endif\nd\n"
    assert preprocess(src, {"X"}).split() == ["a", "b", "d"]
    assert preprocess(src, set()).split() == ["a", "c", "d"]


def test_preprocess_nested_and_ifndef():
    src = "#ifdef A\n1\n#ifndef B\n2\n#else\n3\n#endif\n#endif\n"
    assert preprocess(src, {"A"}).split() == ["1", "2"]
    assert preprocess(src, {"A", "B"}).split() == ["1", "3"]
    assert preprocess(src, set()).split() == []


def test_preprocess_rejects_unbalanced():
    with pytest.raises(ValueError):
        preprocess("#ifdef A\nx\n")
    with pytest.raises(ValueError):
        preprocess("#endif\n")


# ---------------------------------------------------------------------------
# every reachable variant compiles (static checker)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("msaa", [1, 4])
@pytest.mark.parametrize("prepass", [False, True])
@pytest.mark.parametrize("hdr", [False, True])
def test_all_variants_pass_checker(msaa, prepass, hdr):
    cache = PipelineCache()
    for mode in ALL_ALPHA_MODES:
        key = key_for(mode, msaa_samples=msaa, depth_prepass=prepass, hdr=hdr)
        variant = cache.specialize(key)
        assert check_wgsl(variant.shader_source) == []


def test_multisampled_variant_swaps_depth_texture_type():
    cache = PipelineCache()
    msaa = cache.specialize(PipelineKey(msaa_samples=4, depth_prepass=True)).shader_source
    single = cache.specialize(PipelineKey(msaa_samples=1, depth_prepass=True)).shader_source
    assert "texture_depth_multisampled_2d" in msaa
    assert "i32(sample_index)" in msaa
    assert "texture_depth_multisampled_2d" not in single
    # both still declare the binding (the layout always carries it)
    assert "depth_prepass: texture_depth_2d" in single


def test_depth_prepass_def_gates_scene_fade():
    cache = PipelineCache()
    with_pp = cache.specialize(PipelineKey(depth_prepass=True)).shader_source
    without = cache.specialize(PipelineKey(depth_prepass=False)).shader_source
    assert "fade_scene" in with_pp and "prepass_depth_at" in with_pp
    # compiled out entirely without the prepass (reference #ifdef DEPTH_PREPASS)
    assert "prepass_depth_at" not in without
    assert "smoothstep(0.0, system.fade_scene" not in without


def test_checker_gates_every_branch():
    """A regression hiding in the MULTISAMPLED-only branch is caught."""
    bad = particles_wgsl_source().replace("i32(sample_index)", "i32(sample_indexx)")
    cache = PipelineCache(source=bad)
    cache.specialize(PipelineKey(msaa_samples=1, depth_prepass=True))  # branch unused: fine
    with pytest.raises(ValueError):
        cache.specialize(PipelineKey(msaa_samples=4, depth_prepass=True))


# ---------------------------------------------------------------------------
# key mapping + descriptor invariants (render.rs:519-535, 775-867)
# ---------------------------------------------------------------------------


def test_alpha_mode_key_bits():
    assert key_for(ALPHA_BLEND).blend_bit == BLEND_ALPHA
    assert key_for(ALPHA_PREMULTIPLIED).blend_bit == BLEND_PREMULTIPLIED_ALPHA
    # Premultiplied and Add SHARE one pipeline key (render.rs:523-527)
    assert key_for(ALPHA_ADD).blend_bit == BLEND_PREMULTIPLIED_ALPHA
    assert key_for(ALPHA_PREMULTIPLIED) == key_for(ALPHA_ADD)
    assert key_for(ALPHA_MULTIPLY).blend_bit == BLEND_MULTIPLY
    assert key_for(ALPHA_MASK).blend_bit == MAY_DISCARD
    assert key_for(ALPHA_OPAQUE).blend_bit is None


def test_blend_state_is_always_alpha_blending():
    """render.rs:855-859: the hardware blend equation never varies with
    alpha_mode — the round-trip trap this module exists to document."""
    cache = PipelineCache()
    for mode, msaa, prepass in itertools.product(ALL_ALPHA_MODES, (1, 4), (False, True)):
        v = cache.specialize(key_for(mode, msaa_samples=msaa, depth_prepass=prepass))
        assert v.blend == ALPHA_BLENDING
        assert v.multisample_count == msaa
        assert v.depth_compare == "greater" and v.depth_write_enabled is False
        assert v.cull_mode is None and v.topology == "triangle-list"


def test_target_format_tracks_hdr():
    assert PipelineKey(hdr=True).target_format() == "rgba16float"
    assert PipelineKey(hdr=False).target_format() == "bgra8unorm-srgb"


def test_cache_memoizes():
    cache = PipelineCache()
    a = cache.specialize(PipelineKey(depth_prepass=True))
    b = cache.specialize(PipelineKey(depth_prepass=True))
    assert a is b
    # alpha_mode variants that share key bits share the pipeline
    c = cache.specialize(key_for(ALPHA_PREMULTIPLIED))
    d = cache.specialize(key_for(ALPHA_ADD))
    assert c is d
    assert len(cache) == 2


# ---------------------------------------------------------------------------
# layout + dummy bindings (render.rs:85-241, 820-824)
# ---------------------------------------------------------------------------


def test_layout_depth_entry_always_present_and_msaa_swaps_it():
    cache = PipelineCache()
    plain = cache.specialize(PipelineKey(msaa_samples=1)).layout
    msaa = cache.specialize(PipelineKey(msaa_samples=4)).layout
    d1 = next(e for e in plain if e["binding"] == 1)
    d4 = next(e for e in msaa if e["binding"] == 1)
    assert d1["sample_type"] == "depth" and d1["multisampled"] is False
    assert d4["sample_type"] == "depth" and d4["multisampled"] is True
    assert [e["binding"] for e in plain] == [0, 1, 2, 3, 4, 5, 6, 7]


def test_dummy_bindings_fill_every_slot():
    dummies = DummyTextures()
    key = PipelineKey(msaa_samples=4, depth_prepass=False)
    entries = dummies.bind_group_entries(flags=0, key=key)
    assert [e["binding"] for e in entries] == [0, 1, 2, 3, 4, 5, 6, 7]
    depth = next(e for e in entries if e["binding"] == 1)
    assert depth["real"] is False
    assert 4 in dummies.depth_textures  # per-sample-count dummy created
    for b in (2, 4, 6):
        e = next(x for x in entries if x["binding"] == b)
        assert e["real"] is False
        np.testing.assert_array_equal(e["resource"], np.ones((1, 1, 4), np.float32))


def test_real_textures_bound_when_flagged():
    dummies = DummyTextures()
    tex = np.zeros((8, 8, 4), np.float32)
    prepass = np.zeros((16, 16), np.float32)
    entries = dummies.bind_group_entries(
        flags=1 | 4,  # base + orm real, normal absent
        key=PipelineKey(depth_prepass=True),
        textures={"base_color": tex, "orm": tex},
        prepass_texture=prepass,
    )
    by_binding = {e["binding"]: e for e in entries}
    assert by_binding[1]["real"] is True and by_binding[1]["resource"] is prepass
    assert by_binding[2]["real"] is True and by_binding[2]["resource"] is tex
    assert by_binding[4]["real"] is False  # dummy despite textures dict: flag unset
    assert by_binding[6]["real"] is True


def test_flag_without_texture_falls_back_to_dummy():
    dummies = DummyTextures()
    entries = dummies.bind_group_entries(flags=1, key=PipelineKey(), textures={})
    assert next(e for e in entries if e["binding"] == 2)["real"] is False


def test_shadow_map_key_bit_specializes():
    """SHADOW_MAP (VERDICT r2 next #7): the key bit adds the def, the
    shadow_factor sampling code, and group(2) bindings 8-10 (light uniform,
    depth map, comparison sampler); without the bit none of them appear."""
    cache = PipelineCache()
    v = cache.specialize(key_for(ALPHA_BLEND, depth_prepass=True, shadow_map=True))
    assert "SHADOW_MAP" in v.shader_defs
    assert "shadow_factor" in v.shader_source
    assert "textureSampleCompare" in v.shader_source
    assert [e["binding"] for e in v.layout] == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    shadow_samp = next(e for e in v.layout if e["binding"] == 10)
    assert shadow_samp.get("comparison") is True
    plain = cache.specialize(key_for(ALPHA_BLEND, depth_prepass=True))
    assert "SHADOW_MAP" not in plain.shader_defs
    assert "shadow_factor" not in plain.shader_source
    assert [e["binding"] for e in plain.layout] == [0, 1, 2, 3, 4, 5, 6, 7]


def test_shadow_dummy_binds_fully_lit():
    """With no real shadow map, the 1x1 depth-1.0 dummy binds at 9 (every
    less-equal compare passes => fully lit), mirroring the prepass dummy."""
    dummies = DummyTextures()
    key = key_for(ALPHA_BLEND, shadow_map=True)
    entries = dummies.bind_group_entries(flags=0, key=key)
    by_binding = {e["binding"]: e for e in entries}
    assert set(by_binding) == {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10}
    assert by_binding[9]["real"] is False
    np.testing.assert_array_equal(by_binding[9]["resource"], np.ones((1, 1), np.float32))
    assert by_binding[10]["resource"] == {"compare": "less-equal"}
    real = np.zeros((64, 64), np.float32)
    entries = dummies.bind_group_entries(flags=0, key=key, shadow_texture=real)
    assert next(e for e in entries if e["binding"] == 9)["real"] is True


def test_fog_key_bit_specializes():
    """FOG (VERDICT r2 missing #3, the 'fog' half): the key bit adds the
    def, the apply_fog mix, and the FogUniform at group(2) binding 11 — a
    fixed slot regardless of shadow_map so the variants compose; without
    the bit none of them appear."""
    cache = PipelineCache()
    v = cache.specialize(key_for(ALPHA_BLEND, depth_prepass=True, fog=True))
    assert "FOG" in v.shader_defs
    assert "apply_fog" in v.shader_source
    assert "fog_amount" in v.shader_source
    assert [e["binding"] for e in v.layout] == [0, 1, 2, 3, 4, 5, 6, 7, 11]
    fe = next(e for e in v.layout if e["binding"] == 11)
    assert fe["type"] == "uniform-buffer" and fe["size"] == 64
    plain = cache.specialize(key_for(ALPHA_BLEND, depth_prepass=True))
    assert "FOG" not in plain.shader_defs
    assert "apply_fog" not in plain.shader_source
    both = cache.specialize(
        key_for(ALPHA_BLEND, depth_prepass=True, shadow_map=True, fog=True))
    assert [e["binding"] for e in both.layout] == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]
    assert "shadow_factor" in both.shader_source and "apply_fog" in both.shader_source
    # dummy bind-group entries cover the fog slot (no dummy texture needed:
    # the uniform itself carries mode/opacity)
    entries = DummyTextures().bind_group_entries(flags=0, key=key_for(ALPHA_BLEND, fog=True))
    assert any(e["binding"] == 11 for e in entries)


def test_lights_key_bit_specializes():
    """LIGHTS (VERDICT r3 next #5): the key bit adds the def, the light
    loop in pbr_shade, and the LightsUniform at group(2) binding 12 — a
    fixed slot composing with shadow/fog; without the bit none appear."""
    cache = PipelineCache()
    v = cache.specialize(key_for(ALPHA_BLEND, lights=True))
    assert "LIGHTS" in v.shader_defs
    assert "light_table" in v.shader_source
    assert "distance_attenuation" in v.shader_source
    le = next(e for e in v.layout if e["binding"] == 12)
    assert le["type"] == "uniform-buffer" and le["size"] == 1216  # 16 lights + env SH (r5)
    plain = cache.specialize(key_for(ALPHA_BLEND))
    assert "LIGHTS" not in plain.shader_defs
    assert "light_table" not in plain.shader_source
    everything = cache.specialize(key_for(
        ALPHA_BLEND, depth_prepass=True, shadow_map=True, fog=True, lights=True))
    assert [e["binding"] for e in everything.layout] == [
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    entries = DummyTextures().bind_group_entries(flags=0, key=key_for(ALPHA_BLEND, lights=True))
    assert any(e["binding"] == 12 for e in entries)


def test_light_table_bytes_layout():
    """std140 packing: 544 B total — counts uvec4, ambient vec4, 8 rows of
    4 vec4 (position+range, color+kind, direction+cos_outer, cos_inner)."""
    import numpy as np

    from bevy_firework_tpu import Light, LightTable

    t = LightTable(
        lights=(Light.directional((0.0, -1.0, 0.0), illuminance=2.0),
                Light.point((1.0, 2.0, 3.0), intensity=4.0 * np.pi, range=10.0),
                Light.spot((0.0, 5.0, 0.0), (0.0, -1.0, 0.0),
                           inner_angle=0.3, outer_angle=0.5)),
        ambient=(0.1, 0.2, 0.3),
    )
    raw = t.to_bytes()
    assert len(raw) == 1216  # uvec4 + vec4 + 16 x 4 vec4 rows + 10 env vec4
    head = np.frombuffer(raw[:32], np.float32)
    assert head[:4].view(np.uint32)[0] == 3
    np.testing.assert_allclose(head[4:7], [0.1, 0.2, 0.3])
    rows = np.frombuffer(raw[32:32 + 1024], np.float32).reshape(16, 16)
    np.testing.assert_allclose(rows[0, 4:7], [2.0, 2.0, 2.0])  # illuminance premul
    assert rows[0, 7] == 0.0 and rows[1, 7] == 1.0 and rows[2, 7] == 2.0
    np.testing.assert_allclose(rows[1, 0:4], [1.0, 2.0, 3.0, 10.0])
    np.testing.assert_allclose(rows[1, 4:7], [1.0, 1.0, 1.0])  # 4pi lumens / 4pi
    np.testing.assert_allclose(rows[2, 11], np.cos(0.5), rtol=1e-6)
    np.testing.assert_allclose(rows[2, 12], np.cos(0.3), rtol=1e-6)
    assert np.all(rows[3:] == 0.0)


def test_lights_shadow_applies_to_first_directional_row():
    """SHADOW_MAP + LIGHTS: the shadow gate must find the FIRST directional
    row wherever it sits in the table, not hard-code light index 0 (a table
    ordered (point, directional) silently lost shadows)."""
    cache = PipelineCache()
    v = cache.specialize(key_for(ALPHA_BLEND, shadow_map=True, lights=True))
    assert "shadow_pending" in v.shader_source
    assert "i == 0u && kind" not in v.shader_source


def test_shadow_atlas_key_specializes():
    """SHADOW_ATLAS (VERDICT r4 next #5): the key bit adds the def, the
    per-light factor in the light loop, and bindings 13-15 (matrix-array
    uniform, tiled depth atlas, comparison sampler). It requires `lights`
    (the atlas attenuates light-table rows)."""
    cache = PipelineCache()
    v = cache.specialize(key_for(ALPHA_BLEND, lights=True, shadow_atlas=True))
    assert "SHADOW_ATLAS" in v.shader_defs and "LIGHTS" in v.shader_defs
    assert "shadow_atlas_factor" in v.shader_source
    u = next(e for e in v.layout if e["binding"] == 13)
    assert u["type"] == "uniform-buffer" and u["size"] == 1040  # 16 mat4 + params
    t = next(e for e in v.layout if e["binding"] == 14)
    assert t["sample_type"] == "depth"
    s = next(e for e in v.layout if e["binding"] == 15)
    assert s["comparison"] is True
    with pytest.raises(ValueError):
        cache.specialize(key_for(ALPHA_BLEND, shadow_atlas=True))


def test_shadow_atlas_dummy_binding():
    from bevy_firework_tpu.shaders.specialize import DummyTextures

    d = DummyTextures()
    entries = d.bind_group_entries(0, key_for(ALPHA_BLEND, lights=True, shadow_atlas=True))
    e14 = next(e for e in entries if e["binding"] == 14)
    assert e14["real"] is False  # depth-1.0 dummy => fully lit
    real = np.zeros((64, 64), np.float32)
    entries = d.bind_group_entries(0, key_for(ALPHA_BLEND, lights=True, shadow_atlas=True),
                                   shadow_atlas_texture=real)
    e14 = next(e for e in entries if e["binding"] == 14)
    assert e14["real"] is True and e14["resource"] is real
