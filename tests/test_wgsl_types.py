"""Type inference over the WGSL subset (shaders/wgsl_types).

The reference's shader is type-checked by naga every run
(`/root/reference/src/plugin.rs:36-41`); with no WGSL compiler in this
image, wgsl_types is the stand-in. Two halves:

1. the shipped shaders pass CLEAN under every shader-def combination the
   specializer can produce, and
2. a battery of deliberately TYPE-broken mutations (each one a legal-name,
   balanced-brace edit the structural checker alone cannot see) is caught —
   the VERDICT r2 #6 acceptance: "a deliberately type-broken shader
   mutation is caught by CI (today it is not)".
"""

import pathlib

import pytest

from bevy_firework_tpu.shaders.specialize import preprocess
from bevy_firework_tpu.shaders.wgsl_check import check_wgsl
from bevy_firework_tpu.shaders.wgsl_types import type_check_wgsl

_SHADER_DIR = pathlib.Path(__file__).resolve().parent.parent / "bevy_firework_tpu" / "shaders"

DEF_COMBOS = [set(), {"DEPTH_PREPASS"}, {"MULTISAMPLED"}, {"DEPTH_PREPASS", "MULTISAMPLED"},
              {"DEPTH_PREPASS", "FOG"}, {"DEPTH_PREPASS", "SHADOW_MAP", "FOG"}]


def _src(shader, defs=frozenset({"DEPTH_PREPASS", "MULTISAMPLED"})):
    return preprocess((_SHADER_DIR / shader).read_text(), set(defs))


@pytest.mark.parametrize("shader", ["particles.wgsl", "ribbons.wgsl"])
@pytest.mark.parametrize("defs", DEF_COMBOS, ids=lambda d: "+".join(sorted(d)) or "none")
def test_shipped_shaders_type_clean(shader, defs):
    assert type_check_wgsl(_src(shader, defs)) == []


# Each mutation is structurally valid (balanced, known names, right arity)
# so the pre-existing checker passes it; only type inference can object.
PARTICLE_MUTATIONS = [
    ("ctor-too-few", "vec4<f32>(out.world_position, 1.0)",
     "vec4<f32>(out.world_position)"),
    ("ctor-too-many", "vec4<f32>(quat_rotate(twist, cam_right), 1.0)",
     "vec3<f32>(quat_rotate(twist, cam_right), 1.0)"),
    ("swizzle-unknown-letter", "in.pos_scale.xyz", "in.pos_scale.xyq"),
    ("swizzle-out-of-range", "corner.x * cam_right", "corner.z * cam_right"),
    ("dot-width-mismatch", "dot(q.xyz, dir)", "dot(q, dir)"),
    ("cross-on-vec4", "cross(a.xyz, b.xyz)", "cross(a, b.xyz)"),
    ("assign-scalar-to-vec", "out.uv = corner + vec2<f32>(0.5, 0.5);",
     "out.uv = corner.x;"),
    ("assign-to-let", "let scale = in.pos_scale.w;",
     "let scale = in.pos_scale.w; scale = 2.0;"),
    ("return-wrong-type", "return out_color;", "return out_color.rgb;"),
    ("texture-coords-width", "textureSample(base_tex, base_samp, in.uv)",
     "textureSample(base_tex, base_samp, in.world_position)"),
    ("bitand-with-float", "(system.flags & FLAG_BASE_COLOR_TEXTURE)",
     "(system.flags & system.fade_edge)"),
    ("mat-vec-width", "view.view_proj * vec4<f32>(out.world_position, 1.0)",
     "view.view_proj * out.world_position"),
    ("cmp-u32-with-float", "system.pbr != 0u", "system.pbr != 0.5"),
    ("negate-u32", "let coords = vec2<i32>(frag_coord.xy);",
     "let coords = vec2<i32>(frag_coord.xy); let bad = -sample_index;"),
    ("smoothstep-mixed-widths", "smoothstep(0.0, system.fade_scene, diff)",
     "smoothstep(0.0, system.fade_scene, in.uv)"),
    ("assign-vec-to-scalar-field",
     "color.a = color.a * (1.0 - t * t * (3.0 - 2.0 * t));",
     "color.a = color * (1.0 - t);"),
    ("user-fn-wrong-param-type", "quat_rotate(twist, offset_cam)",
     "quat_rotate(twist.xyz, offset_cam)"),
    ("logical-and-on-u32", "if (system.pbr != 0u) {",
     "if ((system.pbr != 0u) && system.flags) {"),
    ("array-elem-width", "vec2<f32>(-0.5, -0.5), vec2<f32>(0.5, -0.5), vec2<f32>(0.5, 0.5),",
     "vec2<f32>(-0.5, -0.5), vec3<f32>(0.5, -0.5, 0.0), vec2<f32>(0.5, 0.5),"),
    ("index-by-float", "corners[in.vertex_index]", "corners[in.pos_scale.w]"),
]


@pytest.mark.parametrize("name,find,rep", PARTICLE_MUTATIONS,
                         ids=[m[0] for m in PARTICLE_MUTATIONS])
def test_type_broken_particle_mutation_caught(name, find, rep):
    src = _src("particles.wgsl")
    assert find in src, f"mutation target drifted: {name}"
    assert type_check_wgsl(src.replace(find, rep)) != [], name
    # and the public checker (what CI calls) reports it too
    assert check_wgsl(src.replace(find, rep)) != [], name


FOG_MUTATIONS = [
    ("fog-mix-widths", "mix(color.rgb, fog_rgb, fog_amount(dist))",
     "mix(color, fog_rgb, fog_amount(dist))"),
    ("fog-uniform-field", "fog.base_color.rgb", "fog.base_colour.rgb"),
    ("fog-scalar-vec-cmp", "if (fog.directional_light.a > 0.0) {",
     "if (fog.directional_light > 0.0) {"),
]


@pytest.mark.parametrize("name,find,rep", FOG_MUTATIONS,
                         ids=[m[0] for m in FOG_MUTATIONS])
def test_type_broken_fog_mutation_caught(name, find, rep):
    src = _src("particles.wgsl", frozenset({"DEPTH_PREPASS", "FOG"}))
    assert find in src, f"mutation target drifted: {name}"
    assert type_check_wgsl(src.replace(find, rep)) != [], name


RIBBON_MUTATIONS = [
    ("mix-mismatched", "mix(in.color0, in.color1, t)", "mix(in.color0, in.p0_w0.xyz, t)"),
    ("mod-on-float", "in.vertex_index % 6u", "in.vertex_index % 6.0"),
    ("ctor-width", "vec4<f32>(center + offset * half_w * side, 1.0)",
     "vec4<f32>(center + offset * half_w * side)"),
    ("scalar-vec-assign", "offset = view.inverse_view[0].xyz;",
     "offset = view.inverse_view[0].x;"),
]


@pytest.mark.parametrize("name,find,rep", RIBBON_MUTATIONS,
                         ids=[m[0] for m in RIBBON_MUTATIONS])
def test_type_broken_ribbon_mutation_caught(name, find, rep):
    src = _src("ribbons.wgsl")
    assert find in src, f"mutation target drifted: {name}"
    assert type_check_wgsl(src.replace(find, rep)) != [], name


def test_subset_escapes_error_not_silence():
    """Constructs outside the checked subset must ERROR (so unchecked shader
    code can't slip in), not pass silently."""
    src = """
    fn f(p: ptr<function, f32>) -> f32 { return *p; }
    @vertex fn vertex() -> @builtin(position) vec4<f32> {
        return vec4<f32>(0.0, 0.0, 0.0, 1.0);
    }
    """
    assert type_check_wgsl(src) != []


def test_abstract_literal_conversions():
    """WGSL abstract-numeric rules: int literals feed f32/u32/i32 slots;
    float literals feed f32 but NOT u32/i32."""
    ok = """
    fn f() -> f32 {
        let a: f32 = 1;       // aint -> f32
        let b: u32 = 2;       // aint -> u32
        let c = 1 + 2.5;      // aint + afloat -> afloat -> f32
        var v = vec3<f32>(0, 1, 2);
        return a + b_to_f(b) + c + v.x;
    }
    fn b_to_f(x: u32) -> f32 { return f32(x); }
    """
    assert type_check_wgsl(ok) == []
    bad = "fn f() -> u32 { let a: u32 = 1.5; return a; }"
    assert type_check_wgsl(bad) != []
    bad2 = "fn f() -> f32 { let a: f32 = 1.0; let b: u32 = 2u; return a + b; }"
    assert type_check_wgsl(bad2) != []
