// Billboard particle shader — the render-contract consumer.
//
// Original implementation of the semantics documented in SURVEY.md §A.6 and
// docs/RENDER_CONTRACT.md (reference behaviour: camera-facing quads whose
// world rotation contributes only its twist about the view axis; fragment
// does flag-gated texturing, radial edge fade, depth-prepass scene fade,
// then an unlit or PBR-lit output).
//
// Instance layout (64 bytes, locations 3-6):
//   loc3 = vec4(position.xyz, scale)
//   loc4 = vec4(rotation quaternion, xyzw)
//   loc5 = base color rgba (linear)
//   loc6 = emissive color rgba (linear)
//
// Host engines provide group(0)/group(1) view + lighting bindings in their
// own idiom; group(2) is this system's uniform + textures.
//
// Shader defs (naga_oil-style `#ifdef`, resolved by shaders.specialize
// before compilation — the reference's FireworkSpecializer mapping,
// `/root/reference/src/render.rs:805-867`):
//   DEPTH_PREPASS — depth-prepass texture bound; gates the whole
//     scene-fade block (compiled out without it, reference
//     particles.wgsl:149-155).
//   MULTISAMPLED  — the prepass texture is multisampled; textureLoad
//     takes a sample index (reference particles.wgsl:241-249).
//   SHADOW_MAP    — a directional shadow map is bound at group(2)
//     bindings 8-10; pbr_shade attenuates the direct term by a 4-tap PCF
//     factor (the reference gets shadows from Bevy's clustered PBR via
//     apply_pbr_lighting, reference particles.wgsl:180-239; this def is
//     the self-contained analog at the same seam).
//   LIGHTS        — a light table is bound at group(2) binding 12 and
//     pbr_shade loops it (N directional + point + spot lights with Bevy's
//     attenuation/cone semantics + table ambient), replacing the built-in
//     single-directional environment. The reference inherits exactly this
//     from Bevy's clustered apply_pbr_lighting
//     (reference particles.wgsl:180-239).
//   FOG           — a distance-fog uniform is bound at group(2) binding 11;
//     the fragment's final color (unlit AND lit — fog is a view effect,
//     applied after the lighting branch like Bevy's pbr.wgsl fragment) is
//     mixed toward the fog color by a linear / exp / exp2 falloff with
//     optional directional-light inscattering (Bevy DistanceFog semantics;
//     the reference inherits this from apply_pbr_lighting's fog stage).

struct ViewLike {
    view_proj: mat4x4<f32>,
    inverse_view: mat4x4<f32>,
    world_position: vec3<f32>,
};

struct SystemUniform {
    alpha_mode: u32,      // 0 opaque, 2 blend, 3 premultiplied, 4 add, 5 multiply
    pbr: u32,             // 0 unlit, 1 lit
    fade_edge: f32,       // 0..1: radial soft-edge width
    fade_scene: f32,      // soft scene-intersection range (world units)
    flags: u32,           // bit0 base tex, bit1 normal map, bit2 orm tex
    _pad: vec3<f32>,
};

const FLAG_BASE_COLOR_TEXTURE: u32 = 1u;
const FLAG_NORMAL_MAP_TEXTURE: u32 = 2u;
const FLAG_ORM_TEXTURE: u32 = 4u;

@group(0) @binding(0) var<uniform> view: ViewLike;

@group(2) @binding(0) var<uniform> system: SystemUniform;
#ifdef MULTISAMPLED
@group(2) @binding(1) var depth_prepass: texture_depth_multisampled_2d;
#else // MULTISAMPLED
@group(2) @binding(1) var depth_prepass: texture_depth_2d;
#endif // MULTISAMPLED
@group(2) @binding(2) var base_tex: texture_2d<f32>;
@group(2) @binding(3) var base_samp: sampler;
@group(2) @binding(4) var normal_tex: texture_2d<f32>;
@group(2) @binding(5) var normal_samp: sampler;
@group(2) @binding(6) var orm_tex: texture_2d<f32>;
@group(2) @binding(7) var orm_samp: sampler;
#ifdef SHADOW_MAP
struct ShadowUniform {
    light_view_proj: mat4x4<f32>,  // world -> light clip (0..1 depth)
    params: vec4<f32>,             // x = depth bias, y = strength in [0,1]
};
@group(2) @binding(8) var<uniform> shadow: ShadowUniform;
@group(2) @binding(9) var shadow_map: texture_depth_2d;
@group(2) @binding(10) var shadow_samp: sampler_comparison;

// Directional shadow factor at a world position: 1 = fully lit, toward
// (1 - strength) in shadow. 4-tap PCF with a comparison sampler
// (sample passes when stored depth >= ref - bias, i.e. nothing nearer to
// the light wrote the map there).
fn shadow_factor(world_pos: vec3<f32>) -> f32 {
    let lc = shadow.light_view_proj * vec4<f32>(world_pos, 1.0);
    let ndc = lc.xyz / lc.w;
    let uv = ndc.xy * vec2<f32>(0.5, -0.5) + vec2<f32>(0.5, 0.5);
    if (uv.x < 0.0 || uv.x > 1.0 || uv.y < 0.0 || uv.y > 1.0 || ndc.z > 1.0) {
        return 1.0;
    }
    let ref_depth = ndc.z - shadow.params.x;
    let texel = 1.0 / vec2<f32>(textureDimensions(shadow_map));
    var lit = textureSampleCompare(shadow_map, shadow_samp, uv + vec2<f32>(-0.5, -0.5) * texel, ref_depth);
    lit = lit + textureSampleCompare(shadow_map, shadow_samp, uv + vec2<f32>(0.5, -0.5) * texel, ref_depth);
    lit = lit + textureSampleCompare(shadow_map, shadow_samp, uv + vec2<f32>(-0.5, 0.5) * texel, ref_depth);
    lit = lit + textureSampleCompare(shadow_map, shadow_samp, uv + vec2<f32>(0.5, 0.5) * texel, ref_depth);
    return 1.0 - shadow.params.y * (1.0 - lit * 0.25);
}
#endif // SHADOW_MAP
#ifdef LIGHTS
// Light table (Bevy PBR environment semantics — the reference's fragment
// inherits point/spot/directional lights + ambient from apply_pbr_lighting;
// this def is the self-contained analog). kind: 0 directional, 1 point,
// 2 spot. Point/spot use Bevy's smooth-window inverse-square attenuation
// (getDistanceAttenuation) and spot cone falloff
// (saturate((cos - cos_outer) / (cos_inner - cos_outer))^2).
struct TableLight {
    position_range: vec4<f32>,   // xyz world position (unused for dir), w = range
    color_kind: vec4<f32>,       // rgb = color * premultiplied intensity, a = kind
    direction_outer: vec4<f32>,  // xyz TOWARD the scene (dir/spot), w = cos outer
    extra: vec4<f32>,            // x = cos inner (spot), yzw pad
};
struct LightsUniform {
    counts: vec4<u32>,           // x = number of live rows, y = env light flag
    ambient: vec4<f32>,          // rgb ambient, a unused
    lights: array<TableLight, 16>,
    env_sh: array<vec4<f32>, 9>, // environment radiance SH-L2 (rgb, w pad)
    env_params: vec4<f32>,       // x = environment intensity
};
@group(2) @binding(12) var<uniform> light_table: LightsUniform;

// Bevy's getDistanceAttenuation: smooth window falloff times inverse square
fn distance_attenuation(dist_sq: f32, inv_range_sq: f32) -> f32 {
    let factor = dist_sq * inv_range_sq;
    let smooth_factor = clamp(1.0 - factor * factor, 0.0, 1.0);
    return smooth_factor * smooth_factor / max(dist_sq, 0.0001);
}

// --- environment light (SH IBL; render.EnvironmentLight is the oracle) ----
// The reference inherits Bevy's EnvironmentMapLight (diffuse irradiance +
// prefiltered specular cube maps) via apply_pbr_lighting; here the
// environment radiance is 9 RGB SH-L2 coefficients. Diffuse applies the
// cosine convolution over pi (A_l/pi = [1, 2/3, 1/4]); specular evaluates
// the SH at the reflection vector with a per-band roughness window
// (w_l = exp(-l(l+1) rough^2), the SH analog of a prefiltered mip) times
// Karis' analytic split-sum env BRDF.
fn env_sh_eval(d: vec3<f32>, w1: f32, w2: f32) -> vec3<f32> {
    var c = light_table.env_sh[0].rgb * 0.282095;
    c = c + (light_table.env_sh[1].rgb * (0.488603 * d.y)
           + light_table.env_sh[2].rgb * (0.488603 * d.z)
           + light_table.env_sh[3].rgb * (0.488603 * d.x)) * w1;
    c = c + (light_table.env_sh[4].rgb * (1.092548 * d.x * d.y)
           + light_table.env_sh[5].rgb * (1.092548 * d.y * d.z)
           + light_table.env_sh[6].rgb * (0.315392 * (3.0 * d.z * d.z - 1.0))
           + light_table.env_sh[7].rgb * (1.092548 * d.x * d.z)
           + light_table.env_sh[8].rgb * (0.546274 * (d.x * d.x - d.y * d.y))) * w2;
    return c * light_table.env_params.x;
}

fn env_irradiance(n: vec3<f32>) -> vec3<f32> {
    return env_sh_eval(n, 2.0 / 3.0, 0.25);
}

fn env_specular(r: vec3<f32>, rough: f32) -> vec3<f32> {
    let r2 = rough * rough;
    return max(env_sh_eval(r, exp(-2.0 * r2), exp(-6.0 * r2)),
               vec3<f32>(0.0, 0.0, 0.0));
}

fn env_brdf_approx(f0: vec3<f32>, rough: f32, nv: f32) -> vec3<f32> {
    let c0 = vec4<f32>(-1.0, -0.0275, -0.572, 0.022);
    let c1 = vec4<f32>(1.0, 0.0425, 1.04, -0.04);
    let r4 = rough * c0 + c1;
    let a004 = min(r4.x * r4.x, exp2(-9.28 * nv)) * r4.x + r4.y;
    let ab = vec2<f32>(-1.04, 1.04) * a004 + r4.zw;
    return f0 * ab.x + vec3<f32>(ab.y, ab.y, ab.y);
}
#ifdef SHADOW_ATLAS
// Per-light shadow atlas (VERDICT r4 next #5): one depth texture holding a
// grid x grid tile array; any directional or spot row whose extra.y >= 0
// owns tile u32(extra.y) and is projected by shadow_atlas_u.mats[tile].
// The reference gets per-light shadowing from Bevy's clustered pipeline
// (directional cascades + spot maps, /root/reference/src/particles.wgsl:224);
// this is the self-contained analog. Point rows own SIX consecutive
// tiles — a cube map unrolled into the atlas, face chosen per fragment by
// dominant axis (see the light loop below; render.cube_face is the oracle).
struct ShadowAtlasUniform {
    mats: array<mat4x4<f32>, 16>,  // world -> light clip per TILE index
    params: vec4<f32>,             // x = depth bias, y = strength, z = grid
};
@group(2) @binding(13) var<uniform> shadow_atlas_u: ShadowAtlasUniform;
@group(2) @binding(14) var shadow_atlas: texture_depth_2d;
@group(2) @binding(15) var shadow_atlas_samp: sampler_comparison;

// Shadow factor for tile `tile` at a world position: 1 fully lit, toward
// (1 - strength) in shadow. Same 4-tap PCF/compare semantics as the single
// SHADOW_MAP path; uv is clamped a half-texel inside the tile so PCF taps
// never bleed into a neighboring light's tile.
fn shadow_atlas_factor(world_pos: vec3<f32>, tile: u32) -> f32 {
    let lc = shadow_atlas_u.mats[tile] * vec4<f32>(world_pos, 1.0);
    let ndc = lc.xyz / lc.w;
    let uv = ndc.xy * vec2<f32>(0.5, -0.5) + vec2<f32>(0.5, 0.5);
    if (uv.x < 0.0 || uv.x > 1.0 || uv.y < 0.0 || uv.y > 1.0 || ndc.z > 1.0 || ndc.z < 0.0) {
        return 1.0;
    }
    let grid = shadow_atlas_u.params.z;
    let atlas_texel = 1.0 / vec2<f32>(textureDimensions(shadow_atlas));
    let margin = (1.5 * grid) * atlas_texel;  // 1.5 tile-local texels
    let cuv = clamp(uv, margin, vec2<f32>(1.0, 1.0) - margin);
    let tile_xy = vec2<f32>(f32(tile % u32(grid)), floor(f32(tile) / grid));
    let auv = (tile_xy + cuv) / grid;
    let ref_depth = ndc.z - shadow_atlas_u.params.x;
    var lit = textureSampleCompare(shadow_atlas, shadow_atlas_samp, auv + vec2<f32>(-0.5, -0.5) * atlas_texel, ref_depth);
    lit = lit + textureSampleCompare(shadow_atlas, shadow_atlas_samp, auv + vec2<f32>(0.5, -0.5) * atlas_texel, ref_depth);
    lit = lit + textureSampleCompare(shadow_atlas, shadow_atlas_samp, auv + vec2<f32>(-0.5, 0.5) * atlas_texel, ref_depth);
    lit = lit + textureSampleCompare(shadow_atlas, shadow_atlas_samp, auv + vec2<f32>(0.5, 0.5) * atlas_texel, ref_depth);
    return 1.0 - shadow_atlas_u.params.y * (1.0 - lit * 0.25);
}
#endif // SHADOW_ATLAS
#endif // LIGHTS

#ifdef FOG
// Distance fog (Bevy DistanceFog semantics — the reference's fragment gets
// this stage free from apply_pbr_lighting). mode selects the falloff:
// 1 linear (params.x start, params.y end), 2 exponential (params.x density),
// 3 exponential-squared (params.x density). base_color.a scales the maximum
// fog opacity; directional_light.rgb * directional_light.a adds sun
// inscattering raised to params.z around the light direction.
struct FogUniform {
    base_color: vec4<f32>,
    directional_light: vec4<f32>,  // rgb color, a = scattering strength
    light_dir: vec4<f32>,          // xyz toward the light, w = mode
    params: vec4<f32>,             // x start/density, y end, z scatter exponent
};
@group(2) @binding(11) var<uniform> fog: FogUniform;

fn fog_amount(dist: f32) -> f32 {
    let mode = fog.light_dir.w;
    var amount = 0.0;
    if (mode == 1.0) {
        amount = clamp((dist - fog.params.x) / max(fog.params.y - fog.params.x, 1e-5), 0.0, 1.0);
    } else if (mode == 2.0) {
        amount = 1.0 - 1.0 / exp(dist * fog.params.x);
    } else if (mode == 3.0) {
        let d = dist * fog.params.x;
        amount = 1.0 - 1.0 / exp(d * d);
    }
    return amount * fog.base_color.a;
}

fn apply_fog(color: vec4<f32>, world_pos: vec3<f32>) -> vec4<f32> {
    let to_frag = world_pos - view.world_position;
    let dist = length(to_frag);
    var fog_rgb = fog.base_color.rgb;
    if (fog.directional_light.a > 0.0) {
        let view_dir = to_frag / max(dist, 1e-5);
        let alignment = max(dot(view_dir, normalize(fog.light_dir.xyz)), 0.0);
        fog_rgb = fog_rgb
            + pow(alignment, fog.params.z) * fog.directional_light.rgb * fog.directional_light.a;
    }
    return vec4<f32>(mix(color.rgb, fog_rgb, fog_amount(dist)), color.a);
}
#endif // FOG

// ---------------------------------------------------------------------------
// quaternion helpers
// ---------------------------------------------------------------------------

fn quat_mul(a: vec4<f32>, b: vec4<f32>) -> vec4<f32> {
    return vec4<f32>(
        a.w * b.xyz + b.w * a.xyz + cross(a.xyz, b.xyz),
        a.w * b.w - dot(a.xyz, b.xyz),
    );
}

fn quat_rotate(q: vec4<f32>, v: vec3<f32>) -> vec3<f32> {
    let t = 2.0 * cross(q.xyz, v);
    return v + q.w * t + cross(q.xyz, t);
}

fn quat_normalize(q: vec4<f32>) -> vec4<f32> {
    let n = length(q);
    if (n < 1e-8) {
        return vec4<f32>(0.0, 0.0, 0.0, 1.0);
    }
    return q / n;
}

// Swing-twist decomposition: extract the component of rotation q about unit
// axis `dir` (the twist). The billboard keeps only this twist so particles
// can spin in-plane while always facing the camera.
fn twist_about(q: vec4<f32>, dir: vec3<f32>) -> vec4<f32> {
    let proj = dot(q.xyz, dir) * dir;      // rotation-axis projection
    let twist = vec4<f32>(proj, q.w);
    let len2 = dot(twist, twist);
    if (len2 < 1e-12) {
        // 180-degree swing: no twist component recoverable
        return vec4<f32>(0.0, 0.0, 0.0, 1.0);
    }
    return twist / sqrt(len2);
}

// ---------------------------------------------------------------------------
// vertex: one camera-facing quad per instance (two triangles, 6 verts)
// ---------------------------------------------------------------------------

struct VsIn {
    @builtin(vertex_index) vertex_index: u32,
    @location(3) pos_scale: vec4<f32>,
    @location(4) rotation: vec4<f32>,
    @location(5) base_color: vec4<f32>,
    @location(6) emissive: vec4<f32>,
};

struct VsOut {
    @builtin(position) clip_position: vec4<f32>,
    @location(0) world_position: vec3<f32>,
    @location(1) world_normal: vec3<f32>,
    @location(2) world_tangent: vec4<f32>,
    @location(3) uv: vec2<f32>,
    @location(4) base_color: vec4<f32>,
    @location(5) emissive: vec4<f32>,
};

@vertex
fn vertex(in: VsIn) -> VsOut {
    // quad corners in [-0.5, 0.5], CCW triangles
    var corners = array<vec2<f32>, 6>(
        vec2<f32>(-0.5, -0.5), vec2<f32>(0.5, -0.5), vec2<f32>(0.5, 0.5),
        vec2<f32>(-0.5, -0.5), vec2<f32>(0.5, 0.5), vec2<f32>(-0.5, 0.5),
    );
    let corner = corners[in.vertex_index];
    let center = in.pos_scale.xyz;
    let scale = in.pos_scale.w;

    // camera basis in world space (inverse_view columns)
    let cam_right = view.inverse_view[0].xyz;
    let cam_up = view.inverse_view[1].xyz;
    let cam_fwd = -view.inverse_view[2].xyz;   // looking direction
    let to_camera = normalize(view.world_position - center);

    // keep only the twist of the particle rotation about the view axis
    let twist = twist_about(quat_normalize(in.rotation), to_camera);
    let offset_cam = corner.x * cam_right + corner.y * cam_up;
    let offset = quat_rotate(twist, offset_cam) * scale;

    var out: VsOut;
    out.world_position = center + offset;
    out.clip_position = view.view_proj * vec4<f32>(out.world_position, 1.0);
    out.world_normal = to_camera;
    out.world_tangent = vec4<f32>(quat_rotate(twist, cam_right), 1.0);
    out.uv = corner + vec2<f32>(0.5, 0.5);
    out.base_color = in.base_color;
    out.emissive = in.emissive;
    return out;
}

// ---------------------------------------------------------------------------
// fragment
// ---------------------------------------------------------------------------

#ifdef DEPTH_PREPASS
fn prepass_depth_at(frag_coord: vec4<f32>, sample_index: u32) -> f32 {
    let coords = vec2<i32>(frag_coord.xy);
#ifdef MULTISAMPLED
    return textureLoad(depth_prepass, coords, i32(sample_index));
#else // MULTISAMPLED
    return textureLoad(depth_prepass, coords, 0);
#endif // MULTISAMPLED
}
#endif // DEPTH_PREPASS

// NOTE: the fragment reads the window-space position through the input
// struct's @builtin(position) member (clip_position becomes frag coords in
// the fragment stage). Declaring a SECOND @builtin(position) parameter
// alongside the struct is a duplicate-builtin validation error in
// naga/tint — wgsl_check pins this.

@fragment
fn fragment(in: VsOut) -> @location(0) vec4<f32> {
    var color = in.base_color;
    var emissive = in.emissive;

    if ((system.flags & FLAG_BASE_COLOR_TEXTURE) != 0u) {
        color = color * textureSample(base_tex, base_samp, in.uv);
    }

    // radial edge fade: smooth falloff from (1 - fade_edge)..1 of the UV
    // radius, rounding the quad into a soft disc
    if (system.fade_edge > 0.0) {
        let r = length(in.uv - vec2<f32>(0.5, 0.5)) * 2.0;
        let fade_start = 1.0 - system.fade_edge;
        let t = clamp((r - fade_start) / max(system.fade_edge, 1e-5), 0.0, 1.0);
        color.a = color.a * (1.0 - t * t * (3.0 - 2.0 * t));  // smoothstep
    }

    // scene-depth fade: soften intersections against the depth prepass.
    // Reference semantics (reference particles.wgsl:149-155): compare
    // INVERSE window depths — with reverse-Z, 1/z is proportional to linear
    // view distance — and smoothstep the absolute difference over
    // fade_scene. Larger fade_scene => wider, softer fade band. Without a
    // depth prepass the whole block is compiled out (DEPTH_PREPASS def).
#ifdef DEPTH_PREPASS
    if (system.fade_scene > 0.0) {
        let scene_z = prepass_depth_at(in.clip_position, 0u);
        let diff = abs(1.0 / in.clip_position.z - 1.0 / scene_z);
        color.a = color.a * smoothstep(0.0, system.fade_scene, diff);
    }
#endif // DEPTH_PREPASS

    if (color.a <= 0.0) {
        discard;
    }

    var out_color = color;
    if (system.pbr != 0u) {
        out_color = pbr_shade(in, color, emissive);
    }
    // else: unlit path keeps the base color alone (reference
    // particles.wgsl:162-163); emissive only participates in PBR.
#ifdef FOG
    // fog is a view effect applied after the lighting branch for BOTH
    // paths, matching Bevy's pbr.wgsl fragment ordering
    out_color = apply_fog(out_color, in.world_position);
#endif // FOG
    return out_color;
}

// ---------------------------------------------------------------------------
// PBR path: self-contained Cook-Torrance implementation of the reference's
// material semantics (reference particles.wgsl:180-239 feeds the same inputs
// into Bevy's apply_pbr_lighting): base_color, emissive (alpha ignored,
// reference :198), perceptual_roughness = ORM.g, metallic = ORM.b
// (reference :134-138 — ORM.r/occlusion is NOT consumed), normal mapping
// via the tangent frame. Host engines with a clustered light loop /
// shadows / fog substitute their pipeline at the pbr_shade seam; the body
// below is a correct single-directional-light + ambient GGX evaluation,
// not a lambert stand-in.
// ---------------------------------------------------------------------------

const LIGHT_DIR: vec3<f32> = vec3<f32>(0.4, 0.8, 0.3);    // normalized in code
const LIGHT_COLOR: vec3<f32> = vec3<f32>(1.0, 1.0, 1.0);
const AMBIENT: vec3<f32> = vec3<f32>(0.09, 0.09, 0.1);

fn d_ggx(nh: f32, a: f32) -> f32 {
    let a2 = a * a;
    let d = nh * nh * (a2 - 1.0) + 1.0;
    return a2 / (3.14159265 * d * d);
}

// Smith height-correlated visibility, V = G / (4 NdotL NdotV)
fn v_smith(nl: f32, nv: f32, a: f32) -> f32 {
    let a2 = a * a;
    let gv = nl * sqrt(nv * nv * (1.0 - a2) + a2);
    let gl = nv * sqrt(nl * nl * (1.0 - a2) + a2);
    return 0.5 / max(gv + gl, 1e-5);
}

fn f_schlick(u: f32, f0: vec3<f32>) -> vec3<f32> {
    let f = pow(1.0 - u, 5.0);
    return f0 + (vec3<f32>(1.0, 1.0, 1.0) - f0) * f;
}

fn pbr_shade(in: VsOut, base: vec4<f32>, emissive: vec4<f32>) -> vec4<f32> {
    var n = normalize(in.world_normal);
    if ((system.flags & FLAG_NORMAL_MAP_TEXTURE) != 0u) {
        let t = normalize(in.world_tangent.xyz);
        let b = cross(n, t) * in.world_tangent.w;
        let nm = textureSample(normal_tex, normal_samp, in.uv).rgb * 2.0 - 1.0;
        n = normalize(nm.x * t + nm.y * b + nm.z * n);
    }
    var perceptual_roughness = 1.0;   // reference defaults (:127-128)
    var metallic = 0.0;
    if ((system.flags & FLAG_ORM_TEXTURE) != 0u) {
        let orm = textureSample(orm_tex, orm_samp, in.uv).rgb;
        perceptual_roughness = orm.g;
        metallic = orm.b;
    }
    let a = max(perceptual_roughness * perceptual_roughness, 0.002);
    let v = normalize(view.world_position - in.world_position);
    let l = normalize(LIGHT_DIR);
    let h = normalize(v + l);
    let nl = max(dot(n, l), 0.0);
    let nv = max(dot(n, v), 1e-4);
    let nh = max(dot(n, h), 0.0);
    let lh = max(dot(l, h), 0.0);

    let f0 = mix(vec3<f32>(0.04, 0.04, 0.04), base.rgb, metallic);
    let specular = d_ggx(nh, a) * v_smith(nl, nv, a) * f_schlick(lh, f0);
    let diffuse = base.rgb * (1.0 - metallic) * (1.0 / 3.14159265);
    var direct = (diffuse + specular) * LIGHT_COLOR * nl;
#ifdef SHADOW_MAP
    // shadows attenuate the direct term only; ambient and emissive are
    // unshadowed (matching Bevy's directional-light shadow application)
    direct = direct * shadow_factor(in.world_position);
#endif // SHADOW_MAP
    var indirect = base.rgb * AMBIENT;
#ifdef LIGHTS
    // The light table REPLACES the built-in environment: loop N lights with
    // Bevy's attenuation/cone semantics, ambient from the table. The
    // single-light math above is recomputed per light via pbr_light_contrib.
    direct = vec3<f32>(0.0, 0.0, 0.0);
    let n_lights = min(light_table.counts.x, 16u);
#ifdef SHADOW_MAP
    var shadow_pending = true;  // the map belongs to the FIRST directional row
#endif // SHADOW_MAP
    for (var i = 0u; i < n_lights; i = i + 1u) {
        let lt = light_table.lights[i];
        let kind = lt.color_kind.a;
        var l_dir = -normalize(lt.direction_outer.xyz);
        var radiance = lt.color_kind.rgb;
        if (kind > 0.5) {
            // point / spot: radiance falls off by distance (Bevy
            // getDistanceAttenuation) within position_range.w
            let to_light = lt.position_range.xyz - in.world_position;
            let d2 = dot(to_light, to_light);
            l_dir = to_light / max(sqrt(d2), 1e-5);
            let rng = max(lt.position_range.w, 1e-4);
            radiance = radiance * distance_attenuation(d2, 1.0 / (rng * rng));
            if (kind > 1.5) {
                // spot cone: squared smooth falloff between outer and inner
                let cd = dot(-l_dir, normalize(lt.direction_outer.xyz));
                let cone = clamp(
                    (cd - lt.direction_outer.w)
                        / max(lt.extra.x - lt.direction_outer.w, 1e-4),
                    0.0, 1.0);
                radiance = radiance * cone * cone;
            }
        }
        let hl = normalize(v + l_dir);
        let nl_i = max(dot(n, l_dir), 0.0);
        let nh_i = max(dot(n, hl), 0.0);
        let lh_i = max(dot(l_dir, hl), 0.0);
        let spec_i = d_ggx(nh_i, a) * v_smith(nl_i, nv, a) * f_schlick(lh_i, f0);
        var contrib = (diffuse + spec_i) * radiance * nl_i;
#ifdef SHADOW_ATLAS
        // per-light shadows: any row with atlas tiles assigned
        // (extra.y >= 0) attenuates by its own map. Point rows own SIX
        // consecutive tiles (an unrolled cube map); the face is selected
        // by the dominant axis of fragment - light (render.cube_face is
        // the host oracle — the tie-break order must match it exactly).
        if (lt.extra.y >= 0.0) {
            var s_tile = u32(lt.extra.y);
            if (kind > 0.5 && kind < 1.5) {
                let dvec = in.world_position - lt.position_range.xyz;
                let advec = abs(dvec);
                var face = 0u;
                if (advec.y >= advec.x && advec.y >= advec.z) {
                    face = select(3u, 2u, dvec.y >= 0.0);
                } else if (advec.z >= advec.x) {
                    face = select(5u, 4u, dvec.z >= 0.0);
                } else {
                    face = select(1u, 0u, dvec.x >= 0.0);
                }
                s_tile = s_tile + face;
            }
            contrib = contrib * shadow_atlas_factor(in.world_position, s_tile);
        }
#else // SHADOW_ATLAS
#ifdef SHADOW_MAP
        // the shadow map belongs to the FIRST directional light, wherever
        // it sits in the table (not hard-coded to row 0)
        if (shadow_pending && kind < 0.5) {
            contrib = contrib * shadow_factor(in.world_position);
            shadow_pending = false;
        }
#endif // SHADOW_MAP
#endif // SHADOW_ATLAS
        direct = direct + contrib;
    }
    indirect = base.rgb * light_table.ambient.rgb;
    if (light_table.counts.y != 0u) {
        // environment light: diffuse irradiance + windowed-SH specular
        // with the analytic split-sum BRDF (render.EnvironmentLight's
        // shade_indirect is the byte-level oracle for this block)
        let diffuse_color = base.rgb * (1.0 - metallic);
        let r_env = 2.0 * dot(n, v) * n - v;
        indirect = indirect + diffuse_color * env_irradiance(n)
            + env_specular(r_env, perceptual_roughness) * env_brdf_approx(f0, perceptual_roughness, nv);
    }
#endif // LIGHTS
    return vec4<f32>(direct + indirect + emissive.rgb, base.a);
}
