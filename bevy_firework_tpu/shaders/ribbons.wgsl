// Ribbon trail shader — consumer of the trail-segment contract
// (docs/RENDER_CONTRACT.md §3b; an extension BEYOND the reference, which
// has no trails — /root/reference/README.md:21-50).
//
// Instance layout (64 bytes, locations 3-6):
//   loc3 = vec4(p0.xyz, w0)   newer end + world-space half-width there
//   loc4 = vec4(p1.xyz, w1)   older end + half-width
//   loc5 = color at p0 (rgba, linear; alpha pre-tapered by the engine)
//   loc6 = color at p1
//
// One quad (6 vertices) per segment: each corner picks an end t in {0, 1}
// and a side in {-1, +1}; the world position is the lerped centerline point
// offset sideways along normalize(cross(view_dir, segment_dir)) by the
// lerped half-width — a cylindrical billboard about the segment axis, the
// ribbon analog of the particle quad's spherical billboard. Degenerate
// cases (segment parallel to the view ray, zero-length segment) fall back
// to the camera-right direction so the quad never collapses to NaN.
//
// Fragment: colors lerp along the ribbon; alpha fades across the width with
// the same smoothstep ramp as the particle edge fade, driven by the OWNING
// TYPE's fade_edge (one uniform serves both pipelines).

struct ViewLike {
    view_proj: mat4x4<f32>,
    inverse_view: mat4x4<f32>,
    world_position: vec3<f32>,
};

struct SystemUniform {
    alpha_mode: u32,
    pbr: u32,
    fade_edge: f32,
    fade_scene: f32,
    flags: u32,
    _pad: vec3<f32>,
};

@group(0) @binding(0) var<uniform> view: ViewLike;
@group(2) @binding(0) var<uniform> system: SystemUniform;

struct VsIn {
    @builtin(vertex_index) vertex_index: u32,
    @location(3) p0_w0: vec4<f32>,
    @location(4) p1_w1: vec4<f32>,
    @location(5) color0: vec4<f32>,
    @location(6) color1: vec4<f32>,
};

struct VsOut {
    @builtin(position) clip_position: vec4<f32>,
    @location(0) color: vec4<f32>,
    @location(1) across: f32,  // -1 .. +1 across the ribbon width
};

@vertex
fn vertex(in: VsIn) -> VsOut {
    // 6 corners: (t, side) = (0,-1) (1,-1) (1,+1) / (0,-1) (1,+1) (0,+1)
    var ts = array<vec2<f32>, 6>(
        vec2<f32>(0.0, -1.0), vec2<f32>(1.0, -1.0), vec2<f32>(1.0, 1.0),
        vec2<f32>(0.0, -1.0), vec2<f32>(1.0, 1.0), vec2<f32>(0.0, 1.0),
    );
    let c = ts[in.vertex_index % 6u];
    let t = c.x;
    let side = c.y;

    let p0 = in.p0_w0.xyz;
    let p1 = in.p1_w1.xyz;
    let center = mix(p0, p1, t);
    let half_w = mix(in.p0_w0.w, in.p1_w1.w, t);

    let seg = p1 - p0;
    let view_dir = center - view.world_position;
    var offset = cross(view_dir, seg);
    let off_len = length(offset);
    if (off_len < 1e-6) {
        // segment parallel to the view ray (or zero-length): use camera
        // right (inverse_view column 0) so the quad stays visible
        offset = view.inverse_view[0].xyz;
    } else {
        offset = offset / off_len;
    }

    var out: VsOut;
    out.clip_position = view.view_proj * vec4<f32>(center + offset * half_w * side, 1.0);
    out.color = mix(in.color0, in.color1, t);
    out.across = side;
    return out;
}

@fragment
fn fragment(in: VsOut) -> @location(0) vec4<f32> {
    var alpha = in.color.a;
    // cross-width soft edge: same ramp family as the particle edge fade
    // (alpha *= smoothstep(0, fade_edge, 1 - |across|)); fade_edge 0 keeps
    // hard ribbon edges
    if (system.fade_edge > 0.0) {
        alpha = alpha * smoothstep(0.0, system.fade_edge, 1.0 - abs(in.across));
    }
    if (alpha <= 0.0) {
        discard;
    }
    return vec4<f32>(in.color.rgb, alpha);
}
