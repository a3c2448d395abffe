"""bevy_firework_tpu — a TPU-native particle simulation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`bevy_firework` (CPU-simulated, batch-rendered particles for Bevy; reference
at /root/reference, analyzed in SURVEY.md).  Spawners become fixed-capacity
SoA pools in HBM; the per-frame step (emission, integration, collision,
curves, cull, instance packing) runs as fused TPU programs; scaling is
sharding the pool/emitter axes over a `jax.sharding.Mesh`.
"""

from .cadence import compute_emission_count, np_compute_emission_count
from .checkpoint import load_pool, load_scene, save_pool, save_scene
from .colliders import Collider, ColliderTable, compile_colliders, hull_decomposition
from .force_fields import FieldTable, ForceField, compile_force_fields
from .compiled import CompiledSpawner, compile_spawner
from .curve import FireworkCurve, FireworkGradient, gradient_constant, gradient_even_samples, gradient_uneven_samples
from .emission_shape import EmissionShape
from .fleet import Fleet
from .pool import FrameInput, PoolState, init_pool, init_pool_for, make_frame_input
from .rand import RandF32, RandVec3
from .render import (
    EnvironmentLight,
    FireworkUniform,
    FogSettings,
    Light,
    LightTable,
    RenderItem,
    ShadowAtlas,
    aabb_intersects_frustum,
    frustum_planes,
    instances_to_bytes,
    light_view_proj,
    make_shadow_atlas,
    make_uniform,
    pack_instances,
    pack_instances_dense,
    planes_to_rows,
    sort_instances_back_to_front,
)
from .scene import DestroyedParticle, Scene, Transform, estimate_capacity
from .trails import (
    TrailItem,
    TrailSettings,
    TrailState,
    init_trail_state,
    pack_trail_segments,
    update_trails,
)
from .settings import (
    BlendMode,
    EffectModifier,
    EmissionMode,
    EmissionPacing,
    EmissionSettings,
    ParticleCollisionSettings,
    ParticleEventHandlers,
    ParticleSettings,
    ParticleSpawner,
    SpawnTransformMode,
    spawner_from_dict,
    spawner_from_json,
    spawner_to_dict,
    spawner_to_json,
)
from .physics_sync import RigidBodyState, linear_velocity_at_point, propagate_modifiers, sync_parent_velocity
from .render_pipeline import AsyncRenderReader
from .shaders.specialize import DummyTextures, PipelineCache, PipelineKey, key_for
from .step import StepOutputs, multi_step, step, step_jit

__version__ = "0.1.0"

__all__ = [
    "AsyncRenderReader",
    "BlendMode",
    "Collider",
    "ColliderTable",
    "hull_decomposition",
    "CompiledSpawner",
    "DestroyedParticle",
    "DummyTextures",
    "EffectModifier",
    "EmissionMode",
    "EmissionPacing",
    "EmissionSettings",
    "EmissionShape",
    "FireworkCurve",
    "FireworkGradient",
    "Fleet",
    "FieldTable",
    "FireworkUniform",
    "FogSettings",
    "EnvironmentLight",
    "Light",
    "LightTable",
    "ShadowAtlas",
    "make_shadow_atlas",
    "light_view_proj",
    "ForceField",
    "FrameInput",
    "ParticleCollisionSettings",
    "ParticleEventHandlers",
    "ParticleSettings",
    "ParticleSpawner",
    "PipelineCache",
    "PipelineKey",
    "PoolState",
    "RandF32",
    "RandVec3",
    "RenderItem",
    "RigidBodyState",
    "Scene",
    "SpawnTransformMode",
    "StepOutputs",
    "TrailItem",
    "TrailSettings",
    "TrailState",
    "Transform",
    "aabb_intersects_frustum",
    "compile_colliders",
    "compile_force_fields",
    "compile_spawner",
    "compute_emission_count",
    "estimate_capacity",
    "frustum_planes",
    "gradient_constant",
    "gradient_even_samples",
    "gradient_uneven_samples",
    "init_pool",
    "init_pool_for",
    "init_trail_state",
    "instances_to_bytes",
    "key_for",
    "linear_velocity_at_point",
    "load_pool",
    "load_scene",
    "make_frame_input",
    "make_uniform",
    "multi_step",
    "np_compute_emission_count",
    "pack_instances",
    "pack_instances_dense",
    "pack_trail_segments",
    "planes_to_rows",
    "propagate_modifiers",
    "save_pool",
    "save_scene",
    "sort_instances_back_to_front",
    "spawner_from_dict",
    "spawner_from_json",
    "spawner_to_dict",
    "spawner_to_json",
    "step",
    "step_jit",
    "sync_parent_velocity",
    "update_trails",
]
