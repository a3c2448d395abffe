"""Checkpoint / resume.

The reference has no runtime checkpointing (SURVEY.md §5): only its *config*
layer is serializable (serde on every settings type), while live
`ParticleData` is not. On TPU the live pool is a pytree of arrays, so full
state snapshots are nearly free: settings (JSON, the serde analog) + pool
arrays (npz) round-trip a whole scene bit-exactly, including PRNG state —
resuming continues the exact trajectory stream.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import zipfile
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .pool import PoolState
from .settings import spawner_from_dict, spawner_to_dict
from .trails import TrailSettings, TrailState


def _reconstruct_ring_cursor(arrays: Dict[str, np.ndarray]) -> int:
    """Exact ring-cursor recovery for legacy checkpoints that predate the
    field. Ring pools (constant lifetime) die FIFO, so live lanes form a
    contiguous ring window and claims advance in ring order: the cursor sits
    one past the YOUNGEST live lane at the end of its same-age cohort. A
    wrong cursor would claim into the live window for up to one lifetime
    (claims are dead-masked, so overflow drops, never tramples) — this
    reconstruction removes that silent under-emission entirely."""
    alive = np.asarray(arrays["alive"]).astype(bool)
    if not alive.any():
        return 0
    age = np.asarray(arrays["age"])
    n = alive.shape[0]
    min_age = age[alive].min()
    youngest = alive & (age == min_age)
    idx = np.nonzero(youngest)[0]
    nxt = (idx + 1) % n
    boundary = idx[~youngest[nxt]]
    # boundary empty => the whole ring is one same-age cohort; any consistent
    # position works, use the last youngest index
    end = int(boundary[0]) if len(boundary) else int(idx[-1])
    return (end + 1) % n


def pool_to_arrays(state: PoolState) -> Dict[str, np.ndarray]:
    return {f.name: np.asarray(getattr(state, f.name)) for f in dataclasses.fields(PoolState)}


def pool_from_arrays(arrays: Dict[str, np.ndarray]) -> PoolState:
    kw = {}
    for f in dataclasses.fields(PoolState):
        if f.name not in arrays:
            # forward-compat: fields added after a checkpoint was written
            # default to their init value (currently only ring_cursor)
            if f.name == "ring_cursor":
                kw[f.name] = jnp.asarray(_reconstruct_ring_cursor(arrays), jnp.int32)
                continue
            raise KeyError(f"checkpoint missing pool field {f.name!r}")
        kw[f.name] = jnp.asarray(arrays[f.name])
    # dead lanes must read dead under the derived-alive convention too
    # (alive == age < lifetime); legacy checkpoints stored age 0 there
    kw["age"] = jnp.where(kw["alive"], kw["age"], jnp.maximum(kw["age"], kw["lifetime"]))
    return PoolState(**kw)


def save_pool(path: str, state: PoolState):
    np.savez_compressed(path, **pool_to_arrays(state))


def load_pool(path: str) -> PoolState:
    with np.load(path) as z:
        return pool_from_arrays({k: z[k] for k in z.files})


def save_scene(path: str, scene) -> None:
    """Snapshot a whole Scene: per-spawner settings (JSON) + pool arrays +
    host-side runtime state (transforms, modifiers, time). One .zip file."""
    from .scene import Scene  # noqa: F401 (type only)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        meta = {
            "time": scene.time,
            "next_id": scene._next_id,
            "seed": scene._seed,
            "spawners": {},
            # scene force fields (beyond the reference): slots + live handles
            "force_fields": {
                "slots": [dataclasses.asdict(s) for s in scene._field_slots],
                "ids": {str(k): v for k, v in scene._field_ids.items()},
                "next_id": scene._next_field_id,
            },
            # collider scene: slots (incl. disabled, preserving the static
            # layout) + live handles, so set/remove_collider edits and ids
            # survive the trip
            "colliders": {
                "slots": [dataclasses.asdict(s) for s in scene._collider_slots],
                "ids": {str(k): v for k, v in scene._collider_ids.items()},
                "next_id": scene._next_collider_id,
            },
        }
        for sid, slot in scene._spawners.items():
            meta["spawners"][str(sid)] = {
                "settings": spawner_to_dict(slot.spawner),
                "capacity": slot.capacity,
                "transform": {"translation": list(slot.transform.translation), "rotation": list(slot.transform.rotation)},
                "global_transform": {"translation": list(slot.global_transform.translation), "rotation": list(slot.global_transform.rotation)},
                "parent_velocity": list(slot.parent_velocity),
                "modifier": {"scale": slot.modifier.scale, "speed": slot.modifier.speed},
                "finished_fired": slot.finished_fired,
                "seed": slot.seed,
                "nested_buffer": slot.compiled.static.nested_m,
                "render_layers": slot.layers,
            }
            if slot.trail_settings is not None:
                meta["spawners"][str(sid)]["trail"] = dataclasses.asdict(slot.trail_settings)
                tbuf = io.BytesIO()
                np.savez_compressed(tbuf, **{
                    f.name: np.asarray(getattr(slot.trail_state, f.name))
                    for f in dataclasses.fields(type(slot.trail_state))
                })
                zf.writestr(f"trail_{sid}.npz", tbuf.getvalue())
            buf = io.BytesIO()
            np.savez_compressed(buf, **pool_to_arrays(slot.state))
            zf.writestr(f"pool_{sid}.npz", buf.getvalue())
        zf.writestr("scene.json", json.dumps(meta))


def load_scene(path: str, colliders=None):
    """Restore a Scene checkpoint. Event handlers/observers are not
    serializable (same restriction as the reference's #[reflect(ignore)]
    handlers) — re-register them after loading.

    colliders: explicit override of the restored collider scene; leave None
    to restore the checkpoint's own colliders (incl. dynamic-edit state and
    live handles; legacy checkpoints without collider state restore none)."""
    from .scene import Scene, Transform
    from .settings import EffectModifier

    scene = Scene(colliders=colliders)
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("scene.json"))
        cm = meta.get("colliders")
        if colliders is None and cm:
            from .scene import _ColliderSlot

            scene._collider_slots = [
                _ColliderSlot(
                    kind=s["kind"], identity_rot=s["identity_rot"],
                    position=tuple(s["position"]), rotation=tuple(s["rotation"]),
                    params=tuple(s["params"]), layers=s["layers"], active=s["active"],
                )
                for s in cm["slots"]
            ]
            scene._collider_ids = {int(k): v for k, v in cm["ids"].items()}
            scene._next_collider_id = cm["next_id"]
            scene._collider_table = None
        scene.time = meta["time"]
        scene._seed = meta["seed"]
        for sid_s, m in meta["spawners"].items():
            sid = int(sid_s)
            spawner = spawner_from_dict(m["settings"])
            # ids may be non-contiguous after removals; host code holds
            # them, so restore each exactly via the explicit-id path
            scene.add_spawner(
                spawner,
                capacity=m["capacity"],
                transform=Transform(tuple(m["transform"]["translation"]), tuple(m["transform"]["rotation"])),
                global_transform=Transform(tuple(m["global_transform"]["translation"]), tuple(m["global_transform"]["rotation"])),
                modifier=EffectModifier(**m["modifier"]),
                sid=sid,
                # legacy checkpoints predate the knob: default matches theirs
                nested_buffer=m.get("nested_buffer", 4096),
                trail=TrailSettings(**m["trail"]) if "trail" in m else None,
                layers=m.get("render_layers", 1),
            )
            slot = scene._spawners[sid]
            slot.parent_velocity = tuple(m["parent_velocity"])
            slot.finished_fired = m["finished_fired"]
            slot.seed = m["seed"]
            with zf.open(f"pool_{sid}.npz") as fh:
                with np.load(io.BytesIO(fh.read())) as z:
                    slot.state = pool_from_arrays({k: z[k] for k in z.files})
            if "trail" in m:
                with zf.open(f"trail_{sid}.npz") as fh:
                    with np.load(io.BytesIO(fh.read())) as z:
                        slot.trail_state = TrailState(
                            **{k: jnp.asarray(z[k]) for k in z.files}
                        )
        scene._next_id = meta["next_id"]
        ffm = meta.get("force_fields")  # absent in pre-field checkpoints
        if ffm:
            from .scene import _FieldSlot

            scene._field_slots = [
                _FieldSlot(
                    kind=s["kind"], position=tuple(s["position"]), axis=tuple(s["axis"]),
                    strength=s["strength"], radius=s["radius"],
                    # pre-turbulence checkpoints lack these two
                    frequency=s.get("frequency", 1.0), phase=s.get("phase", 0.0),
                    active=s["active"],
                )
                for s in ffm["slots"]
            ]
            scene._field_ids = {int(k): v for k, v in ffm["ids"].items()}
            scene._next_field_id = ffm["next_id"]
            scene._field_table = None
    return scene
