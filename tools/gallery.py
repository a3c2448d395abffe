"""Regenerate the README gallery (docs/gallery/*.png) with the software
viewer — the reproducible version of the ad-hoc renders from earlier rounds.

Each job is (build_scene, warmup_frames, camera, viewer kwargs). Scenes that
sit on a floor get the analytic ground plane (`ground_y`), which doubles as
the depth-prepass consumer for the reference's `fade_scene` semantics
(particles.wgsl:149-155); airborne scenes (snow falls past y=0 from a raised
emitter) render without one so the depth test doesn't cull the effect.

Usage: python tools/gallery.py [name ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")  # software renders; no TPU needed

from bevy_firework_tpu import Scene, Transform  # noqa: E402
from bevy_firework_tpu.models import effects, library  # noqa: E402
from bevy_firework_tpu.viewer import Camera, render_frame, write_png  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "gallery")


def _sparks():
    spawner, tf = effects.sparks()
    s = Scene()
    s.add_spawner(spawner, capacity=2048, transform=tf)
    return s


def _collision():
    spawner, tf, cols = effects.collision()
    s = Scene(colliders=cols)
    s.add_spawner(spawner, capacity=2048, transform=tf)
    return s


def _explosion():
    s = Scene()
    s.add_spawner(library.explosion(count=600), capacity=1024,
                  transform=Transform(translation=(0.0, 2.0, 0.0)))
    return s


def _snow():
    s = Scene()
    # raised emitter: flakes fall through the frame for the whole warmup
    s.add_spawner(library.snow(), capacity=8192,
                  transform=Transform(translation=(0.0, 6.0, 0.0)))
    return s


def _comets():
    from bevy_firework_tpu import TrailSettings

    s = Scene()
    s.add_spawner(library.comets(), capacity=256,
                  transform=Transform(translation=(0.0, 0.5, 0.0)),
                  trail=TrailSettings(length=16, width=0.8))
    return s


def _tornado():
    from bevy_firework_tpu import ForceField

    s = Scene(force_fields=[
        ForceField.vortex((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), strength=12.0, radius=6.0),
        ForceField.axial((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), strength=25.0, radius=7.0),
        ForceField.turbulence((0.0, 2.0, 0.0), strength=1.8, radius=8.0, frequency=2.2),
    ])
    s.add_spawner(library.dust(updraft=2.5, drag=2.0, emit_radius=1.2), capacity=8192)
    return s


def _render_fireworks():
    """The fireworks burst is periodic (~3 rockets/s, each exploding at its
    apex): step until a burst is young and dense (>140 live sparkles), then
    frame the camera on the particles' median position."""
    import numpy as np

    from bevy_firework_tpu import TrailSettings

    spawner, tf = effects.fireworks()
    s = Scene()
    # trails give the rockets launch streaks and the sparkles comet tails
    s.add_spawner(spawner, capacity=8192, transform=tf, nested_buffer=8192,
                  trail=TrailSettings(length=8, width=0.35))
    sid = s.spawner_ids()[0]
    for f in range(400):
        s.step(1.0 / 60.0)
        st = s._spawners[sid].state
        sparkles = int((np.asarray(st.ptype) == 1)[np.asarray(st.alive)].sum())
        if f > 60 and sparkles > 140:
            break
    items = s.render_items()
    inst = np.concatenate([np.asarray(it.instances).reshape(-1, 16) for it in items])
    cx, cy = float(np.median(inst[:, 0])), float(np.median(inst[:, 1]))
    img = render_frame(items, Camera((cx, cy + 0.4, 6), (cx, cy, 0)), exposure=2.0,
                       trail_items=s.trail_items())
    return img, s


JOBS = {
    "sparks": (_sparks, 90, Camera((0, 2.5, 7), (0, 1.5, 0)), dict(ground_y=0.0, exposure=1.5)),
    "collision": (_collision, 150, Camera((0, 3, 9), (0, 1, 0)), dict(ground_y=0.0)),
    "explosion": (_explosion, 20, Camera((0, 2.5, 8), (0, 2, 0)), dict(exposure=1.5)),
    "snow": (_snow, 240, Camera((0, 3.5, 11), (0, 3, 0)), dict()),
    "comets": (_comets, 140, Camera((0, 3.2, 10), (0, 2.6, 0)), dict(exposure=1.6)),
    "tornado": (_tornado, 300, Camera((0, 4.5, 12), (0, 2.5, 0)), dict(exposure=1.8)),
    "fireworks": None,  # special-cased: burst-seeking warmup
}


def main(names):
    os.makedirs(OUT, exist_ok=True)
    for name in names or JOBS:
        if name == "fireworks":
            img, scene = _render_fireworks()
        else:
            build, frames, cam, kw = JOBS[name]
            scene = build()
            for _ in range(frames):
                scene.step(1.0 / 60.0)
            img = render_frame(scene.render_items(), cam,
                               trail_items=scene.trail_items(), **kw)
        path = os.path.join(OUT, f"{name}.png")
        write_png(path, img)
        print(f"{name} -> {path}  {scene.alive_count()} live")


if __name__ == "__main__":
    main(sys.argv[1:])
