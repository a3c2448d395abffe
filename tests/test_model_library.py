"""Smoke tests for the generic effect-model library: every constructor
compiles, runs, and produces sensible live counts."""

import numpy as np
import pytest

from bevy_firework_tpu import Collider, Scene
from bevy_firework_tpu.models import library


@pytest.mark.parametrize(
    "name,kw,frames,expect_min",
    [
        ("fountain", {}, 90, 300),
        ("snow", {}, 120, 300),
        ("explosion", {}, 2, 250),
        ("magic_trail", {}, 60, 80),
        ("smoke_plume", {}, 120, 80),
    ],
)
def test_library_effect_runs(name, kw, frames, expect_min):
    spawner = getattr(library, name)(**kw)
    scene = Scene()
    scene.add_spawner(spawner, capacity=4096)
    for _ in range(frames):
        scene.step(1 / 60)
    assert scene.alive_count() >= expect_min
    assert len(scene.render_items()) >= 1


def test_rain_destroyed_on_ground():
    scene = Scene(colliders=[Collider.halfspace(position=(0, 0, 0))])
    sid = scene.add_spawner(library.rain(rate=500.0), capacity=4096,
                            transform=__import__("bevy_firework_tpu").Transform(translation=(0, 5, 0)))
    for _ in range(180):
        scene.step(1 / 60)
    st = scene._spawners[sid].state
    alive = np.asarray(st.alive)
    ys = np.asarray(st.py)[alive]
    # drops die at the ground: none significantly below it, steady population
    assert ys.min() > -0.5
    assert 100 < alive.sum() < 2000  # lifetime-bound would be ~1500; ground kills sooner
