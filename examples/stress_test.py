"""Stress test (reference: `examples/stress_test.rs`): rate 160,000/s,
lifetime 1 s => ~160 k live steady state. Prints the live-count overlay and a
particles-stepped/sec summary."""

from _common import parse_args, run

args = parse_args(__doc__, frames=300)

from bevy_firework_tpu import Scene
from bevy_firework_tpu.models import effects

spawner, tf = effects.stress_test()
scene = Scene()
scene.add_spawner(spawner, capacity=1 << 18, transform=tf)

stepped = [0]


def count(f):
    stepped[0] += scene.alive_count()


wall = run(scene, args, on_frame=None)
alive = scene.alive_count()
print(f"steady-state live: {alive}")
print(f"avg wall per frame: {wall / args.frames * 1e3:.3f} ms")
print(f"~particle-steps/sec: {alive * args.frames / wall:,.0f}")
