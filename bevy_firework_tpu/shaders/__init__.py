"""Shipped render-contract shaders + a static WGSL checker.

`particles.wgsl` is the render-contract consumer (docs/RENDER_CONTRACT.md);
`wgsl_check.check_wgsl` gives CI a compiler-free regression gate for it.
"""

import os

SHADER_DIR = os.path.dirname(__file__)


def particles_wgsl_source() -> str:
    with open(os.path.join(SHADER_DIR, "particles.wgsl")) as f:
        return f.read()
