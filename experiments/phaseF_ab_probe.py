"""A/B: phase F (in-kernel surface shading) vs the legacy XLA shade path,
same process, same scenes.  The XLA leg is forced by padding the material
table past the M<=16 select-tree limit (shade_mode_for -> None); the padded
rows are never referenced, so frames must stay bit-identical — asserted.

Motivation: the round-4 sweep measured config1_textured_obj at 59.6 FPS vs
94.1 in round 3 (phase F landed in between), while config3 (no atlas) went
106.8 -> 122.2.  Hypothesis: the in-kernel tap-addressing/material half is
a net LOSS on small textured frames (kernel work scales with tiles, the XLA
elementwise it replaces was cheap at 800x600), and possibly on the headline
too (whose +1.9 FPS could be entirely the round-4 sort/gather wins).
"""
import hashlib
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def force(x):
    return np.asarray(x.ravel()[:4])


def run(name, builder, frames):
    from ash_renderer_tpu import Material
    from ash_renderer_tpu.renderer import Renderer

    out = {}
    for leg in ("phaseF", "xla"):
        scene, settings, cams = builder()
        if leg == "xla":
            scene.materials = list(scene.materials) + [Material()] * (
                17 - len(scene.materials)
            )
        r = Renderer(scene, settings)
        if r.settings.pipeline == "fused":
            r.warmup()
        rgba8, _ = r.render_frame(cams[0])
        sha = hashlib.sha256(np.asarray(rgba8).tobytes()).hexdigest()
        t0 = time.time()
        for i in range(frames):
            rgba8, _ = r.render_frame(cams[i % len(cams)])
        force(rgba8)
        dt = (time.time() - t0) / frames
        out[leg] = (dt, sha)
        print(
            f"{name:24s} {leg:6s} {dt * 1e3:7.2f} ms/frame "
            f"({1 / dt:6.2f} FPS) sha {sha[:12]}",
            flush=True,
        )
        del r
    assert out["phaseF"][1] == out["xla"][1], f"{name}: legs differ!"
    return out


def main():
    from ash_renderer_tpu.benchmarks import ALL_CONFIGS

    for name, frames in (
        ("config1_textured_obj", 100),
        ("config5_flythrough", 50),
        ("config4_million_tri", 30),
    ):
        run(name, ALL_CONFIGS[name], frames)


if __name__ == "__main__":
    main()
