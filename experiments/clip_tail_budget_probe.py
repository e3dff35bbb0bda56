"""Is the live clip tail budget-proportional?  config4_terrain keeps the
Sutherland-Hodgman tail live EVERY frame (trace_frame round 4: cond.35 =
12.0 ms/frame, the single largest device op on terrain, vs the sphere whose
static frames skip it), so if the tail's cost scales with clip_budget a
tiered budget gate (n_clip <= budget/4 -> quarter path, zero-padded to the
static tail shape) is worth ~9 ms on terrain.

Renders terrain at clip_budget 4096 (default) and 1024 in one process and
sha-compares the frames: as long as n_clipped <= 1024 the budgeted
compaction selects the identical triangle set, so any byte diff means the
probe itself is invalid (overflow).  Prints n_clipped, ms/frame per leg.
"""
import hashlib
import os
import sys
import time
import dataclasses

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def force(x):
    return np.asarray(x.ravel()[:4])


def main():
    from ash_renderer_tpu.benchmarks import ALL_CONFIGS
    from ash_renderer_tpu.renderer import Renderer

    frames = 30
    for budget in (4096, 1024, 512):
        scene, settings, cams = ALL_CONFIGS["config4_terrain"]()
        settings = dataclasses.replace(settings, clip_budget=budget)
        r = Renderer(scene, settings)
        r.warmup()
        rgba8, aux = r.render_frame(cams[0])
        nclip = int(np.asarray(aux["n_clipped"]))
        sha = hashlib.sha256(np.asarray(rgba8).tobytes()).hexdigest()
        t0 = time.time()
        for _ in range(frames):
            rgba8, _ = r.render_frame(cams[0])
        force(rgba8)
        dt = (time.time() - t0) / frames
        print(
            f"budget {budget:5d}: {dt * 1e3:7.2f} ms/frame "
            f"({1 / dt:6.2f} FPS)  n_clipped={nclip}  sha {sha[:12]}",
            flush=True,
        )
        del r


if __name__ == "__main__":
    main()
