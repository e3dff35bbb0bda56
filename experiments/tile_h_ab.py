"""tile_h A/B at the headline shape: fused_tile_h=8 (default) vs 4.

Halving the tile height halves the pixel rows each (slot, tile) pair
sweeps in phase V (the 8-row static unroll becomes 4), but doubles the
tile count: grid overhead x2, and every triangle spanning a tile seam is
binned twice.  Which way the trade goes at the headline population is an
empirical question — this measures steady-state frame time and the
per-stage split for both, and checks the two frames are bitwise equal
(the tile decomposition must be invisible in the output).

Run on TPU:  python experiments/tile_h_ab.py   (tile_h=4 shapes compile
fresh — budget >=25 min on a cold cache)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")

import numpy as np

from ash_renderer_tpu.benchmarks import config4_million_tri
from ash_renderer_tpu.renderer import Renderer


def force(x):
    return np.asarray(x.ravel()[:4])


def measure(r, cam, nf=30):
    t0 = time.perf_counter()
    rgba8, aux = r.render_frame(cam)
    force(rgba8)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(nf):
        rgba8, aux = r.render_frame(cam)
    force(rgba8)
    dt = (time.perf_counter() - t0) / nf
    return first, dt, np.asarray(rgba8)


def main():
    scene, settings, cams = config4_million_tri(subdiv=8)
    cam = cams[0]
    frames = {}
    for th in (8, 4):
        st = dataclasses.replace(settings, fused_tile_h=th)
        r = Renderer(scene, st)
        t0 = time.perf_counter()
        wu = r.warmup()
        print(f"tile_h={th}: warmup {time.perf_counter()-t0:.1f}s",
              flush=True)
        first, dt, frame = measure(r, cam)
        frames[th] = frame
        print(
            f"tile_h={th}: first {first:.2f}s, steady "
            f"{dt*1000:.2f} ms/frame = {1/dt:.2f} FPS", flush=True
        )
        del r
    same = np.array_equal(frames[8], frames[4])
    print(f"frames bitwise equal across tile_h: {same}", flush=True)
    if not same:
        bad = int((frames[8] != frames[4]).any(axis=-1).sum())
        print(f"  differing pixels: {bad}", flush=True)


if __name__ == "__main__":
    main()
