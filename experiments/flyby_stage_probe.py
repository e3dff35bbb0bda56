"""Stage-split timing for a clip-active / zoomed headline frame.

bench.py r3 measured 45.5 ms static vs 87.7 ms during the fly-by; this
isolates where the extra ~40 ms goes: clip tail, sort, or the raster
kernel's global wide run (triangles spanning >2 tiles are streamed by
EVERY tile).  Prints per-stage ms and key-population stats (wide count)
for the static camera vs the closest-approach fly-by camera.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from ash_renderer_tpu import Camera
from ash_renderer_tpu.benchmarks import config4_million_tri
from ash_renderer_tpu.renderer import Renderer
from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
from ash_renderer_tpu.ops import setup_kernel, fused_kernel, binsort
from ash_renderer_tpu import pipeline as plmod
from ash_renderer_tpu.ops.geometry import MAX_CLIP_TRIS


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:2])


def stage_times(r, cam, label, reps=5):
    st = r.settings
    statics = r.statics
    cfg = r.cfg
    b = r._buffers
    model_mats = r.scene.model_matrices()
    view = cam.view_matrix()
    proj = cam.projection_matrix(st.render_width / st.render_height)
    mvp = compose_mvp(model_mats, view, proj)
    mm = jnp.asarray(model_mats)
    mv = jnp.asarray(mvp)
    cpos = jnp.asarray(cam.position.astype(np.float32))

    def run_stages():
        out = {}
        t0 = time.perf_counter()
        tblT = plmod._fstage_transform(
            b["positions"], b["vert_obj"], b["normals"], b["colors"],
            b["uvs"], mm, mv,
        )
        force(tblT)
        out["transform"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        comb, keys_main, flags, extx, exty = setup_kernel.triangle_setup(
            tblT, b["ltT"], b["matT"], cfg, interpret=False,
            tail_rows=st.clip_budget * MAX_CLIP_TRIS,
        )
        force(keys_main)
        out["setup_kernel"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        comb, keys_tail, gstats = plmod._fstage_tail(
            statics, tblT, b["tri_v"], b["tri_mat"], flags, comb
        )
        force(keys_tail)
        out["clip_tail"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rmeta, tbl_sorted, tbl_ext, sstats = plmod._fstage_sort(statics, comb, keys_main, keys_tail)
        force(rmeta)
        out["sort"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        vis_d, vis_t, planes = fused_kernel.rasterize_distribute(
            rmeta, tbl_sorted, tbl_ext, cfg, interpret=False
        )
        force(vis_t)
        out["raster_kernel"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rgba8 = plmod._fstage_shade(
            statics, planes, cpos, r.materials, r.atlas, r.light
        )
        force(rgba8)
        out["shade"] = time.perf_counter() - t0
        return out, keys_main, keys_tail, gstats

    # warm
    out, keys_main, keys_tail, gstats = run_stages()
    accum = {k: 0.0 for k in out}
    for _ in range(reps):
        out, keys_main, keys_tail, gstats = run_stages()
        for k, v in out.items():
            accum[k] += v
    n_tiles = cfg.n_tiles
    km = np.asarray(keys_main)
    kt = np.asarray(keys_tail)
    wide = int((km == n_tiles * 4).sum() + (kt == n_tiles * 4).sum())
    live = int((km < n_tiles * 4).sum() + (kt < n_tiles * 4).sum())
    print(f"--- {label} ---", flush=True)
    for k, v in accum.items():
        print(f"  {k:14s} {v/reps*1000:7.2f} ms", flush=True)
    print(f"  total          {sum(accum.values())/reps*1000:7.2f} ms")
    print(
        f"  keys: tiled={live} wide={wide} "
        f"n_clipped={int(np.asarray(gstats['n_clipped']))}",
        flush=True,
    )


def main():
    scene, settings, cams = config4_million_tri(subdiv=8)
    r = Renderer(scene, settings)
    static_cam = cams[0]
    # closest approach of bench.flyby_path: x=1.02, z ~= 2 (sphere center
    # [0,0,2], r=1) looking +Z — tangential view, near-plane clips
    graze = Camera(position=np.array([1.02, 0.0, 1.9], np.float32))
    half = Camera(position=np.array([1.02, 0.0, 0.5], np.float32))

    r.render_frame(static_cam)  # compile everything once
    stage_times(r, static_cam, "static headline")
    stage_times(r, half, "approach (sphere ahead, larger tris)")
    stage_times(r, graze, "graze (clips + max zoom)")


if __name__ == "__main__":
    main()
