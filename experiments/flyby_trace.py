"""Per-frame trace of bench.py's exact moving-camera fly-by (24 frames).

BENCH_r03 measured 163.7 ms/frame average over this path vs 43.4 static —
this probe attributes the cliff: per-frame forced wall time plus the wide-run
population counters the bench never logged (wide rows, pair demand vs the
wide_rows/wide_pairs budgets, clip count).  Worst frames then get a full
stage split.

Run on TPU:  python experiments/flyby_trace.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from ash_renderer_tpu.benchmarks import config4_million_tri
from ash_renderer_tpu.renderer import Renderer
from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
from ash_renderer_tpu.ops import setup_kernel, fused_kernel
from ash_renderer_tpu import pipeline as plmod
from ash_renderer_tpu.ops.geometry import MAX_CLIP_TRIS

I32 = np.int32


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:2])


def make_wide_stats(cfg):
    """jit: (comb, keys) -> wide-run population counters (scalars)."""
    n_tiles = cfg.n_tiles
    ss = cfg.subpixel_scale
    half = ss // 2
    off = I32(-cfg.min_coord)
    wide_key = I32(n_tiles * 4)

    @jax.jit
    def stats(comb, keys):
        wide = keys == wide_key
        # recompute pixel AABB tile spans for every row (same arithmetic as
        # binsort.expand_wide_pairs), count pair demand of the wide rows
        xs, ys = [], []
        for c in range(3):
            p = comb[:, c]
            xs.append((p & 0xFFFF) - off)
            ys.append(((p >> 16) & 0xFFFF) - off)
        xmin = jnp.minimum(jnp.minimum(xs[0], xs[1]), xs[2])
        xmax = jnp.maximum(jnp.maximum(xs[0], xs[1]), xs[2])
        ymin = jnp.minimum(jnp.minimum(ys[0], ys[1]), ys[2])
        ymax = jnp.maximum(jnp.maximum(ys[0], ys[1]), ys[2])
        pxmin = jnp.maximum(0, (xmin - half + ss - 1) // ss)
        pxmax = jnp.minimum(cfg.width - 1, (xmax - half) // ss)
        pymin = jnp.maximum(0, (ymin - half + ss - 1) // ss)
        pymax = jnp.minimum(cfg.height - 1, (ymax - half) // ss)
        ntx = pxmax // cfg.tile_w - pxmin // cfg.tile_w + 1
        nty = pymax // cfg.tile_h - pymin // cfg.tile_h + 1
        c = jnp.where(wide, ntx * nty, 0)
        n_wide = jnp.sum(wide.astype(I32))
        pairs_needed = jnp.sum(c)
        n_tiled = jnp.sum((keys < wide_key).astype(I32))
        return n_wide, pairs_needed, n_tiled

    return stats


def frame_arrays(r, cam):
    st = r.settings
    model_mats = r.scene.model_matrices()
    view = cam.view_matrix()
    proj = cam.projection_matrix(st.render_width / st.render_height)
    mvp = compose_mvp(model_mats, view, proj)
    return jnp.asarray(model_mats), jnp.asarray(mvp), jnp.asarray(
        cam.position.astype(np.float32)
    )


def keys_for(r, cam):
    b = r._buffers
    st = r.settings
    mm, mv, cpos = frame_arrays(r, cam)
    tblT = plmod._fstage_transform(
        b["positions"], b["vert_obj"], b["normals"], b["colors"], b["uvs"],
        mm, mv,
    )
    comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
        tblT, b["ltT"], b["matT"], r.cfg, interpret=False,
        tail_rows=st.clip_budget * MAX_CLIP_TRIS,
    )
    comb, keys_tail, gstats = plmod._fstage_tail(
        r.statics, tblT, b["tri_v"], b["tri_mat"], flags, comb
    )
    keys = jnp.concatenate([keys_main, keys_tail])
    return comb, keys, gstats


def stage_split(r, cam, label, reps=3):
    b = r._buffers
    st = r.settings
    mm, mv, cpos = frame_arrays(r, cam)

    def run():
        out = {}
        t0 = time.perf_counter()
        tblT = plmod._fstage_transform(
            b["positions"], b["vert_obj"], b["normals"], b["colors"],
            b["uvs"], mm, mv,
        )
        comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
            tblT, b["ltT"], b["matT"], r.cfg, interpret=False,
            tail_rows=st.clip_budget * MAX_CLIP_TRIS,
        )
        force(keys_main)
        out["transform+setup"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        comb, keys_tail, gstats = plmod._fstage_tail(
            r.statics, tblT, b["tri_v"], b["tri_mat"], flags, comb
        )
        force(keys_tail)
        out["clip_tail"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rmeta, tbl_sorted, tbl_ext, sstats = plmod._fstage_sort(
            r.statics, comb, keys_main, keys_tail
        )
        force(rmeta)
        out["sort+expand"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        vis_d, vis_t, planes = fused_kernel.rasterize_distribute(
            rmeta, tbl_sorted, tbl_ext, r.cfg, interpret=False
        )
        force(vis_t)
        out["raster_kernel"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rgba8 = plmod._fstage_shade(
            r.statics, planes, cpos, r.materials, r.atlas, r.light
        )
        force(rgba8)
        out["shade"] = time.perf_counter() - t0
        return out, rmeta

    out, rmeta = run()  # warm any new shapes
    acc = {k: 0.0 for k in out}
    for _ in range(reps):
        out, rmeta = run()
        for k, v in out.items():
            acc[k] += v
    print(f"--- stage split: {label} ---", flush=True)
    for k, v in acc.items():
        print(f"  {k:16s} {v/reps*1000:7.2f} ms", flush=True)
    print(f"  total            {sum(acc.values())/reps*1000:7.2f} ms", flush=True)
    # range-meta population: how many slots does each tile stream?
    rm = np.asarray(rmeta)[:-1].reshape(-1, 6, 2)
    spans = rm[:, :, 1] - rm[:, :, 0]
    per_tile = spans.sum(axis=1)
    print(
        f"  kernel slots/tile: mean={per_tile.mean():.0f} max={per_tile.max()}"
        f"  wide-run len={spans[0, 4]}  pair-slots total={spans[:, 5].sum()}",
        flush=True,
    )


def main():
    scene, settings, cams = config4_million_tri(subdiv=8)
    r = Renderer(scene, settings)
    static_cam = cams[0]
    n_tiles = r.cfg.n_tiles
    print(f"budgets: wide_rows={r.settings.wide_rows} "
          f"wide_pairs={r.settings.wide_pairs}", flush=True)

    t0 = time.perf_counter()
    r.render_frame(static_cam)
    print(f"first frame: {time.perf_counter()-t0:.1f}s", flush=True)
    stats_fn = make_wide_stats(r.cfg)

    # bench.py's exact fly-by path
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from bench import flyby_path

    fcams = flyby_path(24)
    r.render_frame(fcams[0])  # warm clip branch

    # per-frame forced timings (readback sync adds ~30 ms to each; relative
    # shape is what matters) + population counters
    rows = []
    for i, fc in enumerate(fcams):
        t0 = time.perf_counter()
        rgba8, aux = r.render_frame(fc)
        force(rgba8)
        dt = time.perf_counter() - t0
        comb, keys, gstats = keys_for(r, fc)
        n_wide, pairs_needed, n_tiled = stats_fn(comb, keys)
        rows.append(
            (i, dt * 1000, int(n_wide), int(pairs_needed), int(n_tiled),
             int(np.asarray(aux["n_clipped"])), int(np.asarray(aux["n_valid"])))
        )
        print(
            f"frame {i:2d}: {dt*1000:7.1f} ms  wide={rows[-1][2]:6d} "
            f"pairs_needed={rows[-1][3]:8d} tiled={rows[-1][4]:7d} "
            f"clipped={rows[-1][5]:5d} valid={rows[-1][6]:7d}",
            flush=True,
        )

    # unforced loop (bench.py's measurement): unbounded frames in flight
    t0 = time.perf_counter()
    for fc in fcams:
        rgba8, aux = r.render_frame(fc)
    force(rgba8)
    mdt = (time.perf_counter() - t0) / len(fcams)
    print(f"bench-style loop: {mdt*1000:.1f} ms/frame = {1/mdt:.2f} FPS",
          flush=True)

    # fence-gated loop: at most 2 frames in flight (the reference's
    # frames_in_flight semantics, renderer.rs:395-404) — discriminates a
    # dispatch/allocator pipelining pathology from real per-frame cost
    from collections import deque

    q = deque()
    t0 = time.perf_counter()
    for fc in fcams:
        rgba8, aux = r.render_frame(fc)
        q.append(rgba8)
        if len(q) > 2:
            force(q.popleft())
    while q:
        force(q.popleft())
    mdt = (time.perf_counter() - t0) / len(fcams)
    print(f"fence-gated loop (2 in flight): {mdt*1000:.1f} ms/frame = "
          f"{1/mdt:.2f} FPS", flush=True)

    # and the same two loops for the STATIC camera, as the control
    t0 = time.perf_counter()
    for _ in range(24):
        rgba8, aux = r.render_frame(static_cam)
    force(rgba8)
    print(f"static unforced loop: {(time.perf_counter()-t0)/24*1000:.1f} "
          f"ms/frame", flush=True)
    q = deque()
    t0 = time.perf_counter()
    for _ in range(24):
        rgba8, aux = r.render_frame(static_cam)
        q.append(rgba8)
        if len(q) > 2:
            force(q.popleft())
    while q:
        force(q.popleft())
    print(f"static fence-gated loop: {(time.perf_counter()-t0)/24*1000:.1f} "
          f"ms/frame", flush=True)

    worst = sorted(rows, key=lambda t: -t[1])[:3]
    for i, *_ in worst:
        stage_split(r, fcams[i], f"frame {i}")


if __name__ == "__main__":
    main()
