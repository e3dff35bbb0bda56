"""Why is config5 (4x SSAA fly-through, ~33.5k tris at 1600x1200) only
~10 FPS when config4 (1.31M tris, 2.07M px) runs ~22?

Hypotheses: (a) wide-triangle explosion — at 2x supersample the near
terrain triangles exceed the 2-tile AABB rule, and anything past the
wide/pair budgets lands in the GLOBAL wide run that every tile streams
(cost ~ n_tiles * overflow); (b) clip-tail cond taken on orbit frames;
(c) something pixel-proportional.

Prints per-frame key-class counts (live/mid/wide), the pair-expansion
budgets vs demand, and stage wall deltas (one-leaf force, reps=8).
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

I32 = np.int32


def timeit(fn, *args, reps=8, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{label:34s} {(time.perf_counter()-t0)/reps*1000:7.2f} ms",
          flush=True)
    return out


def main():
    from ash_renderer_tpu.benchmarks import config5_flythrough
    from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
    from ash_renderer_tpu.ops import binsort, setup_kernel
    from ash_renderer_tpu.renderer import Renderer
    from ash_renderer_tpu import pipeline as plmod

    scene, settings, cams = config5_flythrough()
    settings = dataclasses.replace(settings, pipeline="fused")
    r = Renderer(scene, settings)
    cfg = r.cfg
    st = r.statics.settings
    b = r._buffers
    print(f"render {st.render_width}x{st.render_height}, tiles {cfg.n_tiles}, "
          f"budgets wide_rows={st.wide_rows} wide_pairs={st.wide_pairs} "
          f"clip={st.clip_budget}", flush=True)
    mm = scene.model_matrices()

    for fi in (0, 8, 16):
        cam = cams[fi]
        view = cam.view_matrix()
        proj = cam.projection_matrix(st.render_width / st.render_height)
        mvp = compose_mvp(mm, view, proj)
        tblT = plmod._fstage_transform(
            b["positions"], b["vert_obj"], b["normals"], b["colors"],
            b["uvs"], jnp.asarray(mm), jnp.asarray(mvp),
        )
        comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
            tblT, b["ltT"], b["matT"], cfg, tail_rows=st.clip_budget * 7,
        )
        comb, keys_tail, gstats = plmod._fstage_tail(
            r.statics, tblT, b["tri_v"], b["tri_mat"], flags, comb
        )
        keys = np.asarray(jnp.concatenate([keys_main, keys_tail]))
        th = cfg.tile_h
        kw = cfg.n_tiles * binsort.N_GRP * th
        wide = int((keys == kw).sum())
        dead = int((keys == kw + 1).sum())
        live = keys.shape[0] - dead
        nclip = int(np.asarray(gstats["n_clipped"])) if "n_clipped" in gstats else -1
        # wide-pair demand: tiles overlapped by each wide row
        order, bounds = binsort.sort_and_bounds(keys, cfg)
        pr, ps, ws = binsort.expand_wide_pairs(
            comb, order, bounds, cfg, st.wide_rows, st.wide_pairs,
        )
        bo = np.asarray(bounds)
        ws_v = int(np.asarray(ws))
        wide_s, wide_e = int(bo[cfg.n_tiles * 4]), int(bo[cfg.n_tiles * 4 + 1])
        print(f"frame {fi}: live={live} wide={wide} clip={nclip} | "
              f"wide run [{wide_s},{wide_e}) expanded to {ws_v} "
              f"(global leftover {wide_e - ws_v}) pairs={int(np.asarray(ps)[-1])}",
              flush=True)

    cam = cams[8]
    f_frame = lambda c: r.render_frame(c)[0]
    timeit(f_frame, cam, label="full frame (orbit cam 8)")
    timeit(f_frame, cams[0], label="full frame (cam 0)")


if __name__ == "__main__":
    main()
