"""Time the setup-kernel fused pipeline end-to-end + per stage on config4."""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def force(x):
    return [np.asarray(l.ravel()[:1]) for l in jax.tree.leaves(x)]


def timeit(fn, *args, reps=5):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / reps, out


def main():
    from ash_renderer_tpu.benchmarks import config4_million_tri
    from ash_renderer_tpu import derive_raster_config
    from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
    from ash_renderer_tpu.ops import binsort, fused_kernel, geometry, \
        setup_kernel, tritables
    from ash_renderer_tpu.renderer import Renderer

    scene, settings, cams = config4_million_tri()
    settings = dataclasses.replace(settings, pipeline="fused")
    cam = cams[0]

    r = Renderer(scene, settings)
    skip_full = os.environ.get("SKIP_FULL", "0") == "1"
    if not skip_full:
        print("compile + first frame...", file=sys.stderr)
        t0 = time.time()
        rgba8, aux = r.render_frame(cam)
        force(rgba8)
        print(f"first frame: {time.time()-t0:.1f}s", file=sys.stderr)
        dt, _ = timeit(lambda: r.render_frame(cam)[0])
        print(f"FULL FUSED FRAME: {dt*1000:.1f} ms = {1/dt:.2f} FPS", flush=True)

    # ---- stage timings
    packed = r.packed
    cfg = r.cfg
    st = r.statics.settings
    view = cam.view_matrix()
    proj = cam.projection_matrix(st.render_width / st.render_height)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    b = r._buffers
    targs = (
        b["positions"], b["vert_obj"], b["normals"], b["colors"], b["uvs"],
        jnp.asarray(mm), jnp.asarray(mvp),
    )

    tT = jax.jit(setup_kernel.transform_vertices_T)
    dt, tblT = timeit(tT, *targs)
    print(f"transform_T: {dt*1000:.1f} ms", flush=True)

    setup = jax.jit(
        lambda tbl: setup_kernel.triangle_setup(tbl, b["ltT"], b["matT"], cfg)
    )
    dt, (comb_main, keys_main, flags, _ex, _ey) = timeit(setup, tblT)
    print(f"setup kernel: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def tail(tblT, flags):
        needs_clip = ((flags >> 1) & 1).astype(bool)
        tf, (a0, a1, a2), _ = geometry.clip_tail_fused(
            tblT, b["tri_v"], b["tri_mat"], needs_clip, cfg, st.clip_budget
        )
        ct = tritables.comb_rows(tf, a0, a1, a2, cfg, id_base=comb_main.shape[0])
        kt = binsort.stream_keys(
            tf["valid"], tf["x0"], tf["y0"], tf["x1"], tf["y1"], tf["x2"],
            tf["y2"], cfg,
        )
        return ct, kt

    dt, (comb_tail, keys_tail) = timeit(tail, tblT, flags)
    print(f"clip tail: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def sortstage(comb_main, comb_tail, keys_main, keys_tail):
        comb = jnp.concatenate([comb_main, comb_tail], axis=0)
        keys = jnp.concatenate([keys_main, keys_tail])
        order, bounds = binsort.sort_and_bounds(keys, cfg)
        rmeta = fused_kernel.build_range_meta(bounds, cfg.n_tiles, cfg.grid_w)
        tbl_sorted = tritables.sorted_table(comb, order, 256)
        return rmeta, tbl_sorted

    dt, (rmeta, tbl_sorted) = timeit(
        sortstage, comb_main, comb_tail, keys_main, keys_tail
    )
    print(f"sort + meta + sorted gather: {dt*1000:.1f} ms", flush=True)

    rast = jax.jit(
        lambda rmeta, tbl: fused_kernel.rasterize_distribute(
            rmeta, tbl, jnp.zeros((512, 128), jnp.int32), cfg
        )
    )
    dt, (vis_d, vis_t, planes) = timeit(rast, rmeta, tbl_sorted)
    print(f"raster kernel: {dt*1000:.1f} ms", flush=True)

    from ash_renderer_tpu import pipeline as plmod

    @jax.jit
    def shadestage(planes, vis_t):
        fields = plmod._planes_to_fields(planes, cfg, cfg.grid_h)[
            :, : cfg.height, : cfg.width
        ]
        return plmod._shade_from_planes(
            r.statics, fields, vis_t,
            jnp.asarray(cam.position.astype(np.float32)),
            r.materials, r.atlas, r.light,
        )

    dt, _ = timeit(shadestage, planes, vis_t)
    print(f"planes->fields + shade: {dt*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
