"""Probe the costs that decide the fused-v3 data flow:

1. XLA row-gather of (S, F) i32 tables by a sorted-by-tile permutation
   (the "pre-sorted contiguous tables" plan) at several S and F;
2. lax.sort carrying payload columns (the "sort the table itself" plan);
3. geometry sub-stage breakdown (the mystery 200 ms).
"""
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
    rng = np.random.default_rng(0)

    # ---- 1. row gather by permutation
    for s in (1 << 19, 1371136):
        perm = jnp.asarray(rng.permutation(s).astype(np.int32))
        for f in (8, 16, 64):
            tbl = jnp.asarray(
                rng.integers(-2**31, 2**31, (s, f), dtype=np.int64).astype(
                    np.int32
                )
            )
            dt, _ = timeit(jax.jit(lambda t, p: t[p]), tbl, perm)
            print(f"gather rows S={s} F={f}: {dt*1000:.1f} ms", flush=True)
        # ascending (nearly-identity) indices — does order matter?
        asc = jnp.asarray(np.sort(rng.permutation(s)[: s]).astype(np.int32))
        tbl = jnp.asarray(rng.integers(0, 100, (s, 16), dtype=np.int64
                                       ).astype(np.int32))
        dt, _ = timeit(jax.jit(lambda t, p: t[p]), tbl, asc)
        print(f"gather rows S={s} F=16 (ascending idx): {dt*1000:.1f} ms",
              flush=True)
        # gather transposed layout (F, S) along axis=1
        tblT = tbl.T
        dt, _ = timeit(jax.jit(lambda t, p: t[:, p]), tblT, perm)
        print(f"gather cols (16, S={s}) axis1: {dt*1000:.1f} ms", flush=True)

    # ---- 2. sort with payload columns
    s = 1371136
    key = jnp.asarray(rng.integers(0, 8192, s, dtype=np.int64).astype(np.int32))
    for ncols in (1, 4, 8, 16):
        ops = [key] + [
            jnp.asarray(rng.integers(0, 100, s, dtype=np.int64).astype(
                np.int32))
            for _ in range(ncols)
        ]
        dt, _ = timeit(
            jax.jit(lambda *o: jax.lax.sort(o, num_keys=1)), *ops
        )
        print(f"sort S={s} payload={ncols} cols: {dt*1000:.1f} ms", flush=True)

    # ---- 3. geometry sub-stages at config4 shapes
    from ash_renderer_tpu.benchmarks import config4_million_tri
    from ash_renderer_tpu import derive_raster_config
    from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
    from ash_renderer_tpu.ops import geometry, meshlet_gather
    from ash_renderer_tpu import specmath as sm

    scene, settings, cams = config4_million_tri(subdiv=8)
    cam = cams[0]
    packed = scene.pack(meshlets=True)
    cfg = derive_raster_config(settings.render_width, settings.render_height,
                               tile_h=8)
    view = cam.view_matrix()
    proj = cam.projection_matrix(
        settings.render_width / settings.render_height)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    pos = jnp.asarray(packed.positions)
    vo = jnp.asarray(packed.vert_obj)
    nr = jnp.asarray(packed.normals)
    co = jnp.asarray(packed.colors)
    uv = jnp.asarray(packed.uvs)
    tv = jnp.asarray(packed.tri_v)
    to = jnp.asarray(packed.tri_obj)
    om = jnp.asarray(packed.obj_material)
    lt = jnp.asarray(packed.local_tri)
    mmj, mvpj = jnp.asarray(mm), jnp.asarray(mvp)
    force([pos, vo, nr, co, uv, tv, to, om, lt])

    @jax.jit
    def s_transform(pos, vo, nr, co, uv, m, v):
        return geometry.transform_vertices(pos, vo, nr, co, uv, m, v)

    dt, (clip, attrs) = timeit(s_transform, pos, vo, nr, co, uv, mmj, mvpj)
    print(f"geom/transform_vertices: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def s_vpost(clip):
        return geometry._vertex_post(clip, cfg)

    dt, vtx = timeit(s_vpost, clip)
    print(f"geom/_vertex_post: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def s_mgather(vtx, lt):
        return meshlet_gather.gather_tri_rows(vtx, lt, False)

    dt, g3 = timeit(s_mgather, vtx, lt)
    print(f"geom/meshlet corner gather: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def s_matid(to, om):
        return om[jnp.clip(to, 0, om.shape[0] - 1)]

    dt, _ = timeit(s_matid, to, om)
    print(f"geom/mat_id gather (T,): {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def s_finish(g3, tv):
        corner_snaps = tuple(
            (g3[:, k, 0], g3[:, k, 1], g3[:, k, 2],
             sm._bitcast_f32(g3[:, k, 3], jnp))
            for k in range(3)
        )
        vidc = jnp.clip(tv, 0, 10**9)
        alive = tv[:, 0] >= 0
        return geometry._finish_tri(
            corner_snaps, (vidc[:, 0], vidc[:, 1], vidc[:, 2]),
            jnp.zeros_like(vidc[:, 0]), alive,
        )

    dt, _ = timeit(s_finish, g3, tv)
    print(f"geom/_finish_tri(main): {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def s_nonzero(flags):
        return jnp.nonzero(flags, size=settings.clip_budget, fill_value=-1)[0]

    oc = (g3[:, 0, 4] | g3[:, 1, 4] | g3[:, 2, 4]) != 0
    dt, _ = timeit(s_nonzero, oc)
    print(f"geom/nonzero(clip_budget={settings.clip_budget}): "
          f"{dt*1000:.1f} ms", flush=True)

    @jax.jit
    def s_full(pos, vo, nr, co, uv, tv, to, om, m, v, lt):
        clip, attrs = geometry.transform_vertices(pos, vo, nr, co, uv, m, v)
        return geometry.geometry_device(
            clip, attrs, tv, to, om, cfg, settings.clip_budget, local_tri=lt
        )

    dt, _ = timeit(s_full, pos, vo, nr, co, uv, tv, to, om, mmj, mvpj, lt)
    print(f"geom/FULL: {dt*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
