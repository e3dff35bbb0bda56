"""Profile the fused pipeline's stages on TPU at the config4 workload, and
report the sorted-order id-span statistics that drive the kernel's windowed
gather costs."""
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
    from ash_renderer_tpu.ops import binsort, fused_kernel, geometry, tritables

    scene, settings, cams = config4_million_tri(subdiv=8)
    cam = cams[0]
    packed = scene.pack()
    cfg = derive_raster_config(
        settings.render_width, settings.render_height, tile_h=8
    )
    view = cam.view_matrix()
    proj = cam.projection_matrix(settings.render_width / settings.render_height)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)

    dev_args = [
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
    ]
    force(dev_args)

    @jax.jit
    def stage_geom(pos, vo, nr, co, uv, tv, to, om, m, v):
        clip, attrs = geometry.transform_vertices(pos, vo, nr, co, uv, m, v)
        return geometry.geometry_device(
            clip, attrs, tv, to, om, cfg, settings.clip_budget
        )

    dt, (su, attrs_full, gstats) = timeit(stage_geom, *dev_args)
    print(f"geometry (XLA corner gathers): {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def stage_binsort(su):
        return binsort.bin_sort(su, cfg)

    dt, (order, bounds) = timeit(stage_binsort, su)
    print(f"binsort: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def stage_meta(order, bounds):
        return fused_kernel.build_range_meta(order, bounds, cfg.n_tiles,
                                             cfg.grid_w)

    dt, rmeta = timeit(stage_meta, order, bounds)
    print(f"range meta: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def stage_tables(su, attrs_full):
        tras = tritables.build_ras_table(su, cfg)
        tdist = tritables.build_dist_table(su, attrs_full, cfg)
        pad = fused_kernel.WT + 256
        return tritables.ras_bytes(tras, pad), tritables.dist_byte_planes(
            tdist, pad
        )

    dt, (ras_b, dist_p) = timeit(stage_tables, su, attrs_full)
    print(f"tables (incl. 3 XLA attr gathers): {dt*1000:.1f} ms", flush=True)

    order2 = jnp.pad(order, (0, 384)).reshape(1, -1)
    force([order2, rmeta])

    dt, (vis_d, vis_t, planes) = timeit(
        lambda: fused_kernel.rasterize_distribute(
            order2, rmeta, ras_b, dist_p, cfg
        ),
        reps=3,
    )
    print(f"FUSED KERNEL: {dt*1000:.1f} ms", flush=True)

    # ---- id-span statistics on host
    orderh = np.asarray(order)
    boundsh = np.asarray(bounds)
    n_tiles = cfg.n_tiles
    spans = []
    wins = []
    counts = []
    for tile in range(n_tiles):
        rs, re = boundsh[tile * 4], boundsh[(tile + 1) * 4]
        if re <= rs:
            continue
        counts.append(re - rs)
        ids = orderh[rs:re]
        for p in range(rs, re, 128):
            seg = orderh[p : min(p + 128, re)]
            span = int(seg.max() - seg.min())
            spans.append(span)
            wins.append(span // fused_kernel.WT + 1)
    spans = np.array(spans)
    wins = np.array(wins)
    counts = np.array(counts)
    print(
        f"own runs: n={counts.size} mean={counts.mean():.0f} "
        f"p99={np.percentile(counts, 99):.0f} max={counts.max()}",
        flush=True,
    )
    print(
        f"segment id-span: mean={spans.mean():.0f} "
        f"p50={np.percentile(spans, 50):.0f} "
        f"p99={np.percentile(spans, 99):.0f} max={spans.max()}",
        flush=True,
    )
    print(
        f"windows/segment (WT={fused_kernel.WT}): mean={wins.mean():.2f} "
        f"p99={np.percentile(wins, 99):.0f} max={wins.max()} "
        f"total={wins.sum()}",
        flush=True,
    )
    wide_n = int(boundsh[n_tiles * 4 + 1] - boundsh[n_tiles * 4])
    print(f"wide run: {wide_n} triangles", flush=True)
    nseg = len(spans)
    print(f"own segments: {nseg} (x2 phases, + neighbor ranges)", flush=True)


if __name__ == "__main__":
    main()
