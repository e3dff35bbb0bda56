"""Probe: TPU costs of the binning-stage primitives at real sizes.

Measures (steady-state, compilation-cached):
  * row-gather cost vs index count and row width
  * searchsorted(method='sort') cost
  * sort_key_val cost vs size and payload count
Then renders BASELINE config4 once and reports the real pair statistics
(pairs, per-tile distribution, subtile-pair estimate) that size the round-2
raster kernel design.
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


def timeit(fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / reps


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    S = 1 << 21

    for width in (1, 4, 16, 52):
        tbl = jnp.asarray(
            rng.integers(-1000, 1000, (S, width)).astype(np.int32)
        )
        for logp in (18, 19, 20):
            p = 1 << logp
            idx = jnp.asarray(rng.integers(0, S, p).astype(np.int32))
            f = jax.jit(lambda t, i: t[i])
            dt = timeit(f, tbl, idx)
            print(
                f"row-gather (S={S}, width={width:3d}) P=2^{logp}: "
                f"{dt*1000:7.2f} ms = {dt/p*1e9:5.1f} ns/idx",
                flush=True,
            )

    ends = jnp.asarray(np.sort(rng.integers(0, 1 << 20, S)).astype(np.int32))
    for logp in (19, 20):
        p = 1 << logp
        q = jnp.asarray(np.arange(p, dtype=np.int32))
        f = jax.jit(
            lambda e, i: jnp.searchsorted(e, i, side="right", method="sort")
        )
        dt = timeit(f, ends, q)
        print(
            f"searchsorted sort-method (S=2^21) P=2^{logp}: {dt*1000:7.2f} ms",
            flush=True,
        )

    for logp in (19, 20, 21):
        p = 1 << logp
        keys = jnp.asarray(rng.integers(0, 1 << 14, p).astype(np.int32))
        val = jnp.asarray(rng.integers(0, 1 << 20, p).astype(np.int32))
        f2 = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
        dt = timeit(f2, keys, val)
        print(f"sort_key_val P=2^{logp}: {dt*1000:7.2f} ms", flush=True)
        vals5 = [val] * 5
        f6 = jax.jit(lambda k, *vs: jax.lax.sort((k,) + vs, num_keys=1))
        dt = timeit(f6, keys, *vals5)
        print(f"sort 1key+5payload P=2^{logp}: {dt*1000:7.2f} ms", flush=True)

    # scatter probe: out.at[idx].set(rows)
    for logp in (19, 20):
        p = 1 << logp
        idx = jnp.asarray(
            rng.permutation(2 * p)[:p].astype(np.int32)
        )
        rows = jnp.asarray(rng.integers(0, 100, (p, 16)).astype(np.int32))
        f = jax.jit(
            lambda i, r: jnp.zeros((2 * p, 16), np.int32).at[i].set(r)
        )
        dt = timeit(f, idx, rows)
        print(
            f"scatter rows (width 16) P=2^{logp}: {dt*1000:7.2f} ms",
            flush=True,
        )

    # ---- real config4 stats
    from ash_renderer_tpu.benchmarks import config4_million_tri
    from ash_renderer_tpu import derive_raster_config
    from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
    from ash_renderer_tpu.pipeline import _stage_geometry, _stage_binning

    scene, settings, cams = config4_million_tri(subdiv=8)
    cam = cams[0]
    packed = scene.pack()
    cfg = derive_raster_config(settings.render_width, settings.render_height)
    view = cam.view_matrix()
    proj = cam.projection_matrix(settings.render_width / settings.render_height)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    t0 = time.time()
    su, attrs_full, gstats = _stage_geometry(
        cfg, settings.clip_budget,
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
    )
    force(su.x0)
    print(f"geometry compile+run: {time.time()-t0:.1f}s", flush=True)
    dt = timeit(
        lambda: _stage_geometry(
            cfg, settings.clip_budget,
            jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
            jnp.asarray(packed.normals), jnp.asarray(packed.colors),
            jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
            jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
            jnp.asarray(mm), jnp.asarray(mvp),
        ),
        reps=5,
    )
    print(f"geometry stage steady: {dt*1000:.1f} ms", flush=True)

    rec_i, rec_f, tile_start, tile_count, bstats = _stage_binning(
        cfg, settings.max_pairs, su
    )
    force(rec_i)
    dt = timeit(lambda: _stage_binning(cfg, settings.max_pairs, su), reps=5)
    print(f"binning stage steady (P=2^20): {dt*1000:.1f} ms", flush=True)

    n_valid = int(np.asarray(gstats["n_valid"]))
    pairs = int(np.asarray(bstats["pairs_total"]))
    tc = np.asarray(tile_count)
    print(
        f"config4: valid tris {n_valid}, pairs {pairs}, "
        f"overflow {int(np.asarray(bstats['pairs_overflow']))}",
        flush=True,
    )
    print(
        f"tile_count: tiles {tc.size} nonzero {(tc>0).sum()} mean "
        f"{tc.mean():.1f} max {tc.max()} p99 {np.percentile(tc,99):.0f}",
        flush=True,
    )

    # subtile-pair estimate: re-bin AABBs against 8x16 subtiles on host
    x0 = np.asarray(su.x0); x1 = np.asarray(su.x1); x2 = np.asarray(su.x2)
    y0 = np.asarray(su.y0); y1 = np.asarray(su.y1); y2 = np.asarray(su.y2)
    ok = np.asarray(su.valid)
    ss = cfg.subpixel_scale
    half = ss // 2
    xmin = np.minimum(np.minimum(x0, x1), x2)
    xmax = np.maximum(np.maximum(x0, x1), x2)
    ymin = np.minimum(np.minimum(y0, y1), y2)
    ymax = np.maximum(np.maximum(y0, y1), y2)
    pxmin = np.maximum(0, (xmin - half + ss - 1) // ss)
    pxmax = np.minimum(cfg.width - 1, (xmax - half) // ss)
    pymin = np.maximum(0, (ymin - half + ss - 1) // ss)
    pymax = np.minimum(cfg.height - 1, (ymax - half) // ss)
    live = ok & (pxmax >= pxmin) & (pymax >= pymin)
    for tw, th, name in ((128, 16, "tile 16x128"), (128, 8, "tile 8x128"),
                         (16, 8, "subtile 8x16")):
        n = (
            (pxmax[live] // tw - pxmin[live] // tw + 1)
            * (pymax[live] // th - pymin[live] // th + 1)
        ).sum()
        print(f"pairs at {name}: {int(n)}", flush=True)

    # save the real workload for kernel microbenchmarks
    np.savez(
        "/tmp/config4_workload.npz",
        rec_i=np.asarray(rec_i),
        rec_f=np.asarray(rec_f),
        tile_start=np.asarray(tile_start),
        tile_count=np.asarray(tile_count),
    )
    print("workload saved to /tmp/config4_workload.npz", flush=True)


if __name__ == "__main__":
    main()
