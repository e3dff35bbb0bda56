"""Price the phase-V packed-fine design (VERDICT r5 item 1) BEFORE building it.

The design: small triangles (no tile spill, AABB inside one 16-px lane
window) leave the coarse slot stream and enter a per-(tile, subcol) padded
"wave" table — each 8-row wave holds one triangle per 16-lane window, so one
(8, 128) window-major evaluation covers 8 triangles' entire tile footprint
(~10x fewer vreg-ops per fine triangle than the 43 ns/slot coarse eval),
with a per-tile byte-plane matmul relayout into screen layout.

Whether it's a NET win is decided by XLA-side machinery costs this probe
measures on hardware:
  1. headline fine-population stats (what fraction qualifies; per-
     (tile, subcol) imbalance -> padded-table inflation);
  2. the padded row gather (tbl2[padded_src]) at the implied row counts,
     random vs structured monotonic indices;
  3. cummax (segment-base broadcast) over the row count;
  4. the small scatter that seeds it;
  5. sorted_run_bounds scaling from 8.1k bins (today) to ~24.5k
     (+ 8 subcol bins per tile);
  6. the 1.37M-row sort with the wider key space (control: same cost).

Decision rule (DESIGN.md): added XLA cost must stay well under the ~6-7 ms
phase-V saving at the headline; otherwise this becomes a recorded negative
with numbers.

Usage: python experiments/packed_fine_probe.py [--subdiv 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")

import numpy as np

F32 = np.float32
I32 = np.int32


def force(x):
    import jax as _jax
    import numpy as _np

    leaf = _jax.tree.leaves(x)[0]
    return _np.asarray(leaf.ravel()[:4])


def timeit(fn, reps=16):
    fn()  # compile
    force(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    force(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ash_renderer_tpu.benchmarks import config4_million_tri
    from ash_renderer_tpu.config import derive_raster_config
    from ash_renderer_tpu.ops import setup_kernel
    from ash_renderer_tpu.ops.bincount import sorted_run_bounds
    from ash_renderer_tpu.oracle.raster_cpu import compose_mvp

    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- 1. headline fine-population stats (device setup, host analysis)
    scene, settings, cams = config4_million_tri(subdiv=args.subdiv)
    cfg = derive_raster_config(
        settings.render_width, settings.render_height, tile_h=8
    )
    packed = scene.pack(meshlets=True)
    cam = cams[0]
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, cam.view_matrix(),
                      cam.projection_matrix(settings.width / settings.height))
    tri_mat = packed.obj_material[
        np.clip(packed.tri_obj, 0, len(packed.obj_material) - 1)
    ]
    ltT, matT = setup_kernel.prep_static(
        packed.local_tri, tri_mat, packed.tri_v[:, 0] >= 0
    )
    tblT = setup_kernel.transform_vertices_T(
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(mm), jnp.asarray(mvp),
    )
    comb, keys, flags, extx, exty = setup_kernel.triangle_setup(
        jnp.asarray(tblT), jnp.asarray(ltT), jnp.asarray(matT), cfg
    )
    keys_h = np.asarray(keys)
    extx_h = np.asarray(extx)
    exty_h = np.asarray(exty)
    s_rows = keys_h.shape[0]
    n_tiles = cfg.n_tiles
    live = keys_h < n_tiles * 4
    grp_none = live & (keys_h % 4 == 3)
    pxmin = (extx_h << 16) >> 16
    pxmax = extx_h >> 16
    pymin = (exty_h << 16) >> 16
    pymax = exty_h >> 16
    fine16 = grp_none & (pxmin // 16 == pxmax // 16)
    fine32 = grp_none & (pxmin // 32 == pxmax // 32)
    n_live = int(live.sum())
    print(
        f"live rows {n_live} | grp_none {int(grp_none.sum())} "
        f"({100*grp_none.sum()/max(n_live,1):.1f}% of live) | "
        f"fine16 {int(fine16.sum())} ({100*fine16.sum()/max(n_live,1):.1f}%) | "
        f"fine32 {int(fine32.sum())} ({100*fine32.sum()/max(n_live,1):.1f}%)",
        flush=True,
    )
    for wname, fmask, nsub in (("16", fine16, 8), ("32", fine32, 4)):
        tile = keys_h[fmask] // 4
        sub = (pxmin[fmask] % 128) // (128 // nsub)
        bins = tile * nsub + sub
        cnt = np.bincount(bins, minlength=n_tiles * nsub).reshape(
            n_tiles, nsub
        )
        waves = cnt.max(axis=1)
        padded = int(nsub * waves.sum())
        print(
            f"  win{wname}: fine rows {int(fmask.sum())} -> padded "
            f"{padded} ({padded/max(int(fmask.sum()),1):.2f}x), "
            f"max waves/tile {int(waves.max())}, "
            f"tiles with fine {int((waves>0).sum())}",
            flush=True,
        )

    # ---- 2. padded row gather cost (the design's main added cost)
    comb_d = comb  # (S+tail, 128) i32 on device
    s_tbl = comb_d.shape[0]
    rng = np.random.default_rng(0)
    f_rand = jax.jit(lambda tbl, i: tbl[i])
    for n_idx in (131072, 262144, 409600, 524288):
        idx_rand = jnp.asarray(
            rng.integers(0, s_tbl, n_idx).astype(np.int32)
        )
        # structured: sorted bases with small in-run offsets (what
        # start[bin] + wave*stride looks like after the padded reshape)
        base = np.sort(rng.integers(0, s_tbl - 64, n_idx // 8)).astype(
            np.int32
        )
        idx_struct = jnp.asarray(
            (base[:, None] + np.arange(8, dtype=np.int32) * 1).reshape(-1)
        )
        tr = timeit(lambda: f_rand(comb_d, idx_rand))
        ts = timeit(lambda: f_rand(comb_d, idx_struct))
        print(
            f"row gather (S={s_tbl}) n={n_idx}: random {tr*1e3:.2f} ms, "
            f"structured {ts*1e3:.2f} ms",
            flush=True,
        )

    # ---- 3. cummax over the row count (segment-base broadcast)
    x = jnp.asarray(rng.integers(0, 1 << 20, s_rows).astype(np.int32))
    f_cm = jax.jit(
        lambda v: jax.lax.associative_scan(jnp.maximum, v)
    )
    print(f"cummax over {s_rows}: {timeit(lambda: f_cm(x))*1e3:.2f} ms",
          flush=True)

    # ---- 4. small scatter (marker seed): 16.2k updates into (S,)
    upd_idx = jnp.asarray(
        np.sort(rng.choice(s_rows, 16200, replace=False)).astype(np.int32)
    )
    upd_val = jnp.asarray(rng.integers(0, 1 << 20, 16200).astype(np.int32))
    zeros = jnp.zeros(s_rows, I32)
    f_sc = jax.jit(lambda z, i, v: z.at[i].set(v))
    print(
        f"scatter 16.2k into ({s_rows},): "
        f"{timeit(lambda: f_sc(zeros, upd_idx, upd_val))*1e3:.2f} ms",
        flush=True,
    )

    # ---- 5. run-bounds scaling with bin count
    for nb in (n_tiles * 4 + 2, n_tiles * 12 + 2, n_tiles * 16 + 2):
        keys_sorted = jnp.sort(
            jnp.asarray(rng.integers(0, nb, s_rows).astype(np.int32))
        )
        f_rb = jax.jit(
            lambda k, nb=nb: sorted_run_bounds(k, nb)
        )
        print(
            f"sorted_run_bounds bins={nb}: "
            f"{timeit(lambda: f_rb(keys_sorted))*1e3:.2f} ms",
            flush=True,
        )

    # ---- 6. sort control at the wider key space
    for nb in (n_tiles * 4 + 2, n_tiles * 12 + 2):
        kk = jnp.asarray(rng.integers(0, nb, s_rows).astype(np.int32))
        f_s = jax.jit(
            lambda k: jax.lax.sort_key_val(
                k, jnp.arange(s_rows, dtype=I32)
            )
        )
        print(
            f"sort_key_val {s_rows} rows (keyspace {nb}): "
            f"{timeit(lambda: f_s(kk))*1e3:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
