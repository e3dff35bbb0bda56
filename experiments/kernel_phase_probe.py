"""Split the fused raster kernel's cost: phase V only vs D only vs both,
plus segment statistics, at the config4 workload."""
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
    # ONE leaf only: every host readback is a full round trip through the
    # remote tunnel (~4-30 ms, experiments/process_state_probe.py) — a
    # per-leaf force contaminates timings by n_leaves x that
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(fn, *args, reps=8):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / reps, out


def main():
    from ash_renderer_tpu.benchmarks import config4_million_tri
    from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
    from ash_renderer_tpu.ops import binsort, fused_kernel, setup_kernel, \
        tritables, geometry
    from ash_renderer_tpu.renderer import Renderer

    scene, settings, cams = config4_million_tri()
    settings = dataclasses.replace(settings, pipeline="fused")
    cam = cams[0]
    r = Renderer(scene, settings)
    cfg = r.cfg
    st = r.statics.settings
    b = r._buffers
    view = cam.view_matrix()
    proj = cam.projection_matrix(st.render_width / st.render_height)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)

    from ash_renderer_tpu import pipeline as plmod

    tblT = plmod._fstage_transform(
        b["positions"], b["vert_obj"], b["normals"], b["colors"], b["uvs"],
        jnp.asarray(mm), jnp.asarray(mvp),
    )
    comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
        tblT, b["ltT"], b["matT"], cfg,
        tail_rows=st.clip_budget * 7,
    )
    comb, keys_tail, _ = plmod._fstage_tail(
        r.statics, tblT, b["tri_v"], b["tri_mat"], flags, comb
    )
    rmeta, tbl, tbl_ext, _ss = plmod._fstage_sort(r.statics, comb, keys_main, keys_tail)
    force((rmeta, tbl))

    # segment stats (per range class: 0-4 coarse/wide, 5 ext-pairs, 6 fine)
    nr = fused_kernel.N_RANGES
    rm = np.asarray(rmeta)[: cfg.n_tiles * nr * 2].reshape(-1, nr, 2)
    lens = rm[..., 1] - rm[..., 0]
    segsf = np.where(
        lens > 0, ((rm[..., 1] - (rm[..., 0] // 8) * 8) + 127) // 128, 0
    )
    for label, idx in (
        ("own", [0]), ("nbr", [1, 2, 3]), ("wide", [4]), ("pairs", [5]),
        ("fine", [6]),
    ):
        l = lens[:, idx]
        print(
            f"  {label:5s}: slots {int(l.sum()):8d}  nonempty "
            f"{int((l > 0).sum()):6d}  segments {int(segsf[:, idx].sum()):6d}",
            flush=True,
        )
    print(f"ranges total: slots {int(lens.sum())}, segments/phase "
          f"{int(segsf.sum())}", flush=True)

    rm_zero = jnp.zeros_like(rmeta)
    tbl_zero = jnp.zeros_like(tbl)
    ext_zero = jnp.zeros_like(tbl_ext)
    fnz = jax.jit(
        lambda rm_, tb_: fused_kernel.rasterize_distribute(
            rm_, tb_, ext_zero, cfg, phases="z"
        )
    )
    for rlab, rm_ in (("real", rmeta), ("zero", rm_zero)):
        for tlab, tb_ in (("real", tbl), ("zero", tbl_zero)):
            dt, _ = timeit(fnz, rm_, tb_)
            print(f"z rmeta={rlab} tbl={tlab}: {dt*1000:.1f} ms",
                  flush=True)
    for ph in ("", "v", "vde"):
        fn = jax.jit(
            lambda rm_, tb_, ph=ph: fused_kernel.rasterize_distribute(
                rm_, tb_, tbl_ext, cfg, phases=ph
            )
        )
        dt, _ = timeit(fn, rmeta, tbl)
        print(f"phases={ph}: {dt*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
