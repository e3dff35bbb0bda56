"""Stage-level attribution of config5's round-5 regression (73.8 ms/frame
vs ~40 in round 4): time the cached front, the raster kernel, and the
shade stage separately at the exact bench state (pose 0, 1600x1200, ss=2,
T=2 atlas)."""
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
    from ash_renderer_tpu.benchmarks import config5_flythrough
    from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
    from ash_renderer_tpu.ops import fused_kernel
    from ash_renderer_tpu.renderer import Renderer
    from ash_renderer_tpu import pipeline as plmod

    scene, settings, cams = config5_flythrough()
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
    print(f"cfg: {cfg.width}x{cfg.height} grid {cfg.grid_w}x{cfg.grid_h}",
          flush=True)

    dt_front, front = timeit(
        lambda: plmod._fstage_front(
            r.statics, b["positions"], b["vert_obj"], b["normals"],
            b["colors"], b["uvs"], jnp.asarray(mm), jnp.asarray(mvp),
            b["tri_v"], b["tri_mat"], b["ltT"], b["matT"],
        )
    )
    rmeta, tbl, tbl_ext, sstats = front
    print(f"front: {dt_front*1e3:.1f} ms  "
          f"(live={int(np.asarray(sstats['live_rows']))} "
          f"wide={int(np.asarray(sstats['n_wide']))} "
          f"pairs={int(np.asarray(sstats['wide_pairs_n']))})", flush=True)

    smode = plmod.shade_mode_for(
        r.statics, r.materials, r.atlas, r.light
    )
    cam0 = jnp.asarray(cam.position.astype(np.float32))
    fn_rast = lambda: fused_kernel.rasterize_distribute(
        rmeta, tbl, tbl_ext, cfg, shade_mode=smode,
        materials=r.materials, atlas=r.atlas, light=r.light,
        camera_pos=cam0,
    )
    dt_rast, rast = timeit(fn_rast)
    _, _, planes = rast
    print(f"raster kernel: {dt_rast*1e3:.1f} ms", flush=True)

    dt_shade, _ = timeit(
        lambda: plmod._fstage_shade(
            r.statics, planes, cam0, r.materials, r.atlas, r.light
        )
    )
    print(f"shade: {dt_shade*1e3:.1f} ms", flush=True)

    # shade with the band disabled (separate statics -> fresh small jit)
    st2 = dataclasses.replace(r.statics.settings, shade_row_band=False)
    statics2 = dataclasses.replace(r.statics, settings=st2)
    dt_shade2, _ = timeit(
        lambda: plmod._fstage_shade(
            statics2, planes, cam0, r.materials, r.atlas, r.light
        )
    )
    print(f"shade (band off): {dt_shade2*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
