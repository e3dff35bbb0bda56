"""Split the fused shade stage's cost at the config4 workload: full vs
no-texture vs no-light vs unpack-only, plus the final relayout."""
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
    from ash_renderer_tpu.ops import fused_kernel, setup_kernel
    from ash_renderer_tpu.renderer import Renderer
    from ash_renderer_tpu import pipeline as plmod

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

    tblT = plmod._fstage_transform(
        b["positions"], b["vert_obj"], b["normals"], b["colors"], b["uvs"],
        jnp.asarray(mm), jnp.asarray(mvp),
    )
    comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
        tblT, b["ltT"], b["matT"], cfg, tail_rows=st.clip_budget * 7,
    )
    comb, keys_tail, _ = plmod._fstage_tail(
        r.statics, tblT, b["tri_v"], b["tri_mat"], flags, comb
    )
    rmeta, tbl, tbl_ext, _ss = plmod._fstage_sort(
        r.statics, comb, keys_main, keys_tail
    )
    vis_d, vis_t, planes = fused_kernel.rasterize_distribute(rmeta, tbl, tbl_ext, cfg)
    force((vis_t, planes))
    campos = jnp.asarray(cam.position.astype(np.float32))

    variants = [
        ("full (tex+light)", r.statics),
        ("no atlas", dataclasses.replace(r.statics, has_atlas=False)),
        ("no light", dataclasses.replace(r.statics, has_light=False)),
        ("vertex color only", dataclasses.replace(
            r.statics, has_atlas=False, has_light=False,
            has_materials=False)),
    ]
    for name, statics in variants:
        fn = jax.jit(
            lambda p, s=statics: plmod._fstage_shade(
                s, p, campos, r.materials, r.atlas, r.light
            )
        )
        dt, _ = timeit(fn, planes)
        print(f"shade [{name}]: {dt*1000:.1f} ms", flush=True)

    # raw cost of ONE 2M-row quad gather from the atlas (the irreducible
    # tap): random in-range indices, same shape as the tile-flat planes
    n_px = planes.shape[0] * planes.shape[2]
    rng = np.random.default_rng(0)
    tap = jnp.asarray(
        rng.integers(0, r.atlas.quads.shape[0], size=n_px, dtype=np.int32)
    )
    gfn = jax.jit(lambda t: r.atlas.quads[t])
    dt, _ = timeit(gfn, tap)
    print(f"raw quad gather ({n_px/1e6:.2f}M rows): {dt*1000:.1f} ms",
          flush=True)
    # and the pack/relayout floor: valid-select + stack + pack on the planes
    zero = dataclasses.replace(
        r.statics, has_atlas=False, has_light=False, has_materials=False)
    print("(see 'vertex color only' for the relayout+pack floor)",
          flush=True)


if __name__ == "__main__":
    main()
