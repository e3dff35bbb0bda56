"""Profile the fused pipeline's stages on TPU at the config4 workload, and
report segment statistics that drive the kernel's streaming costs."""
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
    packed = scene.pack(meshlets=True)
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

    local_tri = (
        jnp.asarray(packed.local_tri) if packed.local_tri is not None else None
    )

    @jax.jit
    def stage_geom(pos, vo, nr, co, uv, tv, to, om, m, v):
        clip, attrs = geometry.transform_vertices(pos, vo, nr, co, uv, m, v)
        return geometry.geometry_device(
            clip, attrs, tv, to, om, cfg, settings.clip_budget,
            local_tri=local_tri,
        )

    dt, (su, attrs_full, gstats) = timeit(stage_geom, *dev_args)
    print(f"geometry (meshlet corner gathers): {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def stage_binsort(su):
        return binsort.bin_sort(su, cfg)

    dt, (order, bounds) = timeit(stage_binsort, su)
    print(f"binsort: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def stage_meta(bounds):
        return fused_kernel.build_range_meta(bounds, cfg.n_tiles, cfg.grid_w)

    dt, rmeta = timeit(stage_meta, bounds)
    print(f"range meta: {dt*1000:.1f} ms", flush=True)

    @jax.jit
    def stage_build(su, attrs_full):
        return tritables.build_comb_table(su, attrs_full, cfg,
                                          local_tri=local_tri)

    dt, comb = timeit(stage_build, su, attrs_full)
    print(f"comb table build (incl. attr gathers): {dt*1000:.1f} ms",
          flush=True)

    @jax.jit
    def stage_sort_table(comb, order):
        return tritables.sorted_table(comb, order, 256)

    dt, tbl_sorted = timeit(stage_sort_table, comb, order)
    print(f"sorted-table gather: {dt*1000:.1f} ms", flush=True)

    dt, (vis_d, vis_t, planes) = timeit(
        lambda: fused_kernel.rasterize_distribute(
            rmeta, tbl_sorted, jnp.zeros((512, 128), jnp.int32), cfg
        ),
        reps=3,
    )
    print(f"FUSED KERNEL: {dt*1000:.1f} ms", flush=True)

    # ---- final shade from distributed planes (the XLA tail)
    from ash_renderer_tpu.pipeline import (
        FrameStatics, _planes_to_fields, _shade_from_planes,
    )
    from ash_renderer_tpu.rtypes import LightPack, MaterialsPack

    F32 = np.float32
    mats = MaterialsPack(
        base_color=jnp.asarray(
            np.array([m.base_color for m in scene.materials], F32)
        ),
        tex_id=jnp.asarray(
            np.array([m.texture_id for m in scene.materials], np.int32)
        ),
        specular=jnp.asarray(
            np.array([m.specular for m in scene.materials], F32)
        ),
        shininess=jnp.asarray(
            np.array([m.shininess for m in scene.materials], np.int32)
        ),
    )
    atlas = (
        jax.tree.map(jnp.asarray, scene.atlas)
        if scene.atlas is not None else None
    )
    light = None
    if scene.light is not None:
        light = LightPack(
            direction=jnp.asarray(np.asarray(scene.light.direction, F32)),
            color=jnp.asarray(np.asarray(scene.light.color, F32)),
            ambient=jnp.asarray(np.asarray(scene.light.ambient, F32)),
        )
    statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=True,
        has_atlas=atlas is not None, has_light=light is not None,
        interpret=False,
    )
    cam_pos = jnp.asarray(cam.position.astype(np.float32))

    @jax.jit
    def stage_shade(planes, vis_t, cam_pos, mats, atlas, light):
        fields = _planes_to_fields(planes, cfg, cfg.grid_h)[
            :, : cfg.height, : cfg.width
        ]
        return _shade_from_planes(
            statics, fields, vis_t, cam_pos, mats, atlas, light
        )

    dt, rgba8 = timeit(stage_shade, planes, vis_t, cam_pos, mats, atlas,
                       light)
    print(f"shade-from-planes: {dt*1000:.1f} ms", flush=True)

    # ---- segment statistics on host (kernel work model)
    boundsh = np.asarray(bounds)
    n_tiles = cfg.n_tiles
    rmetah = np.asarray(rmeta).reshape(n_tiles, 5, 2)
    segs = 0
    slots = 0
    for tile in range(n_tiles):
        for rs, re in rmetah[tile]:
            if re <= rs:
                continue
            ab0 = (rs // 128) * 128
            segs += -(-(re - ab0) // 128)
            slots += re - rs
    print(f"segments/phase: {segs}, streamed slots: {slots}", flush=True)
    wide_n = int(boundsh[n_tiles * 4 + 1] - boundsh[n_tiles * 4])
    print(f"wide run: {wide_n} triangles", flush=True)


if __name__ == "__main__":
    main()
