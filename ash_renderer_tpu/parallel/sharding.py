"""Multi-chip rendering: shard the framebuffer tile grid across a device mesh.

The reference is strictly single-GPU (SURVEY §2's parallelism inventory: no
DP/TP/PP/SP, no communication backend); scale-out here is new TPU-first
design.  The natural decomposition for a rasterizer is data parallelism over
pixels: each chip owns a horizontal slab of framebuffer tile rows.

  * Geometry (vertex transform + clip + setup) is replicated — it is a small
    fraction of frame cost and replicating it avoids an all_gather of the
    setup buffers that every slab needs anyway.
  * Binning runs per-device against its own tile-row window (the window
    parameter of ops/binning.bin_triangles), so each chip sorts and streams
    only the triangles that touch its slab.
  * The Pallas visibility kernel and deferred shading run on slab-local
    buffers; no cross-device communication exists at all until the final
    frame assembly, which is a pure all_gather of RGBA8 rows over ICI — the
    cheapest possible collective pattern (compositing needs no depth merge
    because slabs partition the screen).

Implemented with shard_map over a 1-D Mesh("rows"); jit of the wrapper
inserts the all_gather.  Works identically on N real chips or the CPU
xla_force_host_platform_device_count mesh used in tests and the driver's
dry run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RasterConfig, RendererSettings
from ..ops import binning, geometry, shade

F32 = np.float32


def make_render_mesh(devices=None) -> Mesh:
    devices = devices or jax.devices()
    return Mesh(np.array(devices), axis_names=("rows",))


def _slab_pipeline(
    statics,
    rows_per: int,
    positions, vert_obj, normals, colors, uvs,
    tri_v, tri_obj, obj_material,
    model_mats, mvp_mats, camera_pos,
    materials, atlas, light, local_tri,
):
    """Per-device body (runs under shard_map): renders this device's slab.

    rows_per: tile rows per slab = ceil(grid_h / n_dev) — when grid_h is
    not divisible the last slab(s) extend past the screen; their windowed
    binning keys are all dead (py_lo > py_hi) so they render background,
    and the wrapper crops the assembled frame back to the display height."""
    cfg = statics.cfg
    st = statics.settings
    dev = jax.lax.axis_index("rows")
    tile_row0 = dev * rows_per

    clip, attrs = geometry.transform_vertices(
        positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
    )
    su, attrs_full, _ = geometry.geometry_device(
        clip, attrs, tri_v, tri_obj, obj_material, cfg, st.clip_budget,
        local_tri=local_tri, interpret=statics.interpret,
    )
    # Windowed binning: static window size (rows_per), traced row origin.
    # Each slab gets the FULL pair budget: a slab's pairs are a subset of the
    # full frame's, so any scene that fits the single-device budget fits every
    # slab's — dividing by n_dev could overflow a slab that concentrates the
    # geometry while the single-device path does not, silently breaking the
    # sharded == single-device bitwise contract.
    rec_i, rec_f, tile_start, tile_count, bstats = binning.bin_triangles(
        su, cfg, st.max_pairs, tile_row0, rows_per
    )
    from ..ops import raster_pallas

    vis_d, vis_t = raster_pallas.rasterize_visibility(
        rec_i, rec_f, tile_start, tile_count, cfg,
        interpret=statics.interpret, tile_rows=rows_per,
    )
    rgba = shade.shade(
        jnp,
        vis_t,
        su,
        attrs_full,
        materials=materials if statics.has_materials else None,
        atlas=atlas if statics.has_atlas else None,
        light=light if statics.has_light else None,
        camera_pos=camera_pos,
        cfg=cfg,
        clear_color=st.clear_color,
        py_offset=tile_row0 * cfg.tile_h,
    )
    rgba8 = shade.resolve_and_pack(jnp, rgba, st.supersample, st.srgb_output)
    # surface per-slab budget overflows (worst across slabs via the replicated
    # max below) instead of discarding them — a slab overflow means dropped
    # triangles and must be visible to debugging.validate_frame
    overflow = jax.lax.pmax(bstats["pairs_overflow"], "rows")
    return rgba8, overflow


def _slab_pipeline_fused(
    statics,
    rows_per: int,
    positions, vert_obj, normals, colors, uvs,
    tri_v, tri_obj, obj_material,
    model_mats, mvp_mats, camera_pos,
    materials, atlas, light, tri_mat, ltT, matT,
):
    """Per-device body for the FUSED pipeline: geometry + setup kernel are
    replicated; each device derives window-local streaming keys from the
    setup kernel's packed pixel-AABB extents, sorts its own slab's order,
    and runs the raster/distribute kernel + tile-flat shading on its tile
    rows.  No communication until the row-sharded frame assembly.
    rows_per = ceil(grid_h / n_dev); see _slab_pipeline on padding."""
    from .. import pipeline as plmod
    from ..ops import binsort, fused_kernel, setup_kernel, tritables
    from ..ops.geometry import MAX_CLIP_TRIS

    cfg = statics.cfg
    st = statics.settings
    dev = jax.lax.axis_index("rows")
    tile_row0 = dev * rows_per

    tblT = setup_kernel.transform_vertices_T(
        positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
    )
    comb, _, flags, extx, exty = setup_kernel.triangle_setup(
        tblT, ltT, matT, cfg, interpret=statics.interpret,
        tail_rows=st.clip_budget * MAX_CLIP_TRIS,
    )
    comb, keys_tail, gstats = plmod._clip_tail_into(
        statics, tblT, tri_v, tri_mat, flags, comb, tile_row0, rows_per
    )
    keys_main = binsort.stream_keys_from_aabb(
        (flags & 1).astype(bool), extx, exty, cfg, tile_row0, rows_per
    )
    keys = jnp.concatenate([keys_main, keys_tail])
    # sort + wide-pair expansion + sorted-table gathers, window-local
    rmeta, tbl_sorted, tbl_ext, sstats = plmod.sort_expand_table(
        statics, comb, keys, tile_row0, rows_per
    )
    vis_d, vis_t, planes = fused_kernel.rasterize_distribute(
        rmeta, tbl_sorted, tbl_ext, cfg, interpret=statics.interpret,
        tile_rows=rows_per, range_loop=st.kernel_range_loop,
        shade_mode=plmod.shade_mode_for(
            statics,
            materials if statics.has_materials else None,
            atlas if statics.has_atlas else None,
            light,
        ),
        materials=materials if statics.has_materials else None,
        atlas=atlas if statics.has_atlas else None,
        light=light if statics.has_light else None,
        camera_pos=camera_pos,
    )
    rgba8 = plmod._shade_from_planes(
        statics, planes, camera_pos,
        materials if statics.has_materials else None,
        atlas if statics.has_atlas else None,
        light if statics.has_light else None,
        tile_row0=tile_row0,
    )
    overflow = jax.lax.pmax(gstats["clip_overflow"], "rows")
    # stream-population counters (worst slab): proof that the wide-pair
    # ext table / budget tiers / live clip tail actually ran under
    # sharding — the dryrun and density tests assert on these (the code
    # paths most likely to break the bitwise contract under window-local
    # keys are exactly the ones a sparse scene never exercises)
    counters = {
        k: jax.lax.pmax(sstats[k], "rows")
        for k in ("n_wide", "wide_pairs_n", "wide_leftover", "live_rows")
    }
    counters["n_clipped"] = jax.lax.pmax(gstats["n_clipped"], "rows")
    return rgba8, overflow, counters


def render_frame_sharded_fused(
    statics,
    mesh: Mesh,
    positions, vert_obj, normals, colors, uvs,
    tri_v, tri_obj, obj_material,
    model_mats, mvp_mats, camera_pos,
    materials=None, atlas=None, light=None,
    tri_mat=None, ltT=None, matT=None,
):
    """Multi-chip render via the fused (flagship) pipeline: framebuffer
    tile rows data-parallel over mesh axis "rows", ICI all_gather of RGBA8
    rows as the only collective.  Same constraints as
    render_frame_sharded; requires meshlet tables (Renderer fused path).
    Returns (rgba8, stats) with stats["clip_overflow"] = worst per-slab
    clip-budget overflow."""
    n_dev = mesh.devices.size
    cfg = statics.cfg
    # indivisible grid_h (e.g. 1920x1080 -> grid_h 135 on 8 devices): pad
    # the tile-row decomposition up — past-the-screen slab rows bin nothing
    # and render background; the assembled frame is cropped below
    rows_per = -(-cfg.grid_h // n_dev)
    slab_disp_rows = rows_per * cfg.tile_h
    if slab_disp_rows % statics.settings.supersample:
        raise ValueError("slab rows not divisible by supersample factor")
    assert ltT is not None and matT is not None and tri_mat is not None

    body = functools.partial(_slab_pipeline_fused, statics, rows_per)
    spec_repl = P()
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple([spec_repl] * 17),
        out_specs=(P("rows", None, None), spec_repl, spec_repl),
        check_vma=False,
    )
    rgba8, overflow, counters = fn(
        positions, vert_obj, normals, colors, uvs,
        tri_v, tri_obj, obj_material,
        model_mats, mvp_mats, camera_pos,
        materials, atlas, light, tri_mat, ltT, matT,
    )
    # crop padded past-the-screen slab rows (background by construction)
    rgba8 = rgba8[: statics.settings.height]
    return rgba8, {"clip_overflow": overflow, **counters}


def render_frame_sharded(
    statics,
    mesh: Mesh,
    positions, vert_obj, normals, colors, uvs,
    tri_v, tri_obj, obj_material,
    model_mats, mvp_mats, camera_pos,
    materials=None, atlas=None, light=None, local_tri=None,
):
    """Full-frame multi-chip render.  The framebuffer comes back sharded over
    mesh axis "rows" (display-resolution rows); jax assembles on readback.
    Returns (rgba8, stats) with stats["pairs_overflow"] = the worst per-slab
    pair-budget overflow (0 means no triangles were dropped anywhere).

    Indivisible grid_h is padded up (past-the-screen slab rows render
    background and are cropped from the assembled frame), so ANY
    resolution works on any device count.
    """
    n_dev = mesh.devices.size
    cfg = statics.cfg
    rows_per = -(-cfg.grid_h // n_dev)
    slab_disp_rows = rows_per * cfg.tile_h
    if slab_disp_rows % statics.settings.supersample:
        raise ValueError("slab rows not divisible by supersample factor")

    body = functools.partial(_slab_pipeline, statics, rows_per)
    spec_repl = P()
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple([spec_repl] * 15),
        out_specs=(P("rows", None, None), spec_repl),
        check_vma=False,
    )
    rgba8, overflow = fn(
        positions, vert_obj, normals, colors, uvs,
        tri_v, tri_obj, obj_material,
        model_mats, mvp_mats, camera_pos,
        materials, atlas, light, local_tri,
    )
    rgba8 = rgba8[: statics.settings.height]
    return rgba8, {"pairs_overflow": overflow}
