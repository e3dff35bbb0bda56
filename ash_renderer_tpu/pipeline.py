"""The jitted frame pipeline: scene buffers + camera matrices -> RGBA8 frame.

This is the TPU analogue of the reference's recorded draw command stream
(``src/renderer.rs:466-568``): one compiled function per (resolution,
settings) world, traced once and reused every frame; the only per-frame
host->device traffic is the camera/model matrices (the reference's 192-byte
UBO write, ``renderer.rs:431-439``).

Stages: vertex transform -> clip/snap/cull setup -> tile binning -> Pallas
visibility raster -> deferred shading -> supersample resolve + RGBA8 pack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RasterConfig, RendererSettings, derive_raster_config
from .ops import (
    binning,
    binsort,
    fused_kernel,
    geometry,
    raster_pallas,
    setup_kernel,
    shade,
    tritables,
)
from .rtypes import LightPack, MaterialsPack
from .scene import PackedScene, Scene

F32 = np.float32
I32 = np.int32


@dataclasses.dataclass(frozen=True)
class FrameStatics:
    """Static (hashable) configuration captured by the jit trace."""

    cfg: RasterConfig
    settings: RendererSettings
    has_materials: bool
    has_atlas: bool
    has_light: bool
    interpret: bool


def render_frame(
    statics: FrameStatics,
    positions,
    vert_obj,
    normals,
    colors,
    uvs,
    tri_v,
    tri_obj,
    obj_material,
    model_mats,
    mvp_mats,
    camera_pos,
    materials: Optional[MaterialsPack],
    atlas,
    light: Optional[LightPack],
    local_tri=None,
    tri_mat=None,
):
    """Pure function of device arrays -> (rgba8, aux dict).  Jitted by the
    Renderer with `statics` as a static argument."""
    cfg = statics.cfg
    st = statics.settings

    clip, attrs = geometry.transform_vertices(
        positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
    )
    su, attrs_full, gstats = geometry.geometry_device(
        clip, attrs, tri_v, tri_obj, obj_material, cfg, st.clip_budget,
        local_tri=local_tri, interpret=statics.interpret, tri_mat=tri_mat,
    )
    rec_i, rec_f, tile_start, tile_count, bstats = binning.bin_triangles(
        su, cfg, st.max_pairs
    )
    vis_d, vis_t = raster_pallas.rasterize_visibility(
        rec_i, rec_f, tile_start, tile_count, cfg, interpret=statics.interpret
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
    )
    rgba8 = shade.resolve_and_pack(jnp, rgba, st.supersample, st.srgb_output)
    aux = {
        "vis_d16": vis_d,
        "vis_tri": vis_t,
        **gstats,
        **bstats,
    }
    return rgba8, aux


render_frame_jit = jax.jit(render_frame, static_argnames=("statics",))


# ---------------------------------------------------------------------------
# Fused pipeline: sort-based binning + the fused Pallas kernel that gathers
# records, rasterizes, and distributes per-pixel shading fields on-chip —
# no XLA scalar-path gathers anywhere in the frame.  Bit-identical output
# to render_frame (same specmath chains, same shade_gathered math).
# ---------------------------------------------------------------------------


def shade_mode_for(statics, materials, atlas, light):
    """Static descriptor of the in-kernel phase F shading configuration:
    (M, T, has_materials, has_atlas, has_light), or None when the scene's
    material/texture tables are too large for the kernel's scalar select
    trees (M > 16 or T > 2) — the XLA shade_surface path then runs
    unchanged.  Derived identically by the raster and shade stages (pure
    function of statics + table shapes)."""
    knob = statics.settings.fused_surface_shade
    if knob == "off":
        return None
    has_m = statics.has_materials and materials is not None
    has_a = has_m and statics.has_atlas and atlas is not None
    has_l = statics.has_light and light is not None
    m_n = materials.base_color.shape[0] if has_m else 0
    t_n = atlas.level_offset.shape[0] if has_a else 0
    if (has_m and m_n > 16) or (has_a and t_n > 2):
        return None
    if knob == "auto" and has_a:
        # measured net negative on textured scenes (see config.py:
        # fused_surface_shade) — the XLA shade path runs instead
        return None
    return (m_n, t_n, has_m, has_a, has_l)


def _shade_from_planes(statics, planes, camera_pos, materials, atlas,
                       light, tile_row0=0):
    """Shade the distributed field planes TILE-FLAT: planes stay in the
    kernel's (n_tiles, 24, 1024) field-major layout (no lane padding, no
    400 MB field relayout); per-pixel screen coordinates are derived from
    the tile index, and only the final RGBA is relaid out to (H, W).
    The winner-id/validity plane is the kernel's VIS_ROW output row — the
    (H, W) vis_t never round-trips through a relayout.

    Live-row band gating (settings.shade_row_band, full-frame only): the
    QUAD-TAP GATHER — the index-count-bound dominant cost of this stage —
    is gated to the smallest static tile-row band tier (1/4, 1/2, dense)
    covering the rows with any coverage (from the kernel's winner plane);
    out-of-band quads are zero-filled.  Bit-identical: every out-of-band
    pixel is invalid by construction, so whatever texel its garbage tap
    would have fetched is masked before packing either way (band parity
    tests pin every branch).  Only the gather sits inside the lax.switch —
    a first cut banded the WHOLE shade chain and its 3 branch copies blew
    the per-shape device load 32.6 s -> 93 s warm-cache at the headline
    (the round-4 tier-ladder effect), for ~2 ms extra runtime win; the
    elementwise combine is HBM-cheap dense and stays shared.

    tile_row0: first tile row of this slab (traced under shard_map); when
    nonzero the caller guarantees the slab needs no row crop."""
    cfg = statics.cfg
    st = statics.settings
    th, tw = cfg.tile_h, fused_kernel.TILE_W
    gw = cfg.grid_w
    n_tiles = planes.shape[0]
    gh = n_tiles // gw
    hpad, wpad = gh * th, gw * tw
    n_pix = planes.shape[2]
    full_frame = isinstance(tile_row0, int) and tile_row0 == 0

    smode = shade_mode_for(
        statics,
        materials if statics.has_materials else None,
        atlas if statics.has_atlas else None,
        light,
    )

    # tile-row band tiers for the quad-tap gather (alignment-free —
    # dynamic_slice takes any offset): ceil(gh/4), ceil(gh/2); tiers that
    # don't split are dropped
    band_tiers = (
        sorted({-(-(gh * n) // d) for n, d in ((1, 4), (1, 2))} - {gh})
        if full_frame and st.shade_row_band and statics.has_atlas
        else []
    )
    quad_gather = None
    if band_tiers:
        valid_rows = (
            planes[:, fused_kernel.VIS_ROW, :] >= 0
        ).reshape(gh, gw * n_pix)
        row_live = jnp.any(valid_rows, axis=1)  # (gh,)
        lo = jnp.argmax(row_live).astype(I32)
        hi = I32(gh - 1) - jnp.argmax(row_live[::-1]).astype(I32)
        span = jnp.where(jnp.any(row_live), hi - lo + 1, I32(0))
        case = sum((span > q).astype(I32) for q in band_tiers)

        def quad_gather(tap):
            # tap: (n_tiles, n_pix) i32 -> (n_tiles, n_pix, 4) quads; the
            # switch branches hold ONLY slice + gather + update (small
            # programs — device load stays flat)
            def band(b):
                def go(_):
                    start = jnp.clip(lo, 0, gh - b)
                    sub = jax.lax.dynamic_slice(
                        tap, (start * gw, 0), (b * gw, n_pix)
                    )
                    q = shade._take(atlas.quads, sub, jnp)
                    return jax.lax.dynamic_update_slice(
                        jnp.zeros((n_tiles, n_pix, 4), q.dtype),
                        q,
                        (start * gw, 0, 0),
                    )

                return go

            def dense(_):
                return shade._take(atlas.quads, tap, jnp)

            return jax.lax.switch(
                case, [band(q) for q in band_tiers] + [dense], None
            )

    vis_tf = planes[:, fused_kernel.VIS_ROW, :]
    valid = vis_tf >= 0

    def f(i):
        return planes[:, i, :]

    if smode is not None:
        # phase F planes: the kernel already ran the surface math; only
        # the quad tap + lerp + combine remain
        fk = fused_kernel
        _, _, has_m, has_a, has_l = smode
        rgba = shade.combine_from_prelight(
            jnp,
            valid,
            [sm_bitcast(f(fk.F_P + ch)) for ch in range(4)],
            [sm_bitcast(f(fk.F_DIFF + i)) for i in range(3)],
            sm_bitcast(f(fk.F_SPEC)),
            f(fk.F_LIT),
            f(fk.F_TAP),
            sm_bitcast(f(fk.F_FU)),
            sm_bitcast(f(fk.F_FV)),
            f(fk.F_TEXMASK),
            atlas=atlas if has_a else None,
            light=light if has_l else None,
            has_materials=has_m,
            clear_color=st.clear_color,
            quad_gather=quad_gather if has_a else None,
        )
    else:
        # legacy planes: 12 interpolated attr channels, 4 raw uv screen
        # derivatives, material id — full shade_surface in XLA
        attr = [sm_bitcast(f(i)) for i in range(12)]
        duv = tuple(sm_bitcast(f(12 + k)) for k in range(4))
        mat_id = f(16)
        rgba = shade.shade_surface(
            jnp,
            valid,
            attr,
            mat_id,
            duv,
            materials=materials if statics.has_materials else None,
            atlas=atlas if statics.has_atlas else None,
            light=light if statics.has_light else None,
            camera_pos=camera_pos,
            clear_color=st.clear_color,
            quad_gather=quad_gather,
        )

    def to_image(x):
        img = (
            x.reshape(gh, gw, th, tw, 4).transpose(0, 2, 1, 3, 4)
            .reshape(hpad, wpad, 4)
        )
        rows = cfg.height if full_frame else hpad
        return img[:rows, : cfg.width]

    if st.supersample == 1:
        # pack first (4 u8/px), relayout the small image
        return to_image(shade.resolve_and_pack(jnp, rgba, 1, st.srgb_output))
    return shade.resolve_and_pack(
        jnp, to_image(rgba), st.supersample, st.srgb_output
    )


def sm_bitcast(x):
    import jax as _jax

    return _jax.lax.bitcast_convert_type(x, F32)


def render_frame_fused(
    statics: FrameStatics,
    positions,
    vert_obj,
    normals,
    colors,
    uvs,
    tri_v,
    tri_obj,
    obj_material,
    model_mats,
    mvp_mats,
    camera_pos,
    materials: Optional[MaterialsPack],
    atlas,
    light: Optional[LightPack],
    local_tri=None,
    tri_mat=None,
    ltT=None,
    matT=None,
):
    """Same signature and bit-identical results as render_frame, via the
    fused kernel (ops/fused_kernel.py).  With meshlet-local indices the
    whole triangle-setup stage runs in the Pallas setup kernel
    (ops/setup_kernel.py); without them, the XLA setup path feeds the same
    downstream kernel."""
    cfg = statics.cfg
    st = statics.settings

    if local_tri is None:
        # non-meshlet fallback: XLA triangle setup + comb assembly
        clip, attrs = geometry.transform_vertices(
            positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
        )
        su, attrs_full, gstats = geometry.geometry_device(
            clip, attrs, tri_v, tri_obj, obj_material, cfg, st.clip_budget,
            interpret=statics.interpret, tri_mat=tri_mat,
        )
        keys = binsort.stream_keys(
            su.valid, su.x0, su.y0, su.x1, su.y1, su.x2, su.y2, cfg
        )
        comb = tritables.build_comb_table(
            su, attrs_full, cfg, interpret=statics.interpret,
        )
    else:
        from .scene import MESHLET_TRIS

        tblT = setup_kernel.transform_vertices_T(
            positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
        )
        if tri_mat is None:
            tri_mat = obj_material[
                jnp.clip(tri_obj, 0, obj_material.shape[0] - 1)
            ]
        if ltT is None:  # static per scene; the Renderer precomputes these
            m_ = tri_v.shape[0] // MESHLET_TRIS
            ltT = (
                jnp.where((tri_v[:, 0] >= 0)[:, None], local_tri, I32(-1))
                .reshape(m_, MESHLET_TRIS, 3)
                .transpose(0, 2, 1)
                .reshape(m_, 3 * MESHLET_TRIS)
            )
        if matT is None:
            matT = tri_mat.reshape(-1, MESHLET_TRIS)
        ntail = st.clip_budget * geometry.MAX_CLIP_TRIS
        comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
            tblT, ltT, matT, cfg, interpret=statics.interpret,
            tail_rows=ntail,
        )
        comb, keys_tail, gstats = _clip_tail_into(
            statics, tblT, tri_v, tri_mat, flags, comb
        )
        keys = jnp.concatenate([keys_main, keys_tail])
    rmeta, tbl_sorted, tbl_ext, sstats = sort_expand_table(
        statics, comb, keys
    )
    vis_d, vis_t, planes = fused_kernel.rasterize_distribute(
        rmeta, tbl_sorted, tbl_ext, cfg, interpret=statics.interpret,
        range_loop=st.kernel_range_loop,
        shade_mode=shade_mode_for(
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
    rgba8 = _shade_from_planes(
        statics, planes, camera_pos, materials, atlas, light
    )
    aux = {"vis_d16": vis_d, "vis_tri": vis_t, **gstats, **sstats}
    return rgba8, aux


render_frame_fused_jit = jax.jit(
    render_frame_fused, static_argnames=("statics",)
)


# ---------------------------------------------------------------------------
# Staged fused pipeline: the same stages as render_frame_fused's meshlet
# path, each under its own jit.  Identical results (stage boundaries are
# materialized arrays either way); the single-graph fused jit at 1M-triangle
# shapes never finished XLA compilation on hardware (>10 min vs ~1 min for
# the stage jits together), so this is the Renderer's execution mode.
# ---------------------------------------------------------------------------

_fstage_transform = jax.jit(setup_kernel.transform_vertices_T)


def _clip_tail_into(statics, tblT, tri_v, tri_mat, flags, comb,
                    tile_row0=0, tile_rows=None):
    """Clip tail + stats; tail comb rows written IN PLACE into the
    reserved region after the main block (comb row T onward).  tile_row0/
    tile_rows window the tail streaming keys (multi-chip slabs)."""
    cfg = statics.cfg
    st = statics.settings
    needs_clip = ((flags >> 1) & 1).astype(bool)
    tail_f, (ta0, ta1, ta2), cstats = geometry.clip_tail_fused(
        tblT, tri_v, tri_mat, needs_clip, cfg, st.clip_budget
    )
    comb_tail = tritables.comb_rows(
        tail_f, ta0, ta1, ta2, cfg, id_base=tri_v.shape[0]
    )
    comb = jax.lax.dynamic_update_slice(
        comb, comb_tail, (tri_v.shape[0], 0)
    )
    keys_tail = binsort.stream_keys(
        tail_f["valid"], tail_f["x0"], tail_f["y0"], tail_f["x1"],
        tail_f["y1"], tail_f["x2"], tail_f["y2"], cfg,
        tile_row0, tile_rows,
    )
    n_valid = jnp.sum(flags & 1) + jnp.sum(tail_f["valid"].astype(I32))
    gstats = {
        "clip_overflow": cstats["clip_overflow"],
        "n_fast": jnp.sum((flags >> 2) & 1),
        "n_clipped": cstats["n_clipped"],
        "n_valid": n_valid,
        "n_setup": jnp.int32(comb.shape[0]),
    }
    return comb, keys_tail, gstats


# comb is donated so the tail dynamic_update_slice happens in place — a
# concat (or non-donated dus) copies the whole ~700 MB table at 1M tris
_fstage_tail = jax.jit(
    _clip_tail_into,
    static_argnames=("statics",),
    donate_argnames=("comb",),
)


def sort_expand_table(statics, comb, keys, tile_row0=0,
                      tile_rows: int | None = None):
    """Streaming-key sort + wide-pair expansion + sorted-table gathers: the
    shared back half of the fused pipeline's binning.

    Returns (rmeta, tbl_sorted, tbl_ext).  Wide rows (AABB spanning >2
    tiles either axis) are expanded into exact per-tile pair runs in the
    SEPARATE extension table tbl_ext (budget: settings.wide_rows /
    settings.wide_pairs; overflow stays in the global wide run, so budgets
    only affect speed) — measured +98 ms on the zoomed headline frame
    without the expansion (every tile streamed every wide triangle;
    experiments/flyby_stage_probe.py).  The ext gather runs under lax.cond
    only when a wide run exists, and the main gather stops at the smallest
    static prefix covering the live rows (tritables.sorted_table_budgeted)
    — static frames pay neither the pair budget nor the dead tail."""
    cfg = statics.cfg
    st = statics.settings
    n_tiles = (cfg.grid_h if tile_rows is None else tile_rows) * cfg.grid_w
    order, bounds = binsort.sort_and_bounds(
        keys, cfg, tile_rows, interpret=statics.interpret
    )
    pair_rows, pair_starts, new_ws = binsort.expand_wide_pairs(
        comb, order, bounds, cfg, st.wide_rows, st.wide_pairs,
        tile_row0, tile_rows,
    )
    rmeta = fused_kernel.build_range_meta(
        bounds, n_tiles, cfg.grid_w, tile_row0,
        pair_starts=pair_starts, pair_base=0,
        wide_start=new_ws,
    )
    live_end = bounds[n_tiles * binsort.KEYS_PER_TILE + 1]  # dead-run start
    tbl_sorted = tritables.sorted_table_budgeted(comb, order, 256, live_end)
    n_pairs = pair_starts[-1]
    # ext gather budgeted like the main table: typical frames have 0-31k
    # live pairs against the 131k budget, and the kernel streams only
    # positions < n_pairs, so fine tiers (1/32, 1/4) cut the every-frame
    # ~2 ms full-budget row gather to the live prefix (bit-identical; rows
    # past the cut are zero-filled and masked by the pair run bounds)
    tbl_ext = tritables.sorted_table_budgeted(
        comb, pair_rows, 256, n_pairs, fracs=(1 / 32, 1 / 4)
    )
    ws = bounds[n_tiles * binsort.KEYS_PER_TILE]
    sstats = {
        # wide-run population counters (cheap scalars already computed):
        # n_wide = wide rows this frame, wide_pairs_n = expanded pair slots,
        # wide_leftover = rows the budgets left in the global run (every
        # tile streams those — nonzero here on a slow frame is the smoking
        # gun the moving-camera bench logs per frame)
        "n_wide": live_end - ws,
        "wide_pairs_n": n_pairs,
        "wide_leftover": live_end - new_ws,
        # live sorted-table prefix (dead-run start) — tells which budget
        # tier the main gather took this frame (tritables 1/4, 1/2, full).
        # Tier count is deliberately small: an A/B on hardware measured
        # denser tiers (+3 switch branches) blowing the front program's
        # per-shape device load 29.9 s -> 133.5 s warm-cache at the
        # terrain config for ~0 runtime win (static pose carries zero
        # wide pairs; see DESIGN.md round-4 measured negatives)
        "live_rows": live_end,
    }
    return rmeta, tbl_sorted, tbl_ext, sstats


@functools.partial(jax.jit, static_argnames=("statics",))
def _fstage_sort(statics, comb, keys_main, keys_tail):
    keys = jnp.concatenate([keys_main, keys_tail])
    return sort_expand_table(statics, comb, keys)


@functools.partial(jax.jit, static_argnames=("statics",))
def _fstage_front(statics, positions, vert_obj, normals, colors, uvs,
                  model_mats, mvp_mats, tri_v, tri_mat, ltT, matT):
    """Stages 1-4 (vertex transform + setup kernel + clip tail + sort/
    expand/gathers) under ONE jit: fewer (program, shape) pairs cuts the
    per-program device-load term that dominates cold start on the remote
    TPU (DESIGN.md cold-start anatomy; 6 -> 3 programs with this on).
    The raster and shade stages stay separate — including the big fused
    kernel in the same graph is what made the monolithic compile
    intractable (>10 min at 1M shapes).  Enabled by
    RendererSettings.fused_front_merge."""
    cfg = statics.cfg
    st = statics.settings
    tblT = setup_kernel.transform_vertices_T(
        positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
    )
    comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
        tblT, ltT, matT, cfg, interpret=statics.interpret,
        tail_rows=st.clip_budget * geometry.MAX_CLIP_TRIS,
    )
    comb, keys_tail, gstats = _clip_tail_into(
        statics, tblT, tri_v, tri_mat, flags, comb
    )
    keys = jnp.concatenate([keys_main, keys_tail])
    rmeta, tbl_sorted, tbl_ext, sstats = sort_expand_table(
        statics, comb, keys
    )
    return rmeta, tbl_sorted, tbl_ext, {**gstats, **sstats}


@functools.partial(jax.jit, static_argnames=("statics",))
def _fstage_shade(statics, planes, camera_pos, materials, atlas, light):
    return _shade_from_planes(
        statics, planes, camera_pos, materials, atlas, light
    )


class FrontCache:
    """Frame-coherence memo for the fused front stage.

    The front (_fstage_front: vertex transform + setup kernel + clip tail +
    sort + budgeted table gathers) is a PURE function of (scene buffers,
    model matrices, mvp matrices) — camera_pos feeds only shading.  Under a
    static camera its inputs are byte-identical frame over frame, so
    reusing the previous frame's device outputs is bit-exact by
    construction (same deterministic programs, same inputs; the reference
    analogue is the per-image UBO write being the ONLY per-frame input,
    renderer.rs:431-439).  The Renderer owns one instance per
    settings/resize world (scene-buffer or settings changes rebuild that
    world and drop the cache); ``key`` is the raw bytes of the per-frame
    host inputs (the 192-byte UBO analogue), so any camera/model motion
    misses and recomputes.  A static pose skips ~1/3 of the headline
    frame (sort of 1.37M keys + table gathers + setup kernel re-run).
    Staleness canaries: bench.py's post-motion static re-gate and
    tests/test_renderer_facade.py's static-moving-static equality."""

    __slots__ = ("key", "value")

    def __init__(self):
        self.key = None
        self.value = None


def render_frame_fused_staged(
    statics: FrameStatics,
    positions, vert_obj, normals, colors, uvs,
    tri_v, tri_obj, obj_material,
    model_mats, mvp_mats, camera_pos,
    materials, atlas, light,
    local_tri=None,
    tri_mat=None,
    ltT=None,
    matT=None,
    front_cache: FrontCache | None = None,
    front_key: bytes | None = None,
):
    """Same signature/results as render_frame_fused (meshlet path), via
    per-stage jits.  Requires meshlet tables (ltT/matT/tri_mat precomputed —
    the Renderer path).  With settings.fused_front_merge the four XLA-front
    stages run as ONE program (_fstage_front) — identical results, fewer
    device programs (cold start).

    front_cache/front_key: optional FrontCache + the bytes of this frame's
    per-frame host inputs (model + mvp matrices).  On a key hit the cached
    front outputs are reused (bit-exact — see FrontCache); on a miss the
    front recomputes and the cache is refreshed.  Only the merged-front
    path caches (the unmerged path's _fstage_tail donates its comb)."""
    assert ltT is not None and matT is not None and tri_mat is not None
    cfg = statics.cfg
    st = statics.settings
    if st.fused_front_merge:
        use_cache = front_cache is not None and front_key is not None
        if use_cache and front_cache.key == front_key:
            rmeta, tbl_sorted, tbl_ext, stats = front_cache.value
        else:
            if use_cache:
                # drop the stale entry BEFORE recomputing so its ~0.7 GB
                # sorted table frees as soon as the previous frame's
                # consumers finish (avoids a transient 2x table footprint)
                front_cache.key = front_cache.value = None
            rmeta, tbl_sorted, tbl_ext, stats = _fstage_front(
                statics, positions, vert_obj, normals, colors, uvs,
                model_mats, mvp_mats, tri_v, tri_mat, ltT, matT,
            )
            if use_cache:
                front_cache.key = front_key
                front_cache.value = (rmeta, tbl_sorted, tbl_ext, stats)
    else:
        tblT = _fstage_transform(
            positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
        )
        comb, keys_main, flags, _, _ = setup_kernel.triangle_setup(
            tblT, ltT, matT, cfg, interpret=statics.interpret,
            tail_rows=st.clip_budget * geometry.MAX_CLIP_TRIS,
        )
        comb, keys_tail, gstats = _fstage_tail(
            statics, tblT, tri_v, tri_mat, flags, comb
        )
        rmeta, tbl_sorted, tbl_ext, sstats = _fstage_sort(
            statics, comb, keys_main, keys_tail
        )
        stats = {**gstats, **sstats}
    vis_d, vis_t, planes = fused_kernel.rasterize_distribute(
        rmeta, tbl_sorted, tbl_ext, cfg, interpret=statics.interpret,
        range_loop=st.kernel_range_loop,
        shade_mode=shade_mode_for(
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
    rgba8 = _fstage_shade(
        statics, planes, camera_pos, materials, atlas, light
    )
    aux = {"vis_d16": vis_d, "vis_tri": vis_t, **stats}
    return rgba8, aux


# ---------------------------------------------------------------------------
# Staged execution: four separately-jitted stages.  Identical results (every
# stage boundary is a materialized array anyway); compiles ~10x faster than
# the fused graph at 1M-triangle shapes, at a few percent steady-state cost —
# the development-iteration mode (RendererSettings.staged_pipeline).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("cfg", "clip_budget", "interpret")
)
def _stage_geometry(cfg, clip_budget, positions, vert_obj, normals, colors,
                    uvs, tri_v, tri_obj, obj_material, model_mats, mvp_mats,
                    local_tri=None, interpret=False, tri_mat=None):
    clip, attrs = geometry.transform_vertices(
        positions, vert_obj, normals, colors, uvs, model_mats, mvp_mats
    )
    return geometry.geometry_device(
        clip, attrs, tri_v, tri_obj, obj_material, cfg, clip_budget,
        local_tri=local_tri, interpret=interpret, tri_mat=tri_mat,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "max_pairs"))
def _stage_binning(cfg, max_pairs, su):
    return binning.bin_triangles(su, cfg, max_pairs)


@functools.partial(jax.jit, static_argnames=("statics",))
def _stage_shade(statics, vis_t, su, attrs_full, camera_pos, materials, atlas,
                 light):
    st = statics.settings
    rgba = shade.shade(
        jnp,
        vis_t,
        su,
        attrs_full,
        materials=materials if statics.has_materials else None,
        atlas=atlas if statics.has_atlas else None,
        light=light if statics.has_light else None,
        camera_pos=camera_pos,
        cfg=statics.cfg,
        clear_color=st.clear_color,
    )
    return shade.resolve_and_pack(jnp, rgba, st.supersample, st.srgb_output)


def render_frame_staged(
    statics: FrameStatics,
    positions, vert_obj, normals, colors, uvs,
    tri_v, tri_obj, obj_material,
    model_mats, mvp_mats, camera_pos,
    materials, atlas, light,
    local_tri=None,
    tri_mat=None,
):
    """Same signature/results as render_frame, via per-stage jits."""
    cfg = statics.cfg
    st = statics.settings
    su, attrs_full, gstats = _stage_geometry(
        cfg, st.clip_budget, positions, vert_obj, normals, colors, uvs,
        tri_v, tri_obj, obj_material, model_mats, mvp_mats,
        local_tri=local_tri, interpret=statics.interpret, tri_mat=tri_mat,
    )
    rec_i, rec_f, tile_start, tile_count, bstats = _stage_binning(
        cfg, st.max_pairs, su
    )
    vis_d, vis_t = raster_pallas.rasterize_visibility(
        rec_i, rec_f, tile_start, tile_count, cfg, interpret=statics.interpret
    )
    rgba8 = _stage_shade(
        statics, vis_t, su, attrs_full, camera_pos, materials, atlas, light
    )
    aux = {"vis_d16": vis_d, "vis_tri": vis_t, **gstats, **bstats}
    return rgba8, aux
