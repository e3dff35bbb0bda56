"""Fused triangle-setup Pallas kernel: clip coords -> comb-table rows.

Replaces, for the fused pipeline, the XLA chain [per-vertex snap/outcode ->
meshlet corner gathers -> _finish_tri -> build_comb_table -> bin_sort key
computation] whose minor-dim stacks/selects dominated the frame (measured
~90 ms of fusions at 1.31M tris on v5e; see experiments/trace_frame.py).
TPU-first rationale: every per-triangle quantity lives in LANE vectors
(triangles of one meshlet across the 128 lanes), per-vertex data arrives as
a transposed (16, V) table so corner assembly is an exact one-hot int8 MXU
matmul, and the final (tris, fields) table layout is produced by four
byte-plane transpose matmuls — no XLA gathers, stacks, or lane-interleaving
selects anywhere.

Semantics provided (bit-identical to the XLA path, which remains the
CPU/classic reference): vertex snap + frustum outcodes
(ops/geometry._snap_corner/_vertex_post), orientation cull + winding
normalization (ops/geometry._finish_tri; reference contract
``graphics_pipeline_components.rs:69-108``), comb-table row layout
(ops/tritables.build_comb_table), and bin_sort streaming keys
(ops/binsort.stream_keys).

Per meshlet (grid step m):

* DMA the meshlet's (16, 128) transposed vertex table
  [clip x,y,z,w | 12 attrs] (bitcast i32);
* one-hot gather all 3 corners of its 128 triangles: 4 byte-plane int8
  matmuls (16, 128) x (128, 384) -> exact i32 field rows per corner;
* snap / outcode / shoelace / winding / area / keys on (1, 128) lane
  vectors with the shared specmath formulas;
* assemble the 47 live comb columns as rows of a (128, 128) scratch and
  transpose via 4 byte-plane identity matmuls (exact) into the final
  (128 tris, 128 cols) block.

Outputs: comb rows (T, 128) i32, bin_sort keys (T,), flags (T,)
(bit0 = valid, bit1 = needs_clip) for the XLA clip path and stats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import specmath as sm
from ..config import RasterConfig
from ..scene import MESHLET_TRIS, MESHLET_VERTS
from .binsort import (
    FINE_W,
    GRP_D,
    GRP_DR,
    GRP_NONE,
    GRP_R,
    KEYS_PER_TILE,
    N_FINE,
    N_GRP,
)
from .tritables import ID_COL, TBL_COLS

F32 = np.float32
I32 = np.int32
I8 = np.int8

N_TBL_ROWS = 16  # clip x,y,z,w + 12 attrs


def prep_static(local_tri: np.ndarray, tri_mat: np.ndarray,
                tri_valid: np.ndarray):
    """Host-side static prep (once per scene): transposed meshlet-local
    corner indices (M, 384) with -1 on padding rows (tri_valid false:
    matches no one-hot row -> all-zero gather -> degenerate, culled, and
    flags the row dead for the clip path), and per-meshlet material ids
    (M, 128)."""
    t = local_tri.shape[0]
    m = t // MESHLET_TRIS
    lt = np.where(tri_valid[:, None], local_tri, -1).reshape(
        m, MESHLET_TRIS, 3
    )
    ltT = np.ascontiguousarray(lt.transpose(0, 2, 1)).reshape(m, 3 * MESHLET_TRIS)
    matT = np.ascontiguousarray(np.asarray(tri_mat).reshape(m, MESHLET_TRIS))
    return ltT.astype(np.int32), matT.astype(np.int32)


def transform_vertices_T(positions, vert_obj, normals, colors, uvs,
                         model_mats, mvp_mats):
    """Vertex stage for the setup kernel: (16, V) i32 transposed table
    [clip4 | color4 | world normal3 | uv2 | world pos3] (f32 bits).

    Same specmath math as ops/geometry.transform_vertices; axis-0 stacking
    only (sublane-dim concat — measured free vs the (V, k) lane-interleaving
    stacks, which cost ~12 ms at 1.34M verts)."""
    if model_mats.shape[0] == 1:
        models = model_mats[0]
        mvps = mvp_mats[0]
    else:
        models = model_mats[vert_obj]
        mvps = mvp_mats[vert_obj]
    px, py, pz = positions[:, 0], positions[:, 1], positions[:, 2]
    wx, wy, wz, _ = sm.apply_mat4_point(models, px, py, pz)
    cx, cy, cz, cw = sm.apply_mat4_point(mvps, px, py, pz)
    nx, ny, nz = sm.apply_mat3_vec(
        models, normals[:, 0], normals[:, 1], normals[:, 2]
    )
    rows = [
        cx, cy, cz, cw,
        colors[:, 0], colors[:, 1], colors[:, 2], colors[:, 3],
        nx, ny, nz,
        uvs[:, 0], uvs[:, 1],
        wx, wy, wz,
    ]
    return sm._bitcast_i32(jnp.stack(rows, axis=0), jnp)  # (16, V)


def _kernel(ltT_ref, matT_ref, tblT_ref, comb_ref, key_ref, flag_ref,
            extx_ref, exty_ref, fs, *, cfg: RasterConfig):
    m = pl.program_id(0)
    ss = cfg.subpixel_scale
    gx = F32(1.0 + 2.0 * cfg.guard_px / cfg.width)
    gy = F32(1.0 + 2.0 * cfg.guard_px / cfg.height)
    off = I32(-cfg.min_coord)

    tbl = tblT_ref[...]  # (16, 128) i32: the meshlet's vertex window
    rel3 = ltT_ref[0]  # (3, 128) i32 local corner ids (-1 = padding)

    # ---- exact one-hot corner gather (4 byte-plane int8 matmuls)
    viota = jax.lax.broadcasted_iota(I32, (MESHLET_VERTS, MESHLET_TRIS), 0)
    oh = jnp.concatenate(
        [(viota == rel3[c : c + 1, :]).astype(I8) for c in range(3)], axis=1
    )  # (128 verts, 384 slots)
    g = jnp.zeros((N_TBL_ROWS, 3 * MESHLET_TRIS), I32)
    dn = (((1,), (0,)), ((), ()))
    for k in range(4):
        bk = ((tbl >> (8 * k)) & 255).astype(I8)
        gk = jax.lax.dot_general(bk, oh, dn, preferred_element_type=I32)
        g = g | (((gk & 255) << (8 * k)) if k < 3 else (gk << 24))

    # ---- per-corner snap + outcode on (1, 128) lane vectors
    def corner(c):
        base = MESHLET_TRIS * c
        gc = g[:, base : base + MESHLET_TRIS]
        cxy = sm._bitcast_f32(gc[0:4], jnp)
        cx, cy = cxy[0:1], cxy[1:2]
        cz, cw = cxy[2:3], cxy[3:4]
        iw_raw = sm.recip_spec(cw, jnp)
        iw = jnp.where(jnp.isfinite(iw_raw), iw_raw, F32(0.0))

        def nd(v):
            r = v * iw
            return jnp.where(jnp.isfinite(r), r, F32(0.0))

        xi = sm.snap_coord(
            nd(cx), cfg.width, ss, cfg.min_coord, cfg.max_coord_x, jnp
        )
        yi = sm.snap_coord(
            nd(cy), cfg.height, ss, cfg.min_coord, cfg.max_coord_y, jnp
        )
        zq = sm.quantize_depth(nd(cz), jnp)
        # bits 0-5: guard planes; bits 6-9: screen side planes (g = 1) for
        # the clip-path trivial reject (ops/geometry._vertex_post layout)
        ds = (
            cz, cw - cz,
            gx * cw + cx, gx * cw - cx,
            gy * cw + cy, gy * cw - cy,
            cw + cx, cw - cx, cw + cy, cw - cy,
        )
        oc = jnp.zeros_like(xi)
        for pi, d in enumerate(ds):
            oc = oc | ((d < 0).astype(I32) << pi)
        return xi, yi, zq, iw, oc, gc[4:16]  # attrs: 12 rows (f32 bits)

    xa, ya, za, ia, oca, attr_a = corner(0)
    xb, yb, zb, ib, ocb, attr_b = corner(1)
    xc, yc, zc, ic, occ, attr_c = corner(2)

    alive = rel3[0:1, :] >= 0  # corner-0 local id (-1 = padding)
    oc_and = oca & ocb & occ
    out_any = (oc_and & 0x3F) != 0
    all_in = ((oca | ocb | occ) & 0x3F) == 0
    # all corners outside one SCREEN side plane -> zero coverage, skip tail
    out_screen = (oc_and >> 6) != 0
    fast = alive & all_in
    needs_clip = alive & ~all_in & ~out_any & ~out_screen

    sl = sm.shoelace2(xa, ya, xb, yb, xc, yc)
    valid = fast & (sl < 0)
    area2 = jnp.where(valid, -sl, I32(1))
    inv_area2 = sm.recip_spec(area2.astype(F32), jnp)

    # ---- meshlet-level cull (round 5): a meshlet with NO valid and NO
    # clip-candidate triangle (back hemisphere, off-screen, degenerate)
    # contributes nothing downstream — its rows get dead keys and are
    # never streamed or gathered live — so the whole comb assembly +
    # byte-plane transpose is skipped and the block zero-filled.  ~45% of
    # the headline sphere's meshlets are back-facing; this is the coarse-
    # grained analogue of the per-row skips that measured negative (one
    # scalar cond per MESHLET ~ 10k/frame, not 96k/phase).  Zeroed rows
    # differ from the XLA reference ONLY on never-streamed rows
    # (tests/test_setup_kernel.py asserts exactly that split).
    alive_any = jnp.any(valid | needs_clip)

    def zi(v):
        return jnp.where(valid, v, I32(0))

    @pl.when(alive_any)
    def _():
        # ---- assemble comb columns as rows of the (128, 128) scratch
        iab = sm._bitcast_i32(ia, jnp)
        ibb = sm._bitcast_i32(ib, jnp)
        icb = sm._bitcast_i32(ic, jnp)
        ids = MESHLET_TRIS * m + jax.lax.broadcasted_iota(
            I32, (1, MESHLET_TRIS), 1
        )
        # winding rewind 0,2,1 (geometry._finish_tri): corner order
        # (a, c, b).  Coords are zeroed BEFORE the +off pack (matching
        # _finish_tri's field-level zeroing feeding build_comb_table's
        # pack16).
        rows = [
            (zi(xa) + off) | ((zi(ya) + off) << 16),
            (zi(xc) + off) | ((zi(yc) + off) << 16),
            (zi(xb) + off) | ((zi(yb) + off) << 16),
            zi(za | (zc << 16)),
            zi(zb),
            zi(sm._bitcast_i32(inv_area2, jnp)),
            zi(iab), zi(icb), zi(ibb),
            zi(matT_ref[0]),
        ]
        fs[...] = jnp.zeros((TBL_COLS, MESHLET_TRIS), I32)
        for r, v in enumerate(rows):
            fs[r : r + 1, :] = v
        # attr corners in rewound order: v0 = a, v1 = c, v2 = b.  NOT
        # masked by validity — the reference meshlet path gathers attrs
        # unconditionally (tritables.build_comb_table) and invalid rows
        # are never streamed.
        fs[10:22, :] = attr_a
        fs[22:34, :] = attr_c
        fs[34:46, :] = attr_b
        fs[ID_COL : ID_COL + 1, :] = ids

        # ---- exact byte-plane transpose (cols, tris) -> (tris, cols)
        s = fs[...]
        eye = (
            jax.lax.broadcasted_iota(I32, (TBL_COLS, TBL_COLS), 0)
            == jax.lax.broadcasted_iota(I32, (TBL_COLS, TBL_COLS), 1)
        ).astype(I8)
        dt = (((0,), (0,)), ((), ()))
        out = jnp.zeros((MESHLET_TRIS, TBL_COLS), I32)
        for k in range(4):
            bk = ((s >> (8 * k)) & 255).astype(I8)
            tk = jax.lax.dot_general(
                bk, eye, dt, preferred_element_type=I32
            )
            out = out | (((tk & 255) << (8 * k)) if k < 3 else (tk << 24))
        comb_ref[...] = out

    @pl.when(jnp.logical_not(alive_any))
    def _():
        comb_ref[...] = jnp.zeros((MESHLET_TRIS, TBL_COLS), I32)

    # ---- bin_sort streaming key (ops/binsort.stream_keys formulas)
    half = ss // 2
    xmin = zi(jnp.minimum(jnp.minimum(xa, xb), xc))
    xmax = zi(jnp.maximum(jnp.maximum(xa, xb), xc))
    ymin = zi(jnp.minimum(jnp.minimum(ya, yb), yc))
    ymax = zi(jnp.maximum(jnp.maximum(ya, yb), yc))
    pxmin = jnp.maximum(0, (xmin - half + ss - 1) // ss)
    pxmax = jnp.minimum(cfg.width - 1, (xmax - half) // ss)
    pymin = jnp.maximum(0, (ymin - half + ss - 1) // ss)
    pymax = jnp.minimum(cfg.height - 1, (ymax - half) // ss)
    live = valid & (pxmax >= pxmin) & (pymax >= pymin)
    tx0 = pxmin // cfg.tile_w
    tx1 = pxmax // cfg.tile_w
    ty0 = pymin // cfg.tile_h
    ty1 = pymax // cfg.tile_h
    spill_r = tx1 > tx0
    spill_d = ty1 > ty0
    wide = (tx1 - tx0 > 1) | (ty1 - ty0 > 1)
    grp = jnp.where(
        spill_r & spill_d, GRP_DR,
        jnp.where(spill_r, GRP_R, jnp.where(spill_d, GRP_D, GRP_NONE)),
    ).astype(I32)
    tile = (ty0 * cfg.grid_w + tx0).astype(I32)
    n_tiles = cfg.n_tiles
    # fine sub-tile stream (ops/binsort.py key-space doc): no spill AND
    # the pixel AABB fits one 16-lane window
    fine = (grp == GRP_NONE) & (pxmin // FINE_W == pxmax // FINE_W)
    subc = (pxmin // FINE_W) % (cfg.tile_w // FINE_W)
    key_fine = (n_tiles * N_GRP + tile * N_FINE + subc).astype(I32)
    key = jnp.where(
        live,
        jnp.where(
            wide, I32(n_tiles * KEYS_PER_TILE),
            jnp.where(fine, key_fine, tile * N_GRP + grp),
        ),
        I32(n_tiles * KEYS_PER_TILE + 1),
    )
    key_ref[0] = key
    flag_ref[0] = (
        valid.astype(I32)
        | (needs_clip.astype(I32) << 1)
        | (fast.astype(I32) << 2)
    )
    # pixel-AABB extents for window-local (multi-chip slab) key derivation:
    # 16-bit packed, pxmax/pymax may be -1 (sign-extend on unpack)
    extx_ref[0] = (pxmin & 0xFFFF) | (pxmax << 16)
    exty_ref[0] = (pymin & 0xFFFF) | (pymax << 16)


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "tail_rows")
)
def triangle_setup(tblT, ltT, matT, cfg: RasterConfig,
                   interpret: bool = False, tail_rows: int = 0):
    """Run the setup kernel over all meshlets.

    tblT: (16, V) i32 transposed vertex table (transform_vertices_T);
    ltT:  (M, 384) i32 transposed meshlet-local corner ids (prep_static);
    matT: (M, 128) i32 per-triangle material ids.

    Returns (comb (T + tail_rows, 128) i32, keys (T,) i32, flags (T,) i32,
    extx (T,) i32, exty (T,) i32) where T = M * 128; flags bit0 = valid,
    bit1 = needs_clip, bit2 = fast; extx/exty are 16-bit-packed pixel-AABB
    extents (min | max << 16, max sign-extends) for window-local key
    derivation (multi-chip slabs, ops/binsort.stream_keys_from_aabb).
    tail_rows reserves uninitialized rows after the main block for the
    clip tail (written in place by the pipeline via dynamic_update_slice
    on the donated buffer — a separate concat would copy the whole
    ~700 MB table at 1M-triangle scale).
    """
    m = ltT.shape[0]
    t = m * MESHLET_TRIS
    assert tblT.shape[0] == N_TBL_ROWS
    assert tblT.shape[1] == m * MESHLET_VERTS
    # Mosaic block rule: the last two block dims must be 8/128-divisible or
    # equal the array dims — so per-meshlet rows ride a unit middle axis.
    lt3 = ltT.reshape(m, 3, MESHLET_TRIS)
    mat3 = matT.reshape(m, 1, MESHLET_TRIS)
    row_shape = jax.ShapeDtypeStruct((m, 1, MESHLET_TRIS), jnp.int32)
    out_shape = (
        jax.ShapeDtypeStruct((t + tail_rows, TBL_COLS), jnp.int32),
        row_shape,
        row_shape,
        row_shape,
        row_shape,
    )
    row_block = pl.BlockSpec(
        (1, 1, MESHLET_TRIS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    comb, keys, flags, extx, exty = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=out_shape,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, 3, MESHLET_TRIS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row_block,
            pl.BlockSpec((N_TBL_ROWS, MESHLET_VERTS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((MESHLET_TRIS, TBL_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_block,
            row_block,
            row_block,
            row_block,
        ),
        scratch_shapes=[pltpu.VMEM((TBL_COLS, MESHLET_TRIS), I32)],
        interpret=interpret,
    )(lt3, mat3, tblT)
    return (
        comb, keys.reshape(t), flags.reshape(t),
        extx.reshape(t), exty.reshape(t),
    )
