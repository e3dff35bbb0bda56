"""The fused Pallas visibility + shading-distribute kernel (v3: pre-sorted
contiguous streams).

One grid step per framebuffer tile (tile_h=8 x tile_w=128).  Replaces the
round-1 chain [pair-record gather -> visibility kernel -> per-pixel setup
gather -> 3 per-pixel attr gathers] whose XLA scalar-path gathers dominated
the frame (~120 ms at 1080p/1.31M tris).  The v2 kernel gathered triangle
rows ON-CHIP with windowed one-hot matmuls over the raw table; measured on
hardware the windowed DMAs dominated (mean 48 windows per 128-slot segment
at the headline workload, serialized start/wait -> 370 ms).  v3 moves the
reorder OFF-chip: the pipeline gathers the combined per-triangle table into
bin_sort streaming order ONCE per frame (XLA row gather, ~25 ms at 1.4M
rows — measured cheaper than any in-kernel scheme), so every kernel access
is ONE contiguous 128-aligned (128, 128) int32 slice per 128-slot segment:

Phase V (visibility):
  * the tile's work list is 5 position ranges of the sorted order (own run +
    neighbor prefixes + wide run — ops/binsort.py); segments are 128-slot
    windows of each range, 128-aligned (slots outside [rs, re) are zeroed —
    degenerate coverage never wins — with id sentinel -2 that matches no
    winner);
  * evaluate 16 groups of 8 triangles (triangles in SUBLANES, the tile's
    128 pixel columns in LANES, 8 pixel rows swept with incremental edge
    updates) — exact int32 edges + the specmath D16 depth chain;
  * winner per pixel by the order-independent (d16, -tri_id) key: sublane
    min/max reductions within a group, compare-select merges across.

Phase D (shading distribute):
  * re-stream the same ranges; one-hot match each slot's triangle id against
    the tile's winner plane (each id streams at most once per tile, so every
    covered pixel matches exactly one slot);
  * split the segment's (128, 128) block into int8 byte planes ON-CHIP and
    matmul-distribute each plane to the 1024 tile pixels (transposed-lhs
    dot_general over slots), accumulating four (1024, 128) int32 plane
    buffers that reassemble into the per-pixel shading fields
    (coords/inv_area/iw/mat/attr-corners) the XLA shading stage
    (ops/shade.shade_gathered) consumes with bit-identical math to the
    oracle's gather path.

Exactness invariants: one-hot x int8 -> int32 matmuls reproduce bytes
exactly; int32 edge/coverage arithmetic is modular-exact under any
association; out-of-window slots are zeroed so their degenerate coverage
test is false and their id sentinel (-2) matches no winner (valid ids are
>= 0, background is -1).
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
from .binsort import FINE_W, KEYS_PER_TILE, N_FINE, N_GRP
from .tritables import ID_COL, TBL_COLS

F32 = np.float32
I32 = np.int32
I8 = np.int8

N_RANGES = 7  # own, above, left, diag, wide, wide-pairs(ext), own-fine
EXT_RANGE = 5  # the wide-PAIR run streams the separate ext table
FINE_RANGE = 6  # the tile's fine sub-tile run (window-major packed eval)
RMETA_COLS = 2  # rs, re per (tile, range)
GRP_T = 32  # triangles per visibility evaluation group (sublane dim)
TILE_H = 8  # default tile height; kernels honor cfg.tile_h (4 or 8)
TILE_W = 128
N_PIX = TILE_H * TILE_W
COMB_USED = 48  # distributed table cols consumed by phase E (0-47)
OUT_COLS = 24  # phase E/F output planes (layouts below) + winner ids + pad
VIS_ROW = 17  # plane row carrying the tile-flat winner triangle ids

# Phase F plane layout (shade_mode is not None): the surface half of
# shading runs IN-KERNEL on the VMEM-resident interpolated rows — exactly
# shade.shade_surface's op sequence up to (but excluding) the atlas quad
# gather + bilinear lerp + final combine, which stay in XLA
# (pipeline._shade_from_planes).  Rows:
#   0-3  P    = color * material base (f32 bits)
#   4-6  diffuse rgb (f32)          7  spec scalar (f32)
#   8    lit mask (i32 0/1)         9  bilinear tap index (i32)
#   10   fu (f32)   11  fv (f32)    12  texmask (i32 0/1)
#   13-16 zero     17  winner ids   18-23 zero
F_P, F_DIFF, F_SPEC, F_LIT, F_TAP, F_FU, F_FV, F_TEXMASK = (
    0, 4, 7, 8, 9, 10, 11, 12
)
_MAXL = 13  # textures.MAX_LEVELS (mip table stride)


def shade_consts_layout(shade_mode):
    """Static offsets of the shade-constant scalars appended after rmeta in
    the kernel's scalar-prefetch array.  shade_mode =
    (M, T, has_materials, has_atlas, has_light); floats are stored as i32
    bit patterns (Mosaic has no scalar bitcast, so the kernel reads i32
    scalars and bitcasts (1, 1) arrays)."""
    m, t, has_m, has_a, has_l = shade_mode
    off = {}
    pos = 0

    def add(name, n):
        nonlocal pos
        off[name] = pos
        pos += n

    if has_m:
        add("base", m * 4)
        add("texid", m)
        add("spec", m)
        add("shin", m)
    if has_a:
        add("loff", t * _MAXL)
        add("lw", t * _MAXL)
        add("lh", t * _MAXL)
        add("nlev", t)
    if has_l:
        add("ldir", 3)
        add("lcol", 3)
        add("amb", 1)
    add("cam", 3)
    off["_total"] = pos
    return off


def _phase_f(planes_ref, rmeta_ref, attr, duv, mat_row, *, cfg, n_tiles,
             shade_mode):
    """The in-kernel surface half of shading.  Every formula and operation
    order matches ops/shade.shade_surface / sample_texture /
    _mip_from_raws verbatim (channel-row layout instead of channel-last —
    per-element ops identical, so downstream bits are identical); material
    / atlas tables are tiny and read as scalar-prefetch select trees
    (the XLA path's _take uses the same K-way select for small tables)."""
    m_n, t_n, has_m, has_a, has_l = shade_mode
    n_pix = cfg.tile_h * TILE_W
    lay = shade_consts_layout(shade_mode)
    cbase = n_tiles * N_RANGES * RMETA_COLS + 1  # after rmeta + row0
    F = F32

    def sci(j):  # (1, 1) i32 from the prefetch scalars
        return jnp.full((1, 1), rmeta_ref[cbase + j], I32)

    def scf(j):
        return jax.lax.bitcast_convert_type(sci(j), F)

    def tree(getv, idx, k_n):
        out = getv(0)
        for k in range(1, k_n):
            out = jnp.where(idx == I32(k), getv(k), out)
        return out

    def row(i):
        return attr[i : i + 1, :]  # (1, n_pix) f32

    c = [row(i) for i in range(4)]
    nx, ny, nz = row(4), row(5), row(6)
    u, v = row(7), row(8)
    wx, wy, wz = row(9), row(10), row(11)
    zf = jnp.zeros((1, n_pix), F)
    zi = jnp.zeros((1, n_pix), I32)
    p = list(c)
    tap, fu, fv, texmask = zi, zf, zf, zi
    diffuse = [zf, zf, zf]
    spec, lit = zf, zi

    if has_m:
        mat = jnp.clip(mat_row, 0, m_n - 1)
        ob = lay["base"]
        for ch in range(4):
            bch = tree(lambda k, ch=ch: scf(ob + 4 * k + ch), mat, m_n)
            p[ch] = p[ch] * bch
        if has_a:
            durx, dvrx, dury, dvry = duv
            tex_id = tree(lambda k: sci(lay["texid"] + k), mat, m_n)
            # _mip_from_raws, verbatim
            tex_c = jnp.clip(tex_id, 0, t_n - 1)
            bw = tree(
                lambda k: sci(lay["lw"] + k * _MAXL), tex_c, t_n
            ).astype(F)
            bh = tree(
                lambda k: sci(lay["lh"] + k * _MAXL), tex_c, t_n
            ).astype(F)
            nl = tree(lambda k: sci(lay["nlev"] + k), tex_c, t_n)

            def fp2(dur, dvr):
                du = dur * bw
                dv = dvr * bh
                return du * du + dv * dv

            rho2 = jnp.maximum(fp2(durx, dvrx), fp2(dury, dvry))
            rho2 = jnp.maximum(rho2, F(1e-20))
            e2b = sm.float_exponent(rho2, jnp)
            level = jnp.clip(
                e2b >> 1, 0, jnp.maximum(nl - 1, 0)
            ).astype(I32)
            # sample_texture's addressing half, verbatim
            flat = tex_c * _MAXL + level
            off_t = tree(lambda k: sci(lay["loff"] + k), flat, t_n * _MAXL)
            w_t = tree(lambda k: sci(lay["lw"] + k), flat, t_n * _MAXL)
            h_t = tree(lambda k: sci(lay["lh"] + k), flat, t_n * _MAXL)
            u_s = jnp.where(jnp.isfinite(u), u, F(0.0))
            v_s = jnp.where(jnp.isfinite(v), v, F(0.0))
            ut = u_s * w_t.astype(F) - F(0.5)
            vt = v_s * h_t.astype(F) - F(0.5)
            iu0 = jnp.floor(ut).astype(I32)
            iv0 = jnp.floor(vt).astype(I32)
            fu = ut - iu0.astype(F)
            fv = vt - iv0.astype(F)
            iu0w = jnp.mod(iu0, w_t)
            iv0w = jnp.mod(iv0, h_t)
            tap = off_t + iv0w * w_t + iu0w
            texmask = (tex_id >= 0).astype(I32)

    if has_l:
        # shade_surface's lighting, verbatim (channel rows)
        n2 = sm.dot3(nx, nx, ny, ny, nz, nz)
        invn = sm.rsqrt_spec(jnp.maximum(n2, F(1e-30)), jnp)
        nhx, nhy, nhz = nx * invn, ny * invn, nz * invn
        lit = (n2 > F(1e-12)).astype(I32)
        ld0 = [scf(lay["ldir"] + i) for i in range(3)]
        d2 = sm.dot3(ld0[0], ld0[0], ld0[1], ld0[1], ld0[2], ld0[2])
        invd = sm.rsqrt_spec(jnp.maximum(d2, F(1e-30)), jnp)
        ldx, ldy, ldz = ld0[0] * invd, ld0[1] * invd, ld0[2] * invd
        ndotl = jnp.maximum(
            F(0.0), -sm.dot3(nhx, ldx, nhy, ldy, nhz, ldz)
        )
        amb = scf(lay["amb"])
        for i in range(3):
            diffuse[i] = amb + ndotl * scf(lay["lcol"] + i)
        if has_m:
            sk = tree(lambda k: scf(lay["spec"] + k), mat, m_n)
            sh = tree(lambda k: sci(lay["shin"] + k), mat, m_n)
            vx = scf(lay["cam"]) - wx
            vy = scf(lay["cam"] + 1) - wy
            vz = scf(lay["cam"] + 2) - wz
            v2 = sm.dot3(vx, vx, vy, vy, vz, vz)
            invv = sm.rsqrt_spec(jnp.maximum(v2, F(1e-30)), jnp)
            vhx, vhy, vhz = vx * invv, vy * invv, vz * invv
            hx, hy, hz = vhx - ldx, vhy - ldy, vhz - ldz
            h2 = sm.dot3(hx, hx, hy, hy, hz, hz)
            invh = sm.rsqrt_spec(jnp.maximum(h2, F(1e-30)), jnp)
            hhx, hhy, hhz = hx * invh, hy * invh, hz * invh
            ndoth = jnp.maximum(
                F(0.0), sm.dot3(nhx, hhx, nhy, hhy, nhz, hhz)
            )
            spec = sm.powi(ndoth, sh, 8, jnp) * sk

    def wf(r, x):
        planes_ref[0, r : r + 1, :] = jax.lax.bitcast_convert_type(
            jnp.broadcast_to(x, (1, n_pix)), I32
        )

    def wi(r, x):
        planes_ref[0, r : r + 1, :] = jnp.broadcast_to(x, (1, n_pix))

    for ch in range(4):
        wf(F_P + ch, p[ch])
    for i in range(3):
        wf(F_DIFF + i, diffuse[i])
    wf(F_SPEC, spec)
    wi(F_LIT, lit)
    wi(F_TAP, tap)
    wf(F_FU, fu)
    wf(F_FV, fv)
    wi(F_TEXMASK, texmask)
    planes_ref[0, F_TEXMASK + 1 : VIS_ROW, :] = jnp.zeros(
        (VIS_ROW - F_TEXMASK - 1, n_pix), I32
    )
PLANE_ROWS = 48  # distribute accumulator rows = COMB_USED exactly (8-
                 # sublane aligned; was TBL_COLS=128, then 64 — every
                 # extra row block costs a zero-fill + matmul pass per
                 # matched segment in phase D)


def build_range_meta(bounds, n_tiles: int, gw: int, tile_row0=0,
                     pair_starts=None, pair_base: int = 0,
                     wide_start=None):
    """(n_tiles * 6 * 2 + 1,) int32: [rs, re] per (tile, range), then the
    window's first tile row (0 full-frame; the slab origin under
    shard_map — the kernel offsets its sample rows by it).

    Ranges per tile (processing order): own full coarse run, ABOVE prefix
    {dr, r, d}, LEFT prefix {dr, r}, DIAGONAL prefix {dr}, wide run,
    wide-PAIR run, own FINE run — see ops/binsort.py for why prefixes of
    whole-group runs suffice and for the fine key region (no neighbor
    streams a fine run: fine triangles never spill).  The pair run is the
    tile's slice of the expanded wide pairs appended after ``order``
    (binsort.expand_wide_pairs):
    [pair_base + pair_starts[t], pair_base + pair_starts[t+1]); the global
    wide run holds only the budget overflow.  pair_starts=None -> empty
    pair runs (the expansion-free paths).
    All neighbor lookups are fixed shifts of the per-tile bound columns,
    so the whole table is strided slices + shifts + masked selects — no
    gather (the fused-gather form cost ~5 ms at 2k tiles: 100k indices on
    the scalar path)."""
    tt = np.arange(n_tiles, dtype=np.int64)
    tx_ok = jnp.asarray(tt % gw > 0)  # has a LEFT neighbor
    ty_ok = jnp.asarray(tt // gw > 0)  # has an ABOVE neighbor

    c = [bounds[k : N_GRP * n_tiles : N_GRP] for k in range(N_GRP)]
    fb = N_GRP * n_tiles
    fine0 = bounds[fb : fb + N_FINE * n_tiles : N_FINE]
    wide_s = bounds[KEYS_PER_TILE * n_tiles : KEYS_PER_TILE * n_tiles + 1]
    wide_e = bounds[
        KEYS_PER_TILE * n_tiles + 1 : KEYS_PER_TILE * n_tiles + 2
    ]

    def shift(x, k, ok):  # value of tile t-k, masked (zeros elsewhere)
        if k >= n_tiles:  # tiny grids: no tile has that neighbor
            return jnp.zeros(n_tiles, x.dtype)
        v = jnp.concatenate([jnp.zeros(k, x.dtype), x[: n_tiles - k]])
        return jnp.where(ok, v, 0)

    # own coarse run ends where the next tile's begins; the LAST tile's
    # ends where the fine key region starts (bounds[fb])
    own = (c[0], jnp.concatenate([c[0][1:], bounds[fb : fb + 1]]))
    above = (shift(c[0], gw, ty_ok), shift(c[3], gw, ty_ok))
    left = (shift(c[0], 1, tx_ok), shift(c[2], 1, tx_ok))
    dg_ok = tx_ok & ty_ok
    diag = (shift(c[0], gw + 1, dg_ok), shift(c[1], gw + 1, dg_ok))
    # wide_start: expansion moved [wide_s, wide_start) into per-tile pair
    # runs; only the overflow suffix stays global.  Passed separately —
    # rewriting bounds[n_tiles*4] would also move the LAST tile's own-run
    # end sentinel and re-stream the expanded rows there (phase D would
    # then accumulate their fields twice).
    ws_eff = wide_s if wide_start is None else wide_start.reshape(1)
    wide = (
        jnp.broadcast_to(ws_eff, (n_tiles,)),
        jnp.broadcast_to(wide_e, (n_tiles,)),
    )
    if pair_starts is None:
        z = jnp.zeros(n_tiles, I32)
        pairs = (z, z)
    else:
        pairs = (
            pair_base + pair_starts[:-1],
            pair_base + pair_starts[1:],
        )
    # own fine run: 8 contiguous subcol bins; ends at the next tile's
    # fine start (last tile: the wide run start)
    fine = (fine0, jnp.concatenate([fine0[1:], wide_s]))
    meta = jnp.stack(
        [
            jnp.stack(p, axis=-1)
            for p in (own, above, left, diag, wide, pairs, fine)
        ],
        axis=1,
    )  # (n_tiles, 7, 2)
    rs = meta[..., 0]
    re = jnp.maximum(meta[..., 1], rs)
    flat = jnp.stack([rs, re], axis=-1).reshape(-1)
    return jnp.concatenate(
        [flat, jnp.asarray(tile_row0, I32).reshape(1)]
    )


def _kernel(
    rmeta_ref,
    tbl_ref,
    ext_ref,
    vis_d_ref,
    vis_t_ref,
    planes_ref,
    tbl_bufs,
    work_blk,
    recs_s,
    flat_s,
    out_p0,
    out_p1,
    out_p2,
    out_p3,
    accf_s,
    sems,
    *,
    cfg: RasterConfig,
    gw: int,
    n_tiles: int,
    phases: str = "vde",
    seg: int = TILE_W,
    shade_mode=None,
    packed_fine: bool = True,
    range_loop: bool = True,
):
    t = pl.program_id(0)
    th = cfg.tile_h  # 8 (default) or 4; lanes are always the 128 columns
    n_pix = th * TILE_W
    tile_x = t % gw
    tile_y = t // gw
    # window origin (slab tile row under shard_map; 0 full-frame)
    row0 = rmeta_ref[n_tiles * N_RANGES * RMETA_COLS]
    ss = cfg.subpixel_scale
    half = ss // 2
    min_c = I32(cfg.min_coord)
    sx0 = (tile_x * TILE_W) * ss + half  # tile-corner pixel sample coords
    sy0 = ((row0 + tile_y) * th) * ss + half

    if phases == "z":  # probe mode: the structural floor — grid loop +
        # output-block DMAs only, zero compute/streaming
        if th == 8:
            vis_d_ref[:] = jnp.zeros((th, TILE_W), I32)
            vis_t_ref[:] = jnp.zeros((th, TILE_W), I32)
        else:
            vis_d_ref[0] = jnp.zeros((th, TILE_W), I32)
            vis_t_ref[0] = jnp.zeros((th, TILE_W), I32)
        planes_ref[0, :, :] = jnp.zeros((OUT_COLS, n_pix), I32)
        return

    colp = jax.lax.broadcasted_iota(I32, (1, TILE_W), 1)
    subl = jax.lax.broadcasted_iota(I32, (seg, 1), 0)

    def range_scalars(i):
        b = (t * N_RANGES + i) * RMETA_COLS
        return rmeta_ref[b], rmeta_ref[b + 1]

    # DMA streaming: one VMEM buffer + semaphore per range.  All ranges'
    # first windows are issued up front; each window's successor is issued
    # as soon as the current block has been staged out of the buffer, so
    # the copy engine runs ahead of the compute (the serialized
    # start();wait() form left ~1-2 us of DMA latency exposed per segment,
    # ~10 ms/phase at the headline's ~5.6k segments).
    # range 5 (the wide-PAIR run) streams from the separate ext table,
    # which the pipeline gathers only on frames with a live wide run —
    # static frames never pay the pair budget's gather (pipeline.py)
    def src_ref(i):
        return ext_ref if i == EXT_RANGE else tbl_ref

    def start_seg(i, ab):
        pltpu.make_async_copy(
            src_ref(i).at[pl.ds(ab, seg), :], tbl_bufs.at[i], sems.at[i]
        ).start()

    def wait_seg(i, ab):
        pltpu.make_async_copy(
            src_ref(i).at[pl.ds(ab, seg), :], tbl_bufs.at[i], sems.at[i]
        ).wait()

    rr = [range_scalars(i) for i in range(N_RANGES)]
    # window start only needs SUBLANE (8-row) alignment for the DMA;
    # 128-aligning it cost ~1.8 windows per range (measured 6627
    # segments/phase for 3618 nonempty ranges at the headline)
    ab0s = [pl.multiple_of((rs // 8) * 8, 8) for rs, _ in rr]
    nsws = [
        jnp.where(re > rs, -(-(re - ab0) // seg), 0)
        for (rs, re), ab0 in zip(rr, ab0s)
    ]

    def prefetch_first_windows():
        # tbl-sourced ranges 0-4 share ONE traced-index DMA body (program
        # size = per-shape device load on this backend; the unrolled form
        # carried 7 copies of everything)
        def pf_tbl(i, _):
            rs, re = range_scalars(i)
            ab0 = pl.multiple_of((rs // 8) * 8, 8)

            @pl.when(re > rs)
            def _():
                start_seg_tbl(i, ab0)

            return 0

        jax.lax.fori_loop(0, EXT_RANGE, pf_tbl, 0)
        for i in (EXT_RANGE, FINE_RANGE):
            @pl.when(nsws[i] > 0)
            def _(i=i):
                start_seg(i, ab0s[i])

    def start_seg_tbl(i, ab):
        # traced range index, tbl source (validated on hardware:
        # experiments dynamic .at[i] DMA probe)
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(ab, seg), :], tbl_bufs.at[i], sems.at[i]
        ).start()

    def wait_seg_tbl(i, ab):
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(ab, seg), :], tbl_bufs.at[i], sems.at[i]
        ).wait()

    def unpack16(p):
        return ((p & 0xFFFF) + min_c), (((p >> 16) & 0xFFFF) + min_c)

    def eval_group(blk, ids_g, acc):
        """GRP_T triangles (sublanes) x 128 columns x 8 swept rows —
        wider groups amortize the per-row winner reduction/merge (the
        cross-triangle machinery runs once per group-row regardless).
        blk: (GRP_T, 6) records; ids_g: (GRP_T, 1) triangle ids."""
        acc_d, acc_t = acc
        x0, y0 = unpack16(blk[:, 0:1])
        x1, y1 = unpack16(blk[:, 1:2])
        x2, y2 = unpack16(blk[:, 2:3])
        zq01 = blk[:, 3:4]
        zq0 = zq01 & 0xFFFF
        zq1 = (zq01 >> 16) & 0xFFFF
        zq2 = blk[:, 4:5]
        inv_area = jax.lax.bitcast_convert_type(blk[:, 5:6], F32)

        a0, b0, tl0 = sm.edge_coeffs(x1, y1, x2, y2)
        a1, b1, tl1 = sm.edge_coeffs(x2, y2, x0, y0)
        a2, b2, tl2 = sm.edge_coeffs(x0, y0, x1, y1)
        t0 = I32(1) - tl0.astype(I32)
        t1 = I32(1) - tl1.astype(I32)
        t2 = I32(1) - tl2.astype(I32)
        # edge values at the tile-corner sample, then incremental sweeps
        e0 = sm.edge_at(a0, b0, x1, y1, sx0, sy0) + (a0 * ss) * colp
        e1 = sm.edge_at(a1, b1, x2, y2, sx0, sy0) + (a1 * ss) * colp
        e2 = sm.edge_at(a2, b2, x0, y0, sx0, sy0) + (a2 * ss) * colp
        bss0, bss1, bss2 = b0 * ss, b1 * ss, b2 * ss

        for r in range(th):
            cov = (e0 >= t0) & (e1 >= t1) & (e2 >= t2)
            d16 = sm.interp_depth16(e0, e1, e2, inv_area, zq0, zq1, zq2, jnp)
            dmask = jnp.where(cov, d16, I32(sm.DEPTH_MAX + 1))
            dmin = jnp.min(dmask, axis=0, keepdims=True)  # (1, 128)
            twin = jnp.max(
                jnp.where(dmask == dmin, ids_g, I32(sm.BG_TRI)),
                axis=0,
                keepdims=True,
            )
            better = sm.depth_key_better(dmin, twin, acc_d[r], acc_t[r])
            acc_d[r] = jnp.where(better, dmin, acc_d[r])
            acc_t[r] = jnp.where(better, twin, acc_t[r])
            if r + 1 < th:
                e0 = e0 + bss0
                e1 = e1 + bss1
                e2 = e2 + bss2
        return acc_d, acc_t

    # ---------------- Phase V: visibility ----------------
    acc_d = [jnp.full((1, TILE_W), sm.DEPTH_MAX, I32) for _ in range(th)]
    acc_t = [jnp.full((1, TILE_W), sm.BG_TRI, I32) for _ in range(th)]
    acc = tuple(acc_d + acc_t)

    if "v" in phases:
        prefetch_first_windows()

    def stream_range_v(i, acc, from_ext: bool):
        """Stream one range through the coarse eval.  ``i`` may be a
        TRACED index for tbl-sourced ranges — ranges 0-4 (and 6 when the
        packed path is off) run through ONE instantiation of this body
        via an outer fori_loop (the per-range unroll carried ~6 copies of
        the whole eval, and per-shape device load is program-size-bound
        on this backend).  The ext range keeps its own static copy."""
        rs, re = range_scalars(i)
        ab0 = pl.multiple_of((rs // 8) * 8, 8)
        nsw = jnp.where(re > rs, -(-(re - ab0) // seg), 0)

        def sw_body(w, acc):
            ab = pl.multiple_of(ab0 + w * seg, 8)
            if from_ext:
                wait_seg(EXT_RANGE, ab)
                blk = tbl_bufs[EXT_RANGE]
            else:
                wait_seg_tbl(i, ab)
                blk = tbl_bufs[i]
            vcol = (subl >= rs - ab) & (subl < re - ab)
            recs_s[:, 0:6] = jnp.where(vcol, blk[:, 0:6], I32(0))
            recs_s[:, 6:7] = jnp.where(
                vcol, blk[:, ID_COL : ID_COL + 1], I32(-2)
            )

            # the block now lives in recs_s — overlap the next window's DMA
            @pl.when(w + 1 < nsw)
            def _():
                if from_ext:
                    start_seg(EXT_RANGE, pl.multiple_of(ab + seg, 8))
                else:
                    start_seg_tbl(i, pl.multiple_of(ab + seg, 8))

            g0 = jnp.maximum(rs - ab, 0) // GRP_T
            ng = -(-jnp.minimum(re - ab, seg) // GRP_T)

            def grp_body(g, acc):
                off = pl.multiple_of(GRP_T * g, GRP_T)
                blk_g = recs_s[pl.ds(off, GRP_T), 0:6]
                ids_g = recs_s[pl.ds(off, GRP_T), 6:7]
                acc_d, acc_t = eval_group(
                    blk_g, ids_g, (list(acc[:th]), list(acc[th:]))
                )
                return tuple(acc_d + acc_t)

            return jax.lax.fori_loop(g0, ng, grp_body, acc)

        return jax.lax.fori_loop(0, nsw, sw_body, acc)

    if "v" in phases:
        v_tbl = list(range(EXT_RANGE)) + (
            [] if packed_fine else [FINE_RANGE]
        )
        if range_loop:
            acc = jax.lax.fori_loop(
                0, len(v_tbl),
                lambda k, a: stream_range_v(
                    jnp.where(k == EXT_RANGE, I32(FINE_RANGE), k)
                    if not packed_fine else k,
                    a, False,
                ),
                acc,
            )
        else:
            # unrolled A/B variant: static instantiation per range
            # (bigger program -> slower per-shape device load; possibly
            # faster steady state — the traced-index form pays some
            # per-segment indexing overhead)
            for i in v_tbl:
                acc = stream_range_v(i, acc, False)
        acc = stream_range_v(EXT_RANGE, acc, True)

    acc_d = list(acc[:th])
    acc_t = list(acc[th:])

    # ---------------- Phase V, fine range: window-major packed eval ----
    # 8 consecutive fine rows (sorted by (tile, subcol)) form one group;
    # sublane i evaluates triangle i over its OWN 16-lane window with
    # lanes = (row, xoff) — one (8, 128) evaluation covers 8 triangles'
    # ENTIRE tile footprint (each window contains its triangle's pixel
    # AABB by the fine-key definition, so no coverage is lost).  Winners
    # accumulate per WINDOW (order-independent (d16, -id) reduction — any
    # grouping/order is bit-identical) and one per-tile epilogue relays
    # the 8 window rows into the screen-layout accumulators with static
    # lane rolls.  ~8x fewer (slot, pixel) evaluations than streaming the
    # same rows through the coarse path (phase V's measured ~96% waste:
    # avg ~4 covered px per 1024-px slot evaluation at the headline).
    if "v" in phases and packed_fine:
        rs_f, re_f = rr[FINE_RANGE]
        ab0_f = ab0s[FINE_RANGE]
        nsw_f = nsws[FINE_RANGE]
        xo = colp % FINE_W  # (1, 128): xoff within the window
        rowl = jax.lax.broadcasted_iota(I32, (1, TILE_W), 1) // FINE_W
        submask = [
            jax.lax.broadcasted_iota(I32, (N_FINE, 1), 0) == I32(j)
            for j in range(N_FINE)
        ]

        # window accumulators live in scratch (accf_s rows 0-7 = d16,
        # 8-15 = ids) so the streaming loop can sit under pl.when (DMA
        # refs) while the epilogue below reads them unconditionally
        accf_s[0:N_FINE, :] = jnp.full((N_FINE, TILE_W), sm.DEPTH_MAX, I32)
        accf_s[N_FINE : 2 * N_FINE, :] = jnp.full(
            (N_FINE, TILE_W), sm.BG_TRI, I32
        )

        def swf_body(w, accf):
            accf_d, accf_t = accf
            ab = pl.multiple_of(ab0_f + w * seg, 8)
            wait_seg(FINE_RANGE, ab)
            blk = tbl_bufs[FINE_RANGE]
            vcol = (subl >= rs_f - ab) & (subl < re_f - ab)
            recs_s[:, 0:6] = jnp.where(vcol, blk[:, 0:6], I32(0))
            recs_s[:, 6:7] = jnp.where(
                vcol, blk[:, ID_COL : ID_COL + 1], I32(-2)
            )

            @pl.when(w + 1 < nsw_f)
            def _():
                start_seg(FINE_RANGE, pl.multiple_of(ab + seg, 8))

            # 32-row groups: the 8-way window merge below runs once per
            # GROUP regardless of group size, so wider groups amortize it
            # 4x vs 8-row groups (measured: 8-row groups made the packed
            # stream a net LOSS — static 36.2 -> 30.8 FPS)
            g0 = jnp.maximum(rs_f - ab, 0) // GRP_T
            ng = -(-jnp.minimum(re_f - ab, seg) // GRP_T)

            def grpf_body(g, accf):
                accf_d, accf_t = accf
                off = pl.multiple_of(GRP_T * g, GRP_T)
                blk_g = recs_s[pl.ds(off, GRP_T), 0:6]
                ids_g = recs_s[pl.ds(off, GRP_T), 6:7]
                x0, y0 = unpack16(blk_g[:, 0:1])
                x1, y1 = unpack16(blk_g[:, 1:2])
                x2, y2 = unpack16(blk_g[:, 2:3])
                zq01 = blk_g[:, 3:4]
                zq0 = zq01 & 0xFFFF
                zq1 = (zq01 >> 16) & 0xFFFF
                zq2 = blk_g[:, 4:5]
                inv_area = jax.lax.bitcast_convert_type(blk_g[:, 5:6], F32)

                a0, b0, tl0 = sm.edge_coeffs(x1, y1, x2, y2)
                a1, b1, tl1 = sm.edge_coeffs(x2, y2, x0, y0)
                a2, b2, tl2 = sm.edge_coeffs(x0, y0, x1, y1)
                t0 = I32(1) - tl0.astype(I32)
                t1 = I32(1) - tl1.astype(I32)
                t2 = I32(1) - tl2.astype(I32)
                # the row's window (same formula as the key's subc)
                xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
                pxmin = jnp.maximum(0, (xmin - half + ss - 1) // ss)
                s = (pxmin % TILE_W) // FINE_W  # (8, 1)
                sxw = sx0 + (FINE_W * s) * ss  # window-origin sample x
                e0 = (
                    sm.edge_at(a0, b0, x1, y1, sxw, sy0)
                    + (a0 * ss) * xo + (b0 * ss) * rowl
                )
                e1 = (
                    sm.edge_at(a1, b1, x2, y2, sxw, sy0)
                    + (a1 * ss) * xo + (b1 * ss) * rowl
                )
                e2 = (
                    sm.edge_at(a2, b2, x0, y0, sxw, sy0)
                    + (a2 * ss) * xo + (b2 * ss) * rowl
                )
                cov = (e0 >= t0) & (e1 >= t1) & (e2 >= t2)
                d16 = sm.interp_depth16(
                    e0, e1, e2, inv_area, zq0, zq1, zq2, jnp
                )
                dmask = jnp.where(cov, d16, I32(sm.DEPTH_MAX + 1))
                for j in range(N_FINE):
                    dm = jnp.where(s == I32(j), dmask, I32(sm.DEPTH_MAX + 1))
                    dmin = jnp.min(dm, axis=0, keepdims=True)  # (1, 128)
                    twin = jnp.max(
                        jnp.where(dm == dmin, ids_g, I32(sm.BG_TRI)),
                        axis=0,
                        keepdims=True,
                    )
                    better = sm.depth_key_better(
                        dmin, twin, accf_d[j : j + 1], accf_t[j : j + 1]
                    )
                    upd = submask[j] & better
                    accf_d = jnp.where(upd, dmin, accf_d)
                    accf_t = jnp.where(upd, twin, accf_t)
                return accf_d, accf_t

            return jax.lax.fori_loop(g0, ng, grpf_body, (accf_d, accf_t))

        @pl.when(nsw_f > 0)
        def _():
            accf = jax.lax.fori_loop(
                0,
                nsw_f,
                swf_body,
                (accf_s[0:N_FINE, :], accf_s[N_FINE : 2 * N_FINE, :]),
            )
            accf_s[0:N_FINE, :] = accf[0]
            accf_s[N_FINE : 2 * N_FINE, :] = accf[1]

        # epilogue: relay window rows -> screen rows and merge (runs for
        # every tile; an empty fine run leaves the DEPTH_MAX/BG init in
        # accf_s and every merge is a no-op by the (d16, -id) key).
        # Window j's element (r, x) lives at accf[j, FINE_W*r + x] and
        # belongs at screen lane FINE_W*j + x of acc row r — sublane j
        # rolled by FINE_W*(j - r).  Precompute the 8 uniform block rolls
        # U_k = roll(accf, FINE_W*k) once (k = (j - r) mod 8 selects the
        # right one per pair); the STRIDED roll form that does this in
        # one op per row mis-lowers on hardware (exact in interpret mode,
        # wrong lanes on a real v5e — caught by the headline sha256 gate,
        # minimal repro in the round-5 notes), so only uniform shifts are
        # used here.
        accf_d = accf_s[0:N_FINE, :]
        accf_t = accf_s[N_FINE : 2 * N_FINE, :]
        winmask = [
            (colp // FINE_W) == I32(j) for j in range(N_FINE)
        ]
        U_d = [
            pltpu.roll(accf_d, (FINE_W * k) % TILE_W, 1)
            for k in range(N_FINE)
        ]
        U_t = [
            pltpu.roll(accf_t, (FINE_W * k) % TILE_W, 1)
            for k in range(N_FINE)
        ]
        for r in range(th):
            cand_d = jnp.full((1, TILE_W), sm.DEPTH_MAX, I32)
            cand_t = jnp.full((1, TILE_W), sm.BG_TRI, I32)
            for j in range(N_FINE):
                k = (j - r) % N_FINE
                cand_d = jnp.where(
                    winmask[j], U_d[k][j : j + 1], cand_d
                )
                cand_t = jnp.where(
                    winmask[j], U_t[k][j : j + 1], cand_t
                )
            better = sm.depth_key_better(
                cand_d, cand_t, acc_d[r], acc_t[r]
            )
            acc_d[r] = jnp.where(better, cand_d, acc_d[r])
            acc_t[r] = jnp.where(better, cand_t, acc_t[r])
    # th=8 vis blocks are 2-D (th, 128); th=4 blocks are 3-D (1, th, 128)
    # because Mosaic requires the output block sublane dim be divisible by
    # 8 or equal to the array dim — (tile_rows, th, gw*128) satisfies it
    if th == 8:
        vis_d_ref[:] = jnp.concatenate(acc_d, axis=0)
        vis_t_ref[:] = jnp.concatenate(acc_t, axis=0)
    else:
        vis_d_ref[0] = jnp.concatenate(acc_d, axis=0)
        vis_t_ref[0] = jnp.concatenate(acc_t, axis=0)

    # ---------------- Phase D: shading distribute ----------------
    for r in range(th):
        flat_s[0:1, TILE_W * r : TILE_W * (r + 1)] = acc_t[r]
    flatv = flat_s[:]  # (1, 1024) winner tri ids

    zero_p = jnp.zeros((PLANE_ROWS, n_pix), I32)
    out_p0[...] = zero_p
    out_p1[...] = zero_p
    out_p2[...] = zero_p
    out_p3[...] = zero_p

    dn = (((0,), (0,)), ((), ()))  # contract over slots (transposed lhs)

    def stream_range_d(i, from_ext: bool):
        """Phase D for one range; ``i`` may be traced for tbl-sourced
        ranges (0-4 and 6 share one instantiation via the outer fori
        below — the distribute accumulation is a sum of DISJOINT one-hot
        contributions, each pixel matched by at most one slot across all
        ranges, so any range order produces identical integers)."""
        rs, re = range_scalars(i)
        ab0 = pl.multiple_of((rs // 8) * 8, 8)
        nsw = jnp.where(re > rs, -(-(re - ab0) // seg), 0)

        def swd_body(w, _):
            ab = pl.multiple_of(ab0 + w * seg, 8)
            if from_ext:
                wait_seg(EXT_RANGE, ab)
                work_blk[...] = tbl_bufs[EXT_RANGE]
            else:
                wait_seg_tbl(i, ab)
                work_blk[...] = tbl_bufs[i]

            @pl.when(w + 1 < nsw)
            def _():
                if from_ext:
                    start_seg(EXT_RANGE, pl.multiple_of(ab + seg, 8))
                else:
                    start_seg_tbl(i, pl.multiple_of(ab + seg, 8))

            blk = work_blk[:]
            vcol = (subl >= rs - ab) & (subl < re - ab)
            ids_col = jnp.where(
                vcol, blk[:, ID_COL : ID_COL + 1], I32(-2)
            )  # (128, 1)
            match = ids_col == flatv  # (128, 1024)

            # segments none of whose slots won any pixel (common in the
            # neighbor-prefix ranges) contribute all-zero one-hots — skip
            # the matmul/accumulate entirely
            @pl.when(jnp.any(match))
            def _():
                oh_d = match.astype(I8)  # (128, 1024)
                for out_p, k in (
                    (out_p0, 0),
                    (out_p1, 1),
                    (out_p2, 2),
                    (out_p3, 3),
                ):
                    bk = (
                    (blk[:, 0:PLANE_ROWS] >> (8 * k)) & 255
                ).astype(I8)  # (seg, 64)
                    # (cols, pixels): table columns in SUBLANES so the
                    # planes output needs no 48->128 lane pad (the pixel-
                    # minor layout padded 2.67x -> ~1 GB of HBM writes)
                    out_p[...] = out_p[...] + jax.lax.dot_general(
                        bk, oh_d, dn, preferred_element_type=I32
                    )

            return 0

        jax.lax.fori_loop(0, nsw, swd_body, 0)
        return 0

    if "d" in phases:
        prefetch_first_windows()
        if range_loop:
            # tbl-sourced ranges {0..4, 6} through ONE body (k=5 -> 6)
            jax.lax.fori_loop(
                0, EXT_RANGE + 1,
                lambda k, _: stream_range_d(
                    jnp.where(k == EXT_RANGE, I32(FINE_RANGE), k), False
                ),
                0,
            )
        else:
            for i in list(range(EXT_RANGE)) + [FINE_RANGE]:
                stream_range_d(i, False)
        stream_range_d(EXT_RANGE, True)

    o = (
        (out_p0[0:COMB_USED, :] & 255)
        | ((out_p1[0:COMB_USED, :] & 255) << 8)
        | ((out_p2[0:COMB_USED, :] & 255) << 16)
        | (out_p3[0:COMB_USED, :] << 24)
    )  # (48 cols, 1024 px) distributed winner fields

    # ---------------- Phase E: interpolation ----------------
    if "e" not in phases:  # probe mode: keep output shape, skip the work
        planes_ref[0, :, :] = jnp.zeros((OUT_COLS, n_pix), I32)
        return

    # The interpolation half of shading runs here on the VMEM-resident
    # field rows via ops/shade.interp_fields_stacked — the same formulas
    # the XLA/oracle path's interp_fields applies, with the 12 attr
    # channels as ONE (12, 1024) block per corner (contiguous slices of
    # ``o``) instead of 12 single-sublane rows: bit-identical results,
    # ~8x sublane utilization on the channel math.  It shrinks the
    # planes output from 48 raw field planes to 17 (12 interpolated
    # attrs, 4 uv-derivative raws, mat).  Background pixels (all-zero
    # fields) produce the same NaN attrs the XLA interp produced from
    # the same zero planes; shade_surface masks them by visibility
    # exactly as before.
    from .shade import interp_fields_stacked

    off_c = I32(-cfg.min_coord)

    def orow(c):
        return o[c : c + 1, :]  # (1, 1024) i32

    def oxy(c):
        p = orow(c)
        return ((p & 0xFFFF) - off_c), (((p >> 16) & 0xFFFF) - off_c)

    def of32(c):
        return jax.lax.bitcast_convert_type(orow(c), F32)

    ge = {}
    ge["x0"], ge["y0"] = oxy(0)
    ge["x1"], ge["y1"] = oxy(1)
    ge["x2"], ge["y2"] = oxy(2)
    ge["inv_area2"] = of32(5)
    ge["iw0"] = of32(6)
    ge["iw1"] = of32(7)
    ge["iw2"] = of32(8)
    A0 = jax.lax.bitcast_convert_type(o[10:22, :], F32)
    A1 = jax.lax.bitcast_convert_type(o[22:34, :], F32)
    A2 = jax.lax.bitcast_convert_type(o[34:46, :], F32)
    pix = jax.lax.broadcasted_iota(I32, (1, n_pix), 1)
    pxe = tile_x * TILE_W + (pix % TILE_W)
    pye = (row0 + tile_y) * th + pix // TILE_W
    attr, duv = interp_fields_stacked(jnp, ge, A0, A1, A2, pxe, pye, cfg)

    if shade_mode is None:
        planes_ref[0, 0:12, :] = jax.lax.bitcast_convert_type(attr, I32)
        for k in range(4):
            planes_ref[0, 12 + k : 13 + k, :] = (
                jax.lax.bitcast_convert_type(duv[k], I32)
            )
        planes_ref[0, 16:17, :] = orow(9)  # mat
    else:
        _phase_f(
            planes_ref, rmeta_ref, attr, duv, orow(9), cfg=cfg,
            n_tiles=n_tiles, shade_mode=shade_mode,
        )
    # row 17: the tile-flat winner ids (phase V's result, already flat in
    # scratch) — shading consumes THIS plane for its validity mask, so the
    # pipeline never re-layouts the (H, W) vis_t output per frame (the
    # pad+reshape+transpose chain it replaces cost ~1 ms at 1080p)
    planes_ref[0, VIS_ROW : VIS_ROW + 1, :] = flat_s[:]
    # pad rows: zero-fill so the planes output never carries stale VMEM
    # bytes (bit-for-bit discipline for any future consumer/debug dump)
    planes_ref[0, VIS_ROW + 1 : OUT_COLS, :] = jnp.zeros(
        (OUT_COLS - VIS_ROW - 1, n_pix), I32
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "interpret", "tile_rows", "phases", "seg", "shade_mode",
        "packed_fine", "range_loop",
    ),
)
def rasterize_distribute(
    rmeta,
    tbl_sorted,
    tbl_ext,
    cfg: RasterConfig,
    interpret: bool = False,
    tile_rows: int | None = None,
    phases: str = "vde",
    seg: int = TILE_W,
    shade_mode=None,
    packed_fine: bool = True,
    range_loop: bool = True,
    materials=None,
    atlas=None,
    light=None,
    camera_pos=None,
):
    """Run the fused kernel over the tile grid.

    rmeta:      flattened range meta (build_range_meta);
    tbl_sorted: (S_pad, 128) i32 combined table in bin_sort streaming order
                (tritables.sorted_table);
    tbl_ext:    (P_pad, 128) i32 wide-pair extension table — range 5's
                per-tile pair runs index THIS table (base 0).  May be all
                zeros when no pair run is live (pair ranges are empty then).

    Returns (vis_d, vis_t, planes) — vis planes cropped to (height, width),
    planes (n_tiles, 24, 1024) int32 per-pixel shading planes (phase E
    layout, or the phase F layout when ``shade_mode`` is set), field-major
    per tile (no lane padding; the pipeline shades tile-flat and relayouts
    only the final RGBA).

    shade_mode: None (legacy: planes carry interpolated attrs for the XLA
    shade stage) or the static tuple (M, T, has_materials, has_atlas,
    has_light) enabling in-kernel phase F surface shading; the
    materials/atlas/light/camera_pos operands are then packed as scalar-
    prefetch constants (shade_consts_layout).
    """
    assert cfg.tile_h in (4, 8) and cfg.tile_w == TILE_W
    th = cfg.tile_h
    n_pix = th * TILE_W
    if shade_mode is not None:
        fb = lambda x: jax.lax.bitcast_convert_type(
            jnp.asarray(x, jnp.float32).ravel(), I32
        )
        ib = lambda x: jnp.asarray(x, I32).ravel()
        m_n, t_n, has_m, has_a, has_l = shade_mode
        parts = [rmeta]
        if has_m:
            parts += [
                fb(materials.base_color), ib(materials.tex_id),
                fb(materials.specular), ib(materials.shininess),
            ]
        if has_a:
            parts += [
                ib(atlas.level_offset), ib(atlas.level_w),
                ib(atlas.level_h), ib(atlas.n_levels),
            ]
        if has_l:
            parts += [
                fb(light.direction), fb(light.color),
                fb(jnp.asarray(light.ambient).reshape(1)),
            ]
        parts += [fb(camera_pos)]
        rmeta = jnp.concatenate(parts)
    assert tbl_sorted.shape[1] == TBL_COLS
    assert tbl_ext.shape[1] == TBL_COLS
    # windows stay in bounds iff the table carries >= seg pad slots past
    # the last real row (tritables.sorted_table pad_rows); window starts
    # are 8-aligned by construction, the table length need not be
    assert seg % 8 == 0
    full = tile_rows is None
    if full:
        tile_rows = cfg.grid_h
    gw = cfg.grid_w
    n_tiles = tile_rows * gw
    grid = (n_tiles,)
    if th == 8:
        vis_sd = jax.ShapeDtypeStruct((tile_rows * th, gw * TILE_W), I32)
        block = pl.BlockSpec(
            (th, TILE_W),
            lambda t, *_: (t // gw, t % gw),
            memory_space=pltpu.VMEM,
        )
    else:
        # Mosaic requires the output block's sublane dim divisible by 8 or
        # equal to the array dim; a (th, 128) block with th=4 violates it,
        # so the vis outputs go out 3-D (tile_rows, th, gw*128) with
        # (1, th, 128) blocks and are reshaped to (H, W) after the call
        vis_sd = jax.ShapeDtypeStruct((tile_rows, th, gw * TILE_W), I32)
        block = pl.BlockSpec(
            (1, th, TILE_W),
            lambda t, *_: (t // gw, 0, t % gw),
            memory_space=pltpu.VMEM,
        )
    out_shape = (
        vis_sd,
        vis_sd,
        jax.ShapeDtypeStruct((n_tiles, OUT_COLS, n_pix), I32),
    )
    planes_block = pl.BlockSpec(
        (1, OUT_COLS, n_pix),
        lambda t, *_: (t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(block, block, planes_block),
        scratch_shapes=[
            pltpu.VMEM((N_RANGES, seg, TBL_COLS), I32),
            pltpu.VMEM((seg, TBL_COLS), I32),
            pltpu.VMEM((seg, 8), I32),
            pltpu.VMEM((1, n_pix), I32),
            pltpu.VMEM((PLANE_ROWS, n_pix), I32),
            pltpu.VMEM((PLANE_ROWS, n_pix), I32),
            pltpu.VMEM((PLANE_ROWS, n_pix), I32),
            pltpu.VMEM((PLANE_ROWS, n_pix), I32),
            pltpu.VMEM((2 * 8, TILE_W), I32),  # fine window accumulators
            pltpu.SemaphoreType.DMA((N_RANGES,)),
        ],
    )
    vis_d, vis_t, planes = pl.pallas_call(
        functools.partial(
            _kernel, cfg=cfg, gw=gw, n_tiles=n_tiles, phases=phases,
            seg=seg, shade_mode=shade_mode, packed_fine=packed_fine,
            range_loop=range_loop,
        ),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(rmeta, tbl_sorted, tbl_ext)
    if th != 8:
        vis_d = vis_d.reshape(tile_rows * th, gw * TILE_W)
        vis_t = vis_t.reshape(tile_rows * th, gw * TILE_W)
    if full:
        return (
            vis_d[: cfg.height, : cfg.width],
            vis_t[: cfg.height, : cfg.width],
            planes,
        )
    return vis_d[:, : cfg.width], vis_t[:, : cfg.width], planes
