"""The fused Pallas visibility + shading-distribute kernel.

One grid step per framebuffer tile (tile_h=8 x tile_w=128).  Replaces the
round-1 chain [pair-record gather -> visibility kernel -> per-pixel setup
gather -> 3 per-pixel attr gathers] whose XLA scalar-path gathers dominated
the frame (~120 ms at 1080p/1.31M tris).  Everything random-access happens
ON-CHIP as exact one-hot int8 MXU matmuls:

Phase V (visibility):
  * stream the tile's work list as position ranges of the bin_sort order
    (own run + neighbor prefixes + wide run — ops/binsort.py);
  * per 128-slot window: DMA the ids, then gather each slot's T_RAS row by
    windowed one-hot matmul over the byte-interleaved (S,128)-i8 table
    (indices ascend within each (tile,group) run, so a few Wt-row windows
    cover a window's id span);
  * evaluate 16 groups of 8 triangles (triangles in SUBLANES, the tile's
    128 pixel columns in LANES, 8 pixel rows swept with incremental edge
    updates) — exact int32 edges + the specmath D16 depth chain;
  * winner per pixel by the order-independent (d16, -tri_id) key: sublane
    min/max reductions within a group, compare-select merges across.

Phase D (shading distribute):
  * re-stream the same ranges; one-hot match each slot's triangle id against
    the tile's winner plane (each id binned at most once per tile, so every
    covered pixel matches exactly one slot);
  * gather the T_DIST row bytes (transposed byte planes) per slot and
    matmul-distribute them to the 1024 tile pixels, accumulating int32 byte
    planes that reassemble into the 44 per-pixel shading fields
    (coords/inv_area/iw/mat/attr-corners) — the planes the XLA shading stage
    (ops/shade.shade_gathered) consumes with bit-identical math to the
    oracle's gather path.

Exactness invariants: one-hot x int8 -> int32 matmuls reproduce bytes
exactly; int32 edge/coverage arithmetic is modular-exact under any
association; empty slots gather all-zero rows whose degenerate coverage
test is false, so they never win or distribute.
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
from .binsort import N_GRP
from .tritables import DIST_FIELDS, RAS_FIELDS

F32 = np.float32
I32 = np.int32
I8 = np.int8

WT = 512  # table window rows per gather matmul
N_RANGES = 5
RMETA_COLS = 4  # rs, re, base128, nw per (tile, range)
TILE_H = 8
TILE_W = 128
N_PIX = TILE_H * TILE_W


def build_range_meta(order, bounds, n_tiles: int, gw: int):
    """(n_tiles * 5 * 4,) int32: [rs, re, base128, nw] per (tile, range).

    base/span come from per-group first/last ids (ids ascend within each
    (tile,group) run; ranges span whole groups, so min(first), max(last)
    bound every id in the range)."""
    s = order.shape[0]
    t = jnp.arange(n_tiles, dtype=I32)
    tx = t % gw
    ty = t // gw

    specs = [
        (N_GRP * t, 4, jnp.full_like(t, True, dtype=bool)),
        (N_GRP * (t - gw), 3, ty > 0),
        (N_GRP * (t - 1), 2, tx > 0),
        (N_GRP * (t - gw - 1), 1, (tx > 0) & (ty > 0)),
        (jnp.full_like(t, N_GRP * n_tiles), 1, jnp.full_like(t, True, bool)),
    ]
    cols = []
    nb = bounds.shape[0]
    for lo, ng, valid in specs:
        rs = jnp.where(valid, bounds[jnp.clip(lo, 0, nb - 1)], 0)
        re = jnp.where(valid, bounds[jnp.clip(lo + ng, 0, nb - 1)], 0)
        gmin = jnp.full_like(t, np.iinfo(np.int32).max)
        gmax = jnp.full_like(t, -1)
        for gi in range(4):
            if gi >= ng:
                break
            gs = bounds[jnp.clip(lo + gi, 0, nb - 1)]
            ge = bounds[jnp.clip(lo + gi + 1, 0, nb - 1)]
            has = valid & (ge > gs)
            first = order[jnp.clip(gs, 0, s - 1)]
            last = order[jnp.clip(ge - 1, 0, s - 1)]
            gmin = jnp.where(has, jnp.minimum(gmin, first), gmin)
            gmax = jnp.where(has, jnp.maximum(gmax, last), gmax)
        nonempty = (re > rs) & (gmax >= 0)
        base = jnp.where(nonempty, (gmin // 128) * 128, 0)
        span = jnp.where(nonempty, gmax - base + 1, 0)
        nw = jnp.where(nonempty, -(-span // WT), 0)
        rs = jnp.where(nonempty, rs, 0)
        re = jnp.where(nonempty, re, 0)
        cols.append(jnp.stack([rs, re, base, nw], axis=1))
    meta = jnp.stack(cols, axis=1)  # (n_tiles, 5, 4)
    return meta.reshape(-1)


def _kernel(
    rmeta_ref,
    order_ref,
    ras_ref,
    dist_ref,
    vis_d_ref,
    vis_t_ref,
    planes_ref,
    ids_s,
    minmax_s,
    recs_s,
    ras_win,
    dist_win,
    flat_s,
    out_tb,
    sem_ids,
    sem_ras,
    sem_dist,
    *,
    cfg: RasterConfig,
    gw: int,
):
    t = pl.program_id(0)
    tile_x = t % gw
    tile_y = t // gw
    ss = cfg.subpixel_scale
    half = ss // 2
    min_c = I32(cfg.min_coord)
    sx0 = (tile_x * TILE_W) * ss + half  # tile-corner pixel sample coords
    sy0 = (tile_y * TILE_H) * ss + half

    colp = jax.lax.broadcasted_iota(I32, (1, TILE_W), 1)
    lanei = colp

    def range_scalars(i):
        b = (t * N_RANGES + i) * RMETA_COLS
        return (
            rmeta_ref[b],
            rmeta_ref[b + 1],
            rmeta_ref[b + 2],
            rmeta_ref[b + 3],
        )

    def load_ids(pos, re):
        """DMA + align the 128 ids at sorted positions [pos, pos+128);
        lanes beyond re get rel -1 (gather no row, never cover).  Also
        returns (k0, k1): the WT-window indices (relative to the range base)
        actually touched by this segment's ids — windows follow the ids, so
        a segment costs O(its own id span), not O(the whole range span)."""
        ab = pl.multiple_of((pos // 128) * 128, 128)
        cp = pltpu.make_async_copy(
            order_ref.at[:, pl.ds(ab, 256)], ids_s, sem_ids
        )
        cp.start()
        cp.wait()
        jofs = pos - ab
        shift = jnp.where(jofs == 0, 0, 256 - jofs)
        ids128 = pltpu.roll(ids_s[:], shift, 1)[:, 0:TILE_W]
        valid = lanei < (re - pos)
        # segment id bounds -> traced scalars via a scratch round-trip (the
        # only way off the vector unit; static element reads are legal)
        big = I32(np.iinfo(np.int32).max)
        idmin = jnp.min(jnp.where(valid, ids128, big), axis=1, keepdims=True)
        idmax = jnp.max(jnp.where(valid, ids128, I32(-1)), axis=1,
                        keepdims=True)
        minmax_s[0:1, 0:1] = idmin
        minmax_s[0:1, 1:2] = idmax
        return ids128, valid, minmax_s[0, 0], minmax_s[0, 1]

    def gather_ras(rel_t, base, k0, k1):
        """(128, 8) int32 rows of T_RAS for relative ids rel_t (128,1)."""

        def win_body(k, recs_b):
            # base is 128-rounded in rmeta and WT is a 128-multiple; the
            # compiler needs the divisibility hint to lower the slice
            off = pl.multiple_of(base + k * WT, 128)
            cp = pltpu.make_async_copy(
                ras_ref.at[pl.ds(off, WT), :], ras_win, sem_ras
            )
            cp.start()
            ohrel = rel_t - k * WT
            iw = jax.lax.broadcasted_iota(I32, (TILE_W, WT), 1)
            oh = (iw == ohrel).astype(I8)
            cp.wait()
            return recs_b + jnp.dot(
                oh, ras_win[:], preferred_element_type=I32
            )

        recs_b = jnp.zeros((TILE_W, 128), I32)
        recs_b = jax.lax.fori_loop(k0, k1 + 1, win_body, recs_b)
        # Reassemble int32 fields from the byte-plane columns.  Non-zero
        # lane-offset slices of matmul results MISCOMPILE on this Mosaic
        # version (measured: byte planes 2-3 corrupt); circular lane rolls +
        # a zero-offset slice produce exact results, so align every plane to
        # lane 0 first.
        nf = RAS_FIELDS
        r1 = pltpu.roll(recs_b, 128 - nf, 1)
        r2 = pltpu.roll(recs_b, 128 - 2 * nf, 1)
        r3 = pltpu.roll(recs_b, 128 - 3 * nf, 1)
        full = (
            (recs_b & 255)
            | ((r1 & 255) << 8)
            | ((r2 & 255) << 16)
            | (r3 << 24)
        )
        return full[:, 0:nf]

    def unpack16(p):
        return ((p & 0xFFFF) + min_c), (((p >> 16) & 0xFFFF) + min_c)

    def eval_group(blk, ids_g, acc):
        """8 triangles (sublanes) x 128 columns x 8 swept rows.
        blk: (8, RAS_FIELDS) records; ids_g: (8, 1) triangle ids."""
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

        for r in range(TILE_H):
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
            if r + 1 < TILE_H:
                e0 = e0 + bss0
                e1 = e1 + bss1
                e2 = e2 + bss2
        return acc_d, acc_t

    # ---------------- Phase V: visibility ----------------
    acc_d = [jnp.full((1, TILE_W), sm.DEPTH_MAX, I32) for _ in range(TILE_H)]
    acc_t = [jnp.full((1, TILE_W), sm.BG_TRI, I32) for _ in range(TILE_H)]
    acc = tuple(acc_d + acc_t)

    for rng_i in range(N_RANGES):
        rs, re, base, nw = range_scalars(rng_i)
        nsw = -(-(re - rs) // TILE_W)

        def sw_body(w, acc, rs=rs, re=re, base=base):
            pos = rs + w * TILE_W
            ids128, valid, idmin, idmax = load_ids(pos, re)
            rel = jnp.where(valid, ids128 - base, I32(-1))
            rel_t = rel.reshape(TILE_W, 1)
            ids_t = rel_t + base
            k0 = (idmin - base) // WT
            k1 = (idmax - base) // WT
            recs = gather_ras(rel_t, base, k0, k1)
            # park records in scratch so the group loop can bound itself by
            # the VALID slot count (neighbor-prefix segments are tiny; the
            # all-padding groups would otherwise still pay full eval)
            recs_s[:, 0:RAS_FIELDS] = recs
            recs_s[:, RAS_FIELDS : RAS_FIELDS + 1] = ids_t
            ng = -(-jnp.minimum(re - pos, TILE_W) // 8)

            def grp_body(g, acc):
                off = pl.multiple_of(8 * g, 8)
                blk = recs_s[pl.ds(off, 8), 0:RAS_FIELDS]
                ids_g = recs_s[pl.ds(off, 8), RAS_FIELDS : RAS_FIELDS + 1]
                acc_d, acc_t = eval_group(
                    blk, ids_g, (list(acc[:TILE_H]), list(acc[TILE_H:]))
                )
                return tuple(acc_d + acc_t)

            return jax.lax.fori_loop(0, ng, grp_body, acc)

        acc = jax.lax.fori_loop(0, nsw, sw_body, acc)

    acc_d = list(acc[:TILE_H])
    acc_t = list(acc[TILE_H:])
    vis_d_ref[:] = jnp.concatenate(acc_d, axis=0)
    vis_t_ref[:] = jnp.concatenate(acc_t, axis=0)

    # ---------------- Phase D: shading distribute ----------------
    for r in range(TILE_H):
        flat_s[0:1, TILE_W * r : TILE_W * (r + 1)] = acc_t[r]
    flatv = flat_s[:]  # (1, 1024) winner tri ids

    out_tb[...] = jnp.zeros((4 * DIST_FIELDS, N_PIX), I32)

    for rng_i in range(N_RANGES):
        rs, re, base, nw = range_scalars(rng_i)
        nsw = -(-(re - rs) // TILE_W)

        def swd_body(w, _, rs=rs, re=re, base=base):
            pos = rs + w * TILE_W
            ids128, valid, idmin, idmax = load_ids(pos, re)
            rel = jnp.where(valid, ids128 - base, I32(-1))
            rel_t = rel.reshape(TILE_W, 1)
            k0 = (idmin - base) // WT
            k1 = (idmax - base) // WT
            oh_d = ((rel_t + base == flatv) & (rel_t >= 0)).astype(I8)

            def win_body(k, recs_ts):
                off = pl.multiple_of(base + k * WT, 128)
                cp = pltpu.make_async_copy(
                    dist_ref.at[:, pl.ds(off, WT)],
                    dist_win,
                    sem_dist,
                )
                cp.start()
                iw = jax.lax.broadcasted_iota(I32, (WT, TILE_W), 0)
                ohg = (iw == (rel - k * WT)).astype(I8)  # (WT, 128)
                cp.wait()
                return recs_ts + jnp.dot(
                    dist_win[:], ohg, preferred_element_type=I32
                )

            # (192, 128): all 4 byte planes of this window's records
            recs_ts = jnp.zeros((4 * DIST_FIELDS, TILE_W), I32)
            recs_ts = jax.lax.fori_loop(k0, k1 + 1, win_body, recs_ts)
            out_tb[...] = out_tb[...] + jnp.dot(
                recs_ts.astype(I8), oh_d, preferred_element_type=I32
            )
            return 0

        jax.lax.fori_loop(0, nsw, swd_body, 0)

    o = out_tb[...]
    f = DIST_FIELDS
    planes_ref[0] = (
        (o[0:f] & 255)
        | ((o[f : 2 * f] & 255) << 8)
        | ((o[2 * f : 3 * f] & 255) << 16)
        | (o[3 * f : 4 * f] << 24)
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "tile_rows")
)
def rasterize_distribute(
    order,
    rmeta,
    ras_b,
    dist_p,
    cfg: RasterConfig,
    interpret: bool = False,
    tile_rows: int | None = None,
):
    """Run the fused kernel over the tile grid.

    order:  (1, S_pad) i32 sorted row ids (binsort order, padded >= +256);
    rmeta:  flattened range meta (build_range_meta);
    ras_b:  (S_pad2, 128) i8 visibility table bytes (tritables.ras_bytes);
    dist_p: (192, S_pad2) i8 distribute byte planes (tritables layout).

    Returns (vis_d, vis_t, planes) — vis planes cropped to (height, width),
    planes (n_tiles, 44, 1024) int32 per-pixel shading fields (uncropped
    tile-flat layout; the pipeline unpacks and crops).
    """
    assert cfg.tile_h == TILE_H and cfg.tile_w == TILE_W
    full = tile_rows is None
    if full:
        tile_rows = cfg.grid_h
    gw = cfg.grid_w
    n_tiles = tile_rows * gw
    grid = (n_tiles,)
    out_shape = (
        jax.ShapeDtypeStruct((tile_rows * TILE_H, gw * TILE_W), I32),
        jax.ShapeDtypeStruct((tile_rows * TILE_H, gw * TILE_W), I32),
        jax.ShapeDtypeStruct((n_tiles, DIST_FIELDS, N_PIX), I32),
    )
    block = pl.BlockSpec(
        (TILE_H, TILE_W),
        lambda t, *_: (t // gw, t % gw),
        memory_space=pltpu.VMEM,
    )
    planes_block = pl.BlockSpec(
        (1, DIST_FIELDS, N_PIX),
        lambda t, *_: (t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(block, block, planes_block),
        scratch_shapes=[
            pltpu.VMEM((1, 256), I32),
            pltpu.VMEM((1, 128), I32),
            pltpu.VMEM((TILE_W, 16), I32),
            pltpu.VMEM((WT, 128), I8),
            pltpu.VMEM((4 * DIST_FIELDS, WT), I8),
            pltpu.VMEM((1, N_PIX), I32),
            pltpu.VMEM((4 * DIST_FIELDS, N_PIX), I32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    vis_d, vis_t, planes = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, gw=gw),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(rmeta, order, ras_b, dist_p)
    if full:
        return (
            vis_d[: cfg.height, : cfg.width],
            vis_t[: cfg.height, : cfg.width],
            planes,
        )
    return vis_d[:, : cfg.width], vis_t[:, : cfg.width], planes
