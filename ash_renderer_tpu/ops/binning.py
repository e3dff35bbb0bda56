"""Triangle -> tile binning: the TPU answer to GPU fixed-function raster scaling.

The reference draws its whole scene with one ``cmd_draw_indexed``
(``src/renderer.rs:533-540``) and lets GPU hardware distribute fragments; here
the screen is split into VMEM-sized tiles and triangles are binned to the
tiles their AABB touches, so the Pallas visibility kernel streams only
relevant triangles per tile (SURVEY §5's blockwise scheduling analogue).

Pipeline (all static shapes, pure XLA):

1. per-triangle pixel AABB -> covered tile range -> pair count;
2. exclusive cumsum -> pair slots; emission by ``searchsorted`` expansion
   (pair i -> owning triangle via binary search — no dynamic scatter);
3. sort pairs by tile id (order within a tile is irrelevant: the visibility
   reduction key (d16, -draw_idx) is order-independent, so an unstable sort
   is fine and bitwise parity survives any processing order);
4. per-tile start/count tables (kernel scalar prefetch);
5. per-pair precompute: edge A/B coefficients, edge values at the pair's
   tile-corner sample, fill-rule bias bits, vertex depths, 1/area — packed
   into a (16, P) int32 record so the kernel does zero geometry setup.

Record layout — int32 array (16, P):
  0:A0 1:B0 2:A1 3:B1 4:A2 5:B2  — edge increments (per subpixel step)
  6:E0c 7:E1c 8:E2c              — edge values at tile-corner pixel sample
  9:zq0 10:zq1 11:zq2            — D16 vertex depths
  12:tri_id  13:bias bits (b0|b1<<1|b2<<2)  14-15:pad
f32 array (F32_ROWS, P): 0:inv_area2 (separate array: Mosaic has no scalar
bitcast, so float record fields get their own SMEM stream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import specmath as sm
from ..config import RasterConfig
from ..rtypes import TriangleSetup

F32 = np.float32
I32 = np.int32

RECORD_ROWS = 16
F32_ROWS = 1


def bin_triangles(su: TriangleSetup, cfg: RasterConfig, max_pairs: int,
                  tile_row0: int = 0, tile_rows: int | None = None):
    """Returns (records (16, P + pad), records_f, tile_start, tile_count,
    stats) for the tile-row window [tile_row0, tile_row0 + tile_rows) —
    windowing is how multi-chip sharding gives each device its slab of the
    framebuffer (parallel/sharding.py).  Defaults to the full grid."""
    if tile_rows is None:
        tile_rows = cfg.grid_h
    n_tiles_w = tile_rows * cfg.grid_w
    # tile_row0 may be a traced scalar (per-device slab origin in shard_map)
    py_lo = tile_row0 * cfg.tile_h
    py_hi = jnp.minimum((tile_row0 + tile_rows) * cfg.tile_h, cfg.height) - 1
    ss = cfg.subpixel_scale
    half = ss // 2
    s_rows = su.x0.shape[0]

    xmin = jnp.minimum(jnp.minimum(su.x0, su.x1), su.x2)
    xmax = jnp.maximum(jnp.maximum(su.x0, su.x1), su.x2)
    ymin = jnp.minimum(jnp.minimum(su.y0, su.y1), su.y2)
    ymax = jnp.maximum(jnp.maximum(su.y0, su.y1), su.y2)

    pxmin = jnp.maximum(0, (xmin - half + ss - 1) // ss)
    pxmax = jnp.minimum(cfg.width - 1, (xmax - half) // ss)
    pymin = jnp.maximum(py_lo, (ymin - half + ss - 1) // ss)
    pymax = jnp.minimum(py_hi, (ymax - half) // ss)

    live = su.valid & (pxmax >= pxmin) & (pymax >= pymin)
    tx0 = jnp.where(live, pxmin // cfg.tile_w, 0)
    tx1 = jnp.where(live, pxmax // cfg.tile_w, -1)
    ty0 = jnp.where(live, pymin // cfg.tile_h - tile_row0, 0)
    ty1 = jnp.where(live, pymax // cfg.tile_h - tile_row0, -1)
    ntx = tx1 - tx0 + 1
    nty = ty1 - ty0 + 1
    count = jnp.where(live, ntx * nty, 0)

    ends = jnp.cumsum(count)
    offsets = ends - count
    total = ends[-1] if s_rows else jnp.int32(0)
    overflow = jnp.maximum(total - max_pairs, 0)

    # pair i -> owning triangle (first t with ends[t] > i)
    i_idx = jnp.arange(max_pairs, dtype=I32)
    t_of = jnp.searchsorted(ends, i_idx, side="right").astype(I32)
    in_range = i_idx < jnp.minimum(total, max_pairs)
    t_c = jnp.clip(t_of, 0, s_rows - 1)
    k = i_idx - offsets[t_c]
    dy = k // jnp.maximum(ntx[t_c], 1)
    dx = k - dy * jnp.maximum(ntx[t_c], 1)
    tile = (ty0[t_c] + dy) * cfg.grid_w + (tx0[t_c] + dx)
    tile = jnp.where(in_range, tile, n_tiles_w)  # sentinel bucket at end

    tile_sorted, tri_sorted = jax.lax.sort_key_val(tile, t_c)
    tri_sorted = jnp.where(tile_sorted < n_tiles_w, tri_sorted, -1)

    tile_ids = jnp.arange(n_tiles_w, dtype=I32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(I32)
    tile_end = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(I32)
    tile_count = tile_end - tile_start

    rec_i, rec_f = _pair_records(su, tri_sorted, tile_sorted, cfg,
                                 tile_row0, n_tiles_w)
    # pad so the kernel's fixed-size aligned-window DMA never reads OOB:
    # worst window start is round_down(max_pairs) and reads tri_block + 128
    pad = cfg.tri_block + 256
    rec_i = jnp.pad(rec_i, ((0, 0), (0, pad)))
    rec_f = jnp.pad(rec_f, ((0, 0), (0, pad)))
    stats = {"pairs_total": total, "pairs_overflow": overflow}
    return rec_i, rec_f, tile_start, tile_count, stats


def _pair_records(su: TriangleSetup, tri_sorted, tile_sorted, cfg: RasterConfig,
                  tile_row0: int = 0, n_tiles_w: int | None = None):
    """Gather + precompute the (16, P) kernel records for sorted pairs."""
    if n_tiles_w is None:
        n_tiles_w = cfg.n_tiles
    ss = cfg.subpixel_scale
    half = ss // 2
    s_rows = su.x0.shape[0]
    t = jnp.clip(tri_sorted, 0, s_rows - 1)
    live = tri_sorted >= 0

    g = {
        k: getattr(su, k)[t]
        for k in "x0 y0 x1 y1 x2 y2 zq0 zq1 zq2 inv_area2".split()
    }
    a0, b0, tl0 = sm.edge_coeffs(g["x1"], g["y1"], g["x2"], g["y2"])
    a1, b1, tl1 = sm.edge_coeffs(g["x2"], g["y2"], g["x0"], g["y0"])
    a2, b2, tl2 = sm.edge_coeffs(g["x0"], g["y0"], g["x1"], g["y1"])

    tile_c = jnp.clip(tile_sorted, 0, n_tiles_w - 1)
    corner_px = (tile_c % cfg.grid_w) * cfg.tile_w
    corner_py = (tile_c // cfg.grid_w + tile_row0) * cfg.tile_h
    sx = corner_px * ss + half
    sy = corner_py * ss + half
    e0c = sm.edge_at(a0, b0, g["x1"], g["y1"], sx, sy)
    e1c = sm.edge_at(a1, b1, g["x2"], g["y2"], sx, sy)
    e2c = sm.edge_at(a2, b2, g["x0"], g["y0"], sx, sy)

    bias = (
        tl0.astype(I32) | (tl1.astype(I32) << 1) | (tl2.astype(I32) << 2)
    )
    zero = jnp.zeros_like(a0)

    rows = [
        a0, b0, a1, b1, a2, b2,
        e0c, e1c, e2c,
        g["zq0"], g["zq1"], g["zq2"],
        jnp.where(live, tri_sorted, -1), bias, zero, zero,
    ]
    rec_i = jnp.where(
        live[None, :], jnp.stack(rows, axis=0).astype(I32), 0
    )
    rec_f = jnp.where(live, g["inv_area2"], F32(0.0))[None, :]
    return rec_i, rec_f
