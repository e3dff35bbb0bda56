"""Sort-based triangle binning for the fused raster kernel: ONE sort, no
pair expansion, no per-pair gathers.

The round-1 binner materialized (triangle, tile) pairs with a searchsorted
expansion (~28 ms at 2^20 on v5e), a per-pair bin-table gather (~10 ms) and a
per-pair record row-gather (~26 ms).  Measured TPU costs (experiments/
cost_probe.py) show sorts are ~flat (7-11 ms up to 2^21) while gathers and
scatters scale with bytes — so the v2 design sorts ONCE and never gathers:

* Every SETUP ROW (valid triangle) gets exactly one sort key:
  ``tile(primary) * 4 + group`` where the primary tile holds the AABB's
  top-left corner and ``group`` encodes how the AABB spills into neighbor
  tiles: 0 = down+right ("dr"), 1 = right ("r"), 2 = down ("d"), 3 = none.
  Triangles spanning >2 tiles in either axis get the WIDE key; invalid rows
  get the DEAD key (sorted to the end, never streamed).
* One ``sort_key_val(key, row_index)`` produces the streaming order; group
  boundaries per tile come from a searchsorted of the (tiny) boundary-key
  table against the sorted keys.
* The raster kernel reconstructs each tile's work list as ranges of that
  order: its own full run, the ``dr+r`` prefix of the LEFT tile, the
  ``dr+r+d`` prefix of the ABOVE tile (the r-only items are a ~1% waste —
  they fail coverage), the ``dr`` prefix of the DIAGONAL tile, and the wide
  run (streamed by every tile; wide triangles are rare by construction on
  dense scenes and the coverage test keeps correctness for any count).

This makes binning budget-free: there is no max_pairs to overflow — every
(triangle, tile) overlap is streamed by construction.

Group order note: with groups ordered [dr, r, d, none] inside a tile run,
the left neighbor's wanted set {dr, r} is an exact prefix and the above
neighbor's wanted set {dr, d} costs only the tiny r group extra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from ..rtypes import TriangleSetup

I32 = np.int32

GRP_DR = 0
GRP_R = 1
GRP_D = 2
GRP_NONE = 3
N_GRP = 4

# Fine sub-tile stream (round 5): triangles with no tile spill whose pixel
# AABB fits ONE 16-lane window of their tile get a per-(tile, subcol) key
# AFTER the coarse region — the raster kernel evaluates their runs in
# window-major packed groups (8 triangles per (8, 128) evaluation instead
# of one), merging per-window with the same order-independent (d16, -id)
# reduction, so frames are bit-identical to the coarse-only stream.
# Key space: coarse [0, n_tiles*4), fine [n_tiles*4, n_tiles*12),
# wide = n_tiles*12, dead = n_tiles*12 + 1.
FINE_W = 16  # window width in pixels (one sublane row of the eval block)
N_FINE = 8  # windows per 128-px tile
KEYS_PER_TILE = N_GRP + N_FINE


def stream_keys(valid, x0, y0, x1, y1, x2, y2, cfg: RasterConfig,
                tile_row0: int = 0, tile_rows: int | None = None):
    """Per-row streaming key from setup fields: ``tile * 4 + group`` for
    in-window triangles, the wide key for >2-tile spans, the dead key
    otherwise.  The setup kernel (ops/setup_kernel.py) computes the same
    formulas in-kernel for main rows; this is the XLA form for clipped-fan
    tails and the non-meshlet path."""
    ss = cfg.subpixel_scale
    half = ss // 2
    if tile_rows is None:
        tile_rows = cfg.grid_h
    gw = cfg.grid_w
    n_tiles = tile_rows * gw
    py_lo = tile_row0 * cfg.tile_h
    py_hi = jnp.minimum((tile_row0 + tile_rows) * cfg.tile_h, cfg.height) - 1

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)

    # pixel AABB (inclusive), clamped to the window — identical arithmetic to
    # the pair binner (ops/binning.py) so coverage parity is preserved
    pxmin = jnp.maximum(0, (xmin - half + ss - 1) // ss)
    pxmax = jnp.minimum(cfg.width - 1, (xmax - half) // ss)
    pymin = jnp.maximum(py_lo, (ymin - half + ss - 1) // ss)
    pymax = jnp.minimum(py_hi, (ymax - half) // ss)

    live = valid & (pxmax >= pxmin) & (pymax >= pymin)
    tx0 = pxmin // cfg.tile_w
    tx1 = pxmax // cfg.tile_w
    ty0 = pymin // cfg.tile_h - tile_row0
    ty1 = pymax // cfg.tile_h - tile_row0

    spill_r = tx1 > tx0
    spill_d = ty1 > ty0
    wide = (tx1 - tx0 > 1) | (ty1 - ty0 > 1)
    grp = jnp.where(
        spill_r & spill_d, GRP_DR,
        jnp.where(spill_r, GRP_R, jnp.where(spill_d, GRP_D, GRP_NONE)),
    ).astype(I32)

    tile = (ty0 * gw + tx0).astype(I32)
    fine = (grp == GRP_NONE) & (pxmin // FINE_W == pxmax // FINE_W)
    subc = (pxmin // FINE_W) % (cfg.tile_w // FINE_W)
    key_fine = (n_tiles * N_GRP + tile * N_FINE + subc).astype(I32)
    key_wide = I32(n_tiles * KEYS_PER_TILE)
    key_dead = I32(n_tiles * KEYS_PER_TILE + 1)
    return jnp.where(
        live,
        jnp.where(
            wide, key_wide,
            jnp.where(fine, key_fine, tile * N_GRP + grp),
        ),
        key_dead,
    )


def stream_keys_from_aabb(valid, extx, exty, cfg: RasterConfig,
                          tile_row0: int = 0, tile_rows: int | None = None):
    """Streaming keys from the setup kernel's packed pixel-AABB extents
    (ops/setup_kernel: min | max << 16, max sign-extended, full-frame
    clamped).  Window-reclamping max(py_lo, .) / min(py_hi, .) reproduces
    stream_keys' window arithmetic exactly, so slab keys equal what a
    windowed bin over the same rows would produce."""
    if tile_rows is None:
        tile_rows = cfg.grid_h
    gw = cfg.grid_w
    n_tiles = tile_rows * gw
    py_lo = tile_row0 * cfg.tile_h
    py_hi = jnp.minimum((tile_row0 + tile_rows) * cfg.tile_h, cfg.height) - 1

    pxmin = (extx << 16) >> 16
    pxmax = extx >> 16
    pymin = jnp.maximum((exty << 16) >> 16, py_lo)
    pymax = jnp.minimum(exty >> 16, py_hi)

    live = valid & (pxmax >= pxmin) & (pymax >= pymin)
    tx0 = pxmin // cfg.tile_w
    tx1 = pxmax // cfg.tile_w
    ty0 = pymin // cfg.tile_h - tile_row0
    ty1 = pymax // cfg.tile_h - tile_row0

    spill_r = tx1 > tx0
    spill_d = ty1 > ty0
    wide = (tx1 - tx0 > 1) | (ty1 - ty0 > 1)
    grp = jnp.where(
        spill_r & spill_d, GRP_DR,
        jnp.where(spill_r, GRP_R, jnp.where(spill_d, GRP_D, GRP_NONE)),
    ).astype(I32)
    tile = (ty0 * gw + tx0).astype(I32)
    fine = (grp == GRP_NONE) & (pxmin // FINE_W == pxmax // FINE_W)
    subc = (pxmin // FINE_W) % (cfg.tile_w // FINE_W)
    key_fine = (n_tiles * N_GRP + tile * N_FINE + subc).astype(I32)
    return jnp.where(
        live,
        jnp.where(
            wide, I32(n_tiles * KEYS_PER_TILE),
            jnp.where(fine, key_fine, tile * N_GRP + grp),
        ),
        I32(n_tiles * KEYS_PER_TILE + 1),
    )


def sort_and_bounds(key, cfg: RasterConfig, tile_rows: int | None = None,
                    interpret: bool = False):
    """Sort rows by streaming key; returns (order, bounds) as bin_sort."""
    from .bincount import sorted_run_bounds

    s_rows = key.shape[0]
    if tile_rows is None:
        tile_rows = cfg.grid_h
    n_tiles = tile_rows * cfg.grid_w
    order = jnp.arange(s_rows, dtype=I32)
    key_sorted, order = jax.lax.sort_key_val(key, order)
    # run starts for every (tile, group) key + wide + dead + end sentinel:
    # the Pallas counting kernel (ops/bincount.py) — the searchsorted scan
    # it replaces cost ~0.41 us/query (2.4 ms at the headline's 8.2k bins)
    starts = sorted_run_bounds(
        key_sorted, n_tiles * KEYS_PER_TILE + 2, interpret=interpret
    )
    bounds = jnp.concatenate([starts, jnp.array([s_rows], I32)])
    return order, bounds


def bin_sort(su: TriangleSetup, cfg: RasterConfig,
             tile_row0: int = 0, tile_rows: int | None = None,
             interpret: bool = False):
    """Returns (order, bounds) for the tile-row window
    [tile_row0, tile_row0 + tile_rows):

    * order:  (S,) int32 — setup-row indices sorted by streaming key;
    * bounds: (n_tiles * 4 + 3,) int32 — start position of every
      (tile, group) run in ``order``, then the wide run start, the dead run
      start, and S.  Run [bounds[k], bounds[k+1]) holds key k's rows.
    """
    key = stream_keys(
        su.valid, su.x0, su.y0, su.x1, su.y1, su.x2, su.y2, cfg,
        tile_row0, tile_rows,
    )
    return sort_and_bounds(key, cfg, tile_rows, interpret=interpret)


def expand_wide_pairs(comb, order, bounds, cfg: RasterConfig,
                      wide_rows: int, wide_pairs: int,
                      tile_row0=0, tile_rows: int | None = None):
    """Expand the global wide run into per-tile (tile, row) pair runs.

    The wide run is streamed by EVERY tile; on zoomed/close-up frames most
    visible triangles are magnified past the 2-tile span and the kernel
    degenerates to all-tiles x all-wide-triangles (measured +98 ms on the
    headline graze frame, experiments/flyby_stage_probe.py).  This turns the
    prefix of the wide run that fits the static budgets into an exact
    (tile, row) pair list appended after ``order``; rows beyond the budgets
    stay in the (now smaller) global wide run, so correctness never depends
    on the budget — only speed does.

    comb:   (S, 128) combined table (only coord cols 0-2 are read);
    order:  (S,) sorted row ids (sort_and_bounds);
    bounds: run-bounds table (sort_and_bounds) — the wide run is
            [bounds[n_tiles*4], bounds[n_tiles*4+1]).

    Returns (pair_rows (wide_pairs,) i32 comb-row ids sorted by target tile,
    pair_starts (n_tiles+1,) i32 run starts into pair_rows, new_wide_start
    scalar i32 — the caller rewrites bounds[n_tiles*4] with it).  All outputs
    are all-zeros/unchanged when the wide run is empty (lax.cond, so static
    frames skip the expansion entirely)."""
    ss = cfg.subpixel_scale
    half = ss // 2
    if tile_rows is None:
        tile_rows = cfg.grid_h
    gw = cfg.grid_w
    n_tiles = tile_rows * gw
    py_lo = tile_row0 * cfg.tile_h
    py_hi = jnp.minimum((tile_row0 + tile_rows) * cfg.tile_h, cfg.height) - 1
    off = I32(-cfg.min_coord)
    s_rows = order.shape[0]

    ws = bounds[n_tiles * KEYS_PER_TILE]
    we = bounds[n_tiles * KEYS_PER_TILE + 1]
    n_wide = we - ws

    def live(_):
        order_p = jnp.pad(order, (0, wide_rows))
        wrows = jax.lax.dynamic_slice(order_p, (ws,), (wide_rows,))
        idx = jnp.arange(wide_rows, dtype=I32)
        live_row = idx < jnp.minimum(n_wide, wide_rows)
        crows = comb[wrows]  # (wide_rows, 128) — full-width row gather
        xs, ys = [], []
        for c in range(3):
            p = crows[:, c]
            xs.append((p & 0xFFFF) - off)
            ys.append(((p >> 16) & 0xFFFF) - off)
        xmin = jnp.minimum(jnp.minimum(xs[0], xs[1]), xs[2])
        xmax = jnp.maximum(jnp.maximum(xs[0], xs[1]), xs[2])
        ymin = jnp.minimum(jnp.minimum(ys[0], ys[1]), ys[2])
        ymax = jnp.maximum(jnp.maximum(ys[0], ys[1]), ys[2])
        # identical pixel-AABB arithmetic to stream_keys (coverage parity)
        pxmin = jnp.maximum(0, (xmin - half + ss - 1) // ss)
        pxmax = jnp.minimum(cfg.width - 1, (xmax - half) // ss)
        pymin = jnp.maximum(py_lo, (ymin - half + ss - 1) // ss)
        pymax = jnp.minimum(py_hi, (ymax - half) // ss)
        live_r = live_row & (pxmax >= pxmin) & (pymax >= pymin)
        tx0 = jnp.where(live_r, pxmin // cfg.tile_w, 0)
        tx1 = jnp.where(live_r, pxmax // cfg.tile_w, -1)
        ty0 = jnp.where(live_r, pymin // cfg.tile_h - tile_row0, 0)
        ty1 = jnp.where(live_r, pymax // cfg.tile_h - tile_row0, -1)
        ntx = tx1 - tx0 + 1
        c = jnp.where(live_r, ntx * (ty1 - ty0 + 1), 0)
        ends = jnp.cumsum(c)
        # positional cut: a row is CONSUMED when its pair run fits the
        # budget, gated on live_row (position), not live_r (recomputed
        # liveness) — dead-recomputed rows inside the prefix are consumed
        # as 0-pair rows, so the wide-run cut (ws + n_fit) can never split
        # around them and leave a consumed row in the global run (which
        # phase D would then accumulate twice)
        fits = (ends <= wide_pairs) & live_row
        n_fit = jnp.sum(fits.astype(I32))
        total_fit = jnp.sum(jnp.where(fits, c, 0))

        i_idx = jnp.arange(wide_pairs, dtype=I32)
        row_of = jnp.searchsorted(
            ends, i_idx, side="right", method="sort"
        ).astype(I32)
        in_r = i_idx < total_fit
        r = jnp.clip(row_of, 0, wide_rows - 1)
        pack = jnp.stack(
            [ends - c, jnp.maximum(ntx, 1), tx0, ty0, wrows], axis=1
        )[r]
        k = i_idx - pack[:, 0]
        dy = k // pack[:, 1]
        dx = k - dy * pack[:, 1]
        tile = (pack[:, 3] + dy) * gw + (pack[:, 2] + dx)
        tile = jnp.where(in_r, tile, n_tiles)
        tile_s, row_s = jax.lax.sort_key_val(
            tile, jnp.clip(pack[:, 4], 0, s_rows - 1)
        )
        qt = jnp.arange(n_tiles + 1, dtype=I32)
        pair_starts = jnp.searchsorted(tile_s, qt, side="left").astype(I32)
        return row_s, pair_starts, ws + n_fit

    def dead(_):
        return (
            jnp.zeros(wide_pairs, I32),
            jnp.zeros(n_tiles + 1, I32),
            ws,
        )

    return jax.lax.cond(n_wide > 0, live, dead, None)


def stream_ranges_host(bounds: np.ndarray, tile: int, gw: int, n_tiles: int):
    """Host/debug helper: the 6 position ranges tile ``tile`` streams, in
    processing order (own, above-prefix, left-prefix, diag-prefix, wide,
    own-fine).  Mirrors the kernel's range construction; used by tests and
    the numpy reference of the fused pipeline."""
    def b(k):
        return int(bounds[k])

    tx, ty = tile % gw, tile // gw
    own_end = (
        b((tile + 1) * N_GRP)
        if tile + 1 < n_tiles
        else b(n_tiles * N_GRP)  # last tile: coarse region ends where the
        # fine region starts
    )
    ranges = [(b(tile * N_GRP), own_end)]  # own full coarse run
    if ty > 0:
        a = tile - gw
        # above: wants {dr, d} = groups 0..2 inclusive (r extra, harmless)
        ranges.append((b(a * N_GRP), b(a * N_GRP + 3)))
    else:
        ranges.append((0, 0))
    if tx > 0:
        l = tile - 1
        # left: wants {dr, r} = groups 0..1 — exact prefix
        ranges.append((b(l * N_GRP), b(l * N_GRP + 2)))
    else:
        ranges.append((0, 0))
    if tx > 0 and ty > 0:
        d = tile - gw - 1
        ranges.append((b(d * N_GRP), b(d * N_GRP + 1)))  # diag: {dr}
    else:
        ranges.append((0, 0))
    # wide run
    ranges.append(
        (b(n_tiles * KEYS_PER_TILE), b(n_tiles * KEYS_PER_TILE + 1))
    )
    # own fine region (8 subcol bins, contiguous; no neighbor streams it —
    # fine triangles never spill)
    fb = n_tiles * N_GRP
    fine_end = (
        b(fb + (tile + 1) * N_FINE)
        if tile + 1 < n_tiles
        else b(n_tiles * KEYS_PER_TILE)
    )
    ranges.append((b(fb + tile * N_FINE), fine_end))
    return ranges
