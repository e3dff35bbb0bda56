"""Per-triangle tables for the fused raster+shade kernel.

The fused kernel (ops/fused_kernel.py) streams per-triangle records as
CONTIGUOUS slot-major slices of ONE table pre-gathered into bin_sort
streaming order — measured on hardware, one XLA row-gather of the combined
table (~25 ms at 1.4M rows) beats any in-kernel gather scheme (windowed
one-hot matmuls paid ~48 serialized window DMAs per 128-slot segment at the
headline workload), and a single slot-major layout lets the kernel derive
byte planes on-chip instead of reading a second transposed table.

Table layout — ``sorted_table`` returns (S_pad, 128) int32, row = one
streamed slot (XLA:TPU pads minor dims to the 128-lane tile anyway, so the
logical pad costs no extra HBM; it buys legal 128-wide DMA slices):

    0-2  pack16 coords (x - min_coord, y - min_coord; the guard rect bounds
         the extent under 2^16 subpixels)
    3    zq0 | zq1<<16     4  zq2
    5    inv_area2 bits
    6-8  iw0-2 bits        9  mat
    10-45  attr corners (a_v0 | a_v1 | a_v2, 12 f32 each)
    46   the slot's setup-row id (= bin_sort order)
    47-127  zero

Phase V of the kernel consumes cols 0-5 + 46; phase D matmul-distributes
byte planes of cols 0-127 to the winning pixels (the junk cols are zero and
the id plane is a free debug channel).

Attr-corner assembly is one row-gather per corner here (XLA); the meshlet
MXU-gather path replaces it on TPU (ops/meshlet_gather.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import specmath as sm
from ..config import RasterConfig
from ..rtypes import TriangleSetup

I32 = np.int32
I8 = np.int8

COMB_FIELDS = 46
TBL_COLS = 128
ID_COL = 46


def _pack16(a, b):
    """Two non-negative 16-bit ints into one int32 (a low, b high)."""
    return a | (b << 16)


def build_comb_table(su: TriangleSetup, attrs, cfg: RasterConfig,
                     local_tri=None, interpret: bool = False):
    """(S, 128) int32 combined table, one row per setup slot (layout above;
    col 46 = the row's own index, cols 47+ zero).

    attrs: (VA, 12) f32 combined attribute rows (geometry.ATTR layout).
    Attr-corner assembly: with meshlet-local indices (local_tri), the main
    triangles' three corner rows come from the exact one-hot MXU gather
    (ops/meshlet_gather.gather_tri_rows, ~7x the XLA scalar-path gather at
    this width); only the small clipped-fan tail uses XLA gathers.  Without
    meshlets, plain XLA row-gathers (the CPU/reference path)."""
    off = I32(-cfg.min_coord)
    if local_tri is not None:
        from . import meshlet_gather
        from ..scene import MESHLET_TRIS, MESHLET_VERTS

        t_main = local_tri.shape[0]
        v_main = (t_main // MESHLET_TRIS) * MESHLET_VERTS
        a3 = meshlet_gather.gather_tri_rows(
            sm._bitcast_i32(attrs[:v_main], jnp), local_tri, interpret
        )  # (T, 36) i32, corner k at cols [12k, 12k+12)
        a3 = sm._bitcast_f32(a3, jnp)
        tail0 = attrs[su.v0[t_main:]]
        tail1 = attrs[su.v1[t_main:]]
        tail2 = attrs[su.v2[t_main:]]
        # geometry rewinds front faces 0,2,1 (su.v1 = original corner 2,
        # su.v2 = corner 1 — ops/geometry._finish_tri); match it here
        a_v0 = jnp.concatenate([a3[:, 0:12], tail0], axis=0)
        a_v1 = jnp.concatenate([a3[:, 24:36], tail1], axis=0)
        a_v2 = jnp.concatenate([a3[:, 12:24], tail2], axis=0)
    else:
        a_v0 = attrs[su.v0]  # (S, 12)
        a_v1 = attrs[su.v1]
        a_v2 = attrs[su.v2]
    return comb_rows(su, a_v0, a_v1, a_v2, cfg)


def comb_rows(f, a_v0, a_v1, a_v2, cfg: RasterConfig, id_base: int = 0):
    """Pack setup fields + per-corner attribute rows into (N, 128) comb
    rows (layout in the module docstring).  ``f`` needs attributes
    x0..y2, zq0..zq2, inv_area2, iw0..iw2, mat (TriangleSetup or any
    field-dict-like); ids are ``id_base + row``."""
    if isinstance(f, dict):
        import types

        f = types.SimpleNamespace(**f)
    off = I32(-cfg.min_coord)
    cols = [
        _pack16(f.x0 + off, f.y0 + off),
        _pack16(f.x1 + off, f.y1 + off),
        _pack16(f.x2 + off, f.y2 + off),
        _pack16(f.zq0, f.zq1),
        f.zq2,
        sm._bitcast_i32(f.inv_area2, jnp),
        sm._bitcast_i32(f.iw0, jnp),
        sm._bitcast_i32(f.iw1, jnp),
        sm._bitcast_i32(f.iw2, jnp),
        f.mat,
    ]
    head = jnp.stack(cols, axis=1)  # (N, 10)
    s = head.shape[0]
    # the id column is the row index, so gathering row order[i] puts
    # order[i] itself at ID_COL — the sorted table needs no post-gather
    # fix-up (measured: a full-width (S, 128) row gather runs ~4.5x faster
    # than a 46-wide one AND skips a ~12 ms lane-offset concat)
    ids = id_base + jnp.arange(s, dtype=I32)[:, None]
    zpad = jnp.zeros((s, TBL_COLS - COMB_FIELDS - 1), I32)
    return jnp.concatenate(
        [
            head,
            sm._bitcast_i32(a_v0, jnp),
            sm._bitcast_i32(a_v1, jnp),
            sm._bitcast_i32(a_v2, jnp),
            ids,
            zpad,
        ],
        axis=1,
    )  # (N, 128)


def sorted_table(comb, order, pad_rows: int):
    """Gather the combined (S, 128) table into streaming order:
    (S_pad, 128) int32.

    order: (S,) int32 sorted row ids (ops/binsort.bin_sort); pad_rows:
    extra slots so every 128-aligned segment window stays in bounds
    (>= 256).  Pad slots repeat row S-1 (their id matches no winner because
    pad positions lie outside every range's [rs, re) and the kernel masks
    them)."""
    s = comb.shape[0]
    order_p = jnp.pad(order, (0, pad_rows), constant_values=s - 1)
    return comb[jnp.clip(order_p, 0, s - 1)]


def budget_cuts(n: int, fracs) -> list[int]:
    """The static prefix cuts sorted_table_budgeted chooses from for a
    padded table of ``n`` rows: each frac rounded up to a multiple of 8
    (DMA-window sublane alignment), deduplicated/increasing, cuts >= n
    dropped (they would not split anything).  Factored out so the tier-
    boundary test sweeps the exact production cuts."""
    qs = []
    for frac in fracs:
        q = min(-(-int(n * frac) // 8) * 8, n)
        if q > 0 and (not qs or q > qs[-1]) and q < n:
            qs.append(q)
    return qs


def sorted_table_budgeted(comb, order, pad_rows: int, live_end,
                          fracs=(0.25, 0.5)):
    """sorted_table, but the gather stops at a static cut >= the LIVE row
    count and zero-fills the rest.

    The kernel only ever streams positions < the dead-run start (every
    range — own/neighbor/wide — lies before the dead key in the sort), yet
    the plain gather fetches all S rows.  XLA row-gathers are row-count-
    bound (~17 us / 1k rows on v5e), so at the headline (1.37 M rows,
    ~330 k live) ~75%% of the gather is dead weight.  lax.switch picks the
    smallest static prefix (``fracs`` of the table, then full) covering
    ``live_end`` (the dead-run start from sort_and_bounds, or the live pair
    count for the wide-pair extension table); rows below the cut are
    gathered identically, rows above are zero-filled (never streamed — the
    memset costs HBM-write bandwidth the full table paid anyway).
    Bit-identical frames for ANY live count: overflow past a cut just
    selects the next branch."""
    s = comb.shape[0]
    order_p = jnp.pad(order, (0, pad_rows), constant_values=s - 1)
    n = order_p.shape[0]
    qs = budget_cuts(n, fracs)
    if not qs:  # tiny tables: no useful split
        return comb[jnp.clip(order_p, 0, s - 1)]

    def prefix(q):
        def f(_):
            g = comb[jnp.clip(order_p[:q], 0, s - 1)]
            return jnp.concatenate(
                [g, jnp.zeros((n - q, comb.shape[1]), comb.dtype)], axis=0
            )

        return f

    def full(_):
        return comb[jnp.clip(order_p, 0, s - 1)]

    case = sum(
        (live_end > q).astype(jnp.int32) for q in qs
    )
    return jax.lax.switch(
        case, [prefix(q) for q in qs] + [full], None
    )


def unpack_coord_planes(packed, cfg: RasterConfig):
    """Inverse of _pack16 for per-pixel coordinate planes."""
    off = I32(-cfg.min_coord)
    x = (packed & 0xFFFF) - off
    y = ((packed >> 16) & 0xFFFF) - off
    return x, y
