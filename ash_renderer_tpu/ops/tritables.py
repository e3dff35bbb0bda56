"""Per-triangle tables for the fused raster+shade kernel.

The fused kernel (ops/fused_kernel.py) never receives materialized per-pair
records: it gathers per-triangle rows ON-CHIP with windowed one-hot int8
matmuls (exact: one-hot x byte -> int32 accumulate reproduces bytes), which
measured ~20x cheaper than XLA's scalar-path row gathers at these widths.
This module builds the two HBM-resident tables those gathers read:

* T_RAS (S, 8) int32 — everything the visibility sweep needs, 32 B/row:
    0 pack16(x0,y0)  1 pack16(x1,y1)  2 pack16(x2,y2)   (coords - min_coord,
      16 bits each: the guard rect bounds the extent under 2^15 subpixels)
    3 zq0 | zq1<<16  4 zq2            5 inv_area2 bits  6,7 zero
  Edge coefficients, tile-corner edge values and top-left bits are derived
  in-kernel from the coords (exact int32 arithmetic, identical values to
  specmath.edge_coeffs/edge_at).

* T_DIST (S, 44) int32 — everything deferred shading needs per winning
  pixel, stored as 4 TRANSPOSED byte planes (4, 44, S) int8 so the kernel's
  distribute matmuls read lane-major windows:
    0-2 packed coords  3 inv_area2  4-6 iw0-2  7 mat  8-43 attr corners
    (a_v0 | a_v1 | a_v2, 12 f32 each — the table the old pipeline gathered
    per PIXEL three times, ~93 ms/frame at 1080p).

Attr-corner assembly is one row-gather per corner here (XLA); the meshlet
MXU-gather path replaces it on TPU (ops/meshlet_gather.py evolution).
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

RAS_FIELDS = 8
DIST_FIELDS = 48  # 44 used + 4 zero spares (8-aligned sublane plane strides)
DIST_USED = 44


def _pack16(a, b):
    """Two non-negative 16-bit ints into one int32 (a low, b high)."""
    return a | (b << 16)


def build_ras_table(su: TriangleSetup, cfg: RasterConfig):
    """(S, 8) int32 visibility table (coords offset by -min_coord)."""
    off = I32(-cfg.min_coord)
    z = jnp.zeros_like(su.x0)
    cols = [
        _pack16(su.x0 + off, su.y0 + off),
        _pack16(su.x1 + off, su.y1 + off),
        _pack16(su.x2 + off, su.y2 + off),
        _pack16(su.zq0, su.zq1),
        su.zq2,
        sm._bitcast_i32(su.inv_area2, jnp),
        z,
        z,
    ]
    return jnp.stack(cols, axis=1)


def build_dist_table(su: TriangleSetup, attrs, cfg: RasterConfig,
                     local_tri=None, interpret: bool = False):
    """(S, 48) int32 shading table; attrs: (VA, 12) f32 combined attribute
    rows (geometry.ATTR layout).

    Attr-corner assembly: with meshlet-local indices (local_tri), the main
    triangles' three corner rows come from the exact one-hot MXU gather
    (ops/meshlet_gather.gather_tri_rows, ~7x the XLA scalar-path gather at
    this width); only the small clipped-fan tail uses XLA gathers.  Without
    meshlets, plain XLA row-gathers (the CPU/reference path)."""
    off = I32(-cfg.min_coord)
    if local_tri is not None:
        from . import meshlet_gather
        from .. import specmath as _sm

        from ..scene import MESHLET_TRIS, MESHLET_VERTS

        t_main = local_tri.shape[0]
        v_main = (t_main // MESHLET_TRIS) * MESHLET_VERTS
        a3 = meshlet_gather.gather_tri_rows(
            _sm._bitcast_i32(attrs[:v_main], jnp), local_tri, interpret
        )  # (T, 3, 12) i32
        a3 = _sm._bitcast_f32(a3, jnp)
        tail0 = attrs[su.v0[t_main:]]
        tail1 = attrs[su.v1[t_main:]]
        tail2 = attrs[su.v2[t_main:]]
        # geometry rewinds front faces 0,2,1 (su.v1 = original corner 2,
        # su.v2 = corner 1 — ops/geometry._finish_tri); match it here
        a_v0 = jnp.concatenate([a3[:, 0, :], tail0], axis=0)
        a_v1 = jnp.concatenate([a3[:, 2, :], tail1], axis=0)
        a_v2 = jnp.concatenate([a3[:, 1, :], tail2], axis=0)
    else:
        a_v0 = attrs[su.v0]  # (S, 12)
        a_v1 = attrs[su.v1]
        a_v2 = attrs[su.v2]
    cols = [
        _pack16(su.x0 + off, su.y0 + off),
        _pack16(su.x1 + off, su.y1 + off),
        _pack16(su.x2 + off, su.y2 + off),
        sm._bitcast_i32(su.inv_area2, jnp),
        sm._bitcast_i32(su.iw0, jnp),
        sm._bitcast_i32(su.iw1, jnp),
        sm._bitcast_i32(su.iw2, jnp),
        su.mat,
    ]
    head = jnp.stack(cols, axis=1)  # (S, 8)
    body = jnp.concatenate(
        [
            sm._bitcast_i32(a_v0, jnp),
            sm._bitcast_i32(a_v1, jnp),
            sm._bitcast_i32(a_v2, jnp),
        ],
        axis=1,
    )  # (S, 36)
    pad = jnp.zeros((head.shape[0], DIST_FIELDS - DIST_USED), I32)
    return jnp.concatenate([head, body, pad], axis=1)


def ras_bytes(tras, pad_rows: int):
    """(S+pad, 128) int8 byte-plane-major rows for the visibility gather:
    columns [8k, 8k+8) hold byte k of the 8 fields, the rest is zero pad.
    Minor dim 128 keeps the HBM layout unpadded (narrower i8 minors pad to
    128 lanes anyway and non-128 slices crash the Mosaic pipeline), and the
    kernel reassembles int32 fields from four CONTIGUOUS 8-wide lane slices
    of the one-hot matmul result — no strided ops."""
    s = tras.shape[0]
    cols = []
    for k in range(4):
        p = ((tras >> (8 * k)) & 0xFF).astype(jnp.uint8).astype(I8)
        cols.append(p)
    b = jnp.concatenate(cols, axis=1)  # (S, 32)
    b = jnp.pad(b, ((0, pad_rows), (0, 128 - 4 * RAS_FIELDS)))
    return b


def dist_byte_planes(tdist, pad_rows: int):
    """(4 * 48, S+pad) int8 transposed byte planes for distribute windows:
    row 48*k + f holds byte k of field f.  A flat 2D layout with 8-aligned
    plane strides — 3D int8 HBM arrays with lane-dim slicing crash the
    Mosaic pipeline, and one (192, Wt) DMA feeds one gather matmul."""
    planes = []
    for k in range(4):
        p = ((tdist >> (8 * k)) & 0xFF).astype(jnp.uint8).astype(I8)
        planes.append(p.T)  # (48, S)
    out = jnp.concatenate(planes, axis=0)  # (192, S)
    return jnp.pad(out, ((0, 0), (0, pad_rows)))


def unpack_coord_planes(packed, cfg: RasterConfig):
    """Inverse of _pack16 for per-pixel coordinate planes."""
    off = I32(-cfg.min_coord)
    x = (packed & 0xFFFF) - off
    y = ((packed >> 16) & 0xFFFF) - off
    return x, y
