"""Lane-parallel visibility kernel (v2, EXPERIMENTAL): exact column sweep.

Status: bit-identical to the v1 kernel on TPU but ~2.7x slower at the
benchmark workload — the per-column cross-lane winner reduction (min d16
then max tri over 128 lanes, x128 columns) costs more than v1's per-triangle
scalar broadcasts.  Kept as the starting point for the round-2 kernel work
(the fix is amortizing reductions across columns, or the MXU formulation —
see DESIGN.md roadmap).  Selectable via RasterConfig.lane_kernel.


Same semantics as ops/raster_pallas.py (bit-identical output), restructured
for the VPU: the v1 kernel broadcasts ~14 record scalars per triangle
(~135 of its ~215 cycles/pair); here a block of 128 binned pairs lives in
VECTOR LANES — A/B/E-corner/depth/tri-id of 128 triangles are (1,128)
vectors read straight from the DMA'd record block — and the (8,128) tile is
swept column by column:

  per block:  RT_i(8,128) = y_sub * B_i  (y_sub already in subpixels)
  per column: E_i(8,128) = RT_i + Ecur_i;  Ecur_i += A_i * subpix
              cov = (E_0 >= t_0) & ... & lane_valid
              d16 = round(((E0*z0 + E1*z1) + E2*z2) * inv_area)   [spec op]
              column winner: min d16 over lanes, then max tri_id among ties
              merge into the tile accumulator via a lane-mask select

All arithmetic is the identical exact spec (int32 edges, f32 depth chain),
so parity with the oracle is preserved bit-for-bit; only the evaluation
ORDER changes, which the order-independent (d16, -idx) reduction makes
invisible.  Unaligned per-tile record runs are handled by processing
128-lane windows from the aligned base with a lane-validity mask (stranger
lanes from neighboring tiles simply never win) — no binning changes needed.

Requires cfg.tile_h == 8 (one vreg of sublanes per column).
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
from .binning import F32_ROWS, RECORD_ROWS

F32 = np.float32
I32 = np.int32

LB = 128  # pairs per lane block


def _kernel(start_ref, count_ref, rec_hbm, recf_hbm, vis_d_ref, vis_t_ref,
            scratch, scratch_f, sems, sems_f, *, cfg: RasterConfig):
    tile = pl.program_id(0)
    start = start_ref[tile]
    count = count_ref[tile]
    ss = cfg.subpixel_scale
    th, tw = cfg.tile_h, cfg.tile_w

    wbase = (start // LB) * LB
    nwin = pl.cdiv(start + count - wbase, LB)

    def dma(slot, b):
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(wbase + b * LB, LB)],
            scratch.at[slot],
            sems.at[slot],
        )

    def dma_f(slot, b):
        return pltpu.make_async_copy(
            recf_hbm.at[:, pl.ds(wbase + b * LB, LB)],
            scratch_f.at[slot],
            sems_f.at[slot],
        )

    acc_d = jnp.full((th, tw), sm.DEPTH_MAX, dtype=I32)
    acc_t = jnp.full((th, tw), sm.BG_TRI, dtype=I32)

    y_sub = jax.lax.broadcasted_iota(I32, (th, 1), 0) * ss  # tile-local rows
    lane = jax.lax.broadcasted_iota(I32, (1, LB), 1)
    lane_col = jax.lax.broadcasted_iota(I32, (th, tw), 1)

    def process(carry):
        acc_d, acc_t = carry

        def block_body(b, carry):
            acc_d, acc_t = carry
            slot = b % 2

            @pl.when(b + 1 < nwin)
            def _():
                dma((b + 1) % 2, b + 1).start()
                dma_f((b + 1) % 2, b + 1).start()

            dma(slot, b).wait()
            dma_f(slot, b).wait()

            def row(i):
                return scratch[slot, i].reshape(1, LB)

            a0, b0 = row(0), row(1)
            a1, b1 = row(2), row(3)
            a2, b2 = row(4), row(5)
            e0c, e1c, e2c = row(6), row(7), row(8)
            zq0 = row(9).astype(F32)
            zq1 = row(10).astype(F32)
            zq2 = row(11).astype(F32)
            tri = row(12)
            bias = row(13)
            inv_area = scratch_f[slot, 0].reshape(1, LB)

            t0 = I32(1) - (bias & 1)
            t1 = I32(1) - ((bias >> 1) & 1)
            t2 = I32(1) - ((bias >> 2) & 1)
            as0, as1, as2 = a0 * ss, a1 * ss, a2 * ss
            rt0 = y_sub * b0  # (th, LB); y_sub is already in subpixels
            rt1 = y_sub * b1
            rt2 = y_sub * b2
            g = wbase + b * LB + lane
            lane_ok = (g >= start) & (g < start + count)

            def col_body(c, carry):
                acc_d, acc_t, ec0, ec1, ec2 = carry
                e0 = rt0 + ec0
                e1 = rt1 + ec1
                e2 = rt2 + ec2
                cov = (e0 >= t0) & (e1 >= t1) & (e2 >= t2) & lane_ok
                num = sm.dot3(
                    e0.astype(F32), zq0, e1.astype(F32), zq1,
                    e2.astype(F32), zq2,
                )
                d16 = jnp.clip(
                    jnp.round(num * inv_area), 0, sm.DEPTH_MAX
                ).astype(I32)
                dmask = jnp.where(cov, d16, I32(sm.DEPTH_MAX + 1))
                dmin = jnp.min(dmask, axis=1, keepdims=True)  # (th, 1)
                twin = jnp.max(
                    jnp.where(cov & (dmask == dmin), tri, I32(sm.BG_TRI)),
                    axis=1,
                    keepdims=True,
                )  # (th, 1)
                hit = dmin <= sm.DEPTH_MAX
                cand_d = jnp.where(
                    (lane_col == c) & hit, dmin, I32(sm.DEPTH_MAX)
                )
                cand_t = jnp.where(
                    (lane_col == c) & hit, twin, I32(sm.BG_TRI)
                )
                better = sm.depth_key_better(cand_d, cand_t, acc_d, acc_t)
                acc_d = jnp.where(better, cand_d, acc_d)
                acc_t = jnp.where(better, cand_t, acc_t)
                return acc_d, acc_t, ec0 + as0, ec1 + as1, ec2 + as2

            acc_d, acc_t, _, _, _ = jax.lax.fori_loop(
                0, tw, col_body, (acc_d, acc_t, e0c, e1c, e2c)
            )
            return acc_d, acc_t

        dma(0, 0).start()
        dma_f(0, 0).start()
        return jax.lax.fori_loop(0, nwin, block_body, (acc_d, acc_t))

    acc_d, acc_t = jax.lax.cond(
        nwin > 0, process, lambda c: c, (acc_d, acc_t)
    )
    vis_d_ref[:] = acc_d
    vis_t_ref[:] = acc_t


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "tile_rows")
)
def rasterize_visibility_lanes(
    records_i, records_f, tile_start, tile_count, cfg: RasterConfig,
    interpret: bool = False, tile_rows: int | None = None
):
    """Drop-in replacement for raster_pallas.rasterize_visibility (requires
    cfg.tile_h == 8); output is bit-identical."""
    assert cfg.tile_h == 8, "lane kernel sweeps one sublane-vreg of rows"
    full = tile_rows is None
    if full:
        tile_rows = cfg.grid_h
    grid = (tile_rows * cfg.grid_w,)
    out_shape = (
        jax.ShapeDtypeStruct(
            (tile_rows * cfg.tile_h, cfg.grid_w * cfg.tile_w), I32
        ),
        jax.ShapeDtypeStruct(
            (tile_rows * cfg.tile_h, cfg.grid_w * cfg.tile_w), I32
        ),
    )
    block = pl.BlockSpec(
        (cfg.tile_h, cfg.tile_w),
        lambda t, *_: (t // cfg.grid_w, t % cfg.grid_w),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(block, block),
        scratch_shapes=[
            pltpu.VMEM((2, RECORD_ROWS, LB), I32),
            pltpu.VMEM((2, F32_ROWS, LB), F32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vis_d, vis_t = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_count, records_i, records_f)
    if full:
        return vis_d[: cfg.height, : cfg.width], vis_t[: cfg.height, : cfg.width]
    return vis_d[:, : cfg.width], vis_t[:, : cfg.width]
