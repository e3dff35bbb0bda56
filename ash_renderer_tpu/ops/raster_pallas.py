"""Pallas TPU visibility kernel: tile-binned rasterization with D16 early-Z.

The hot loop of the framework — the TPU-native replacement for the GPU's
fixed-function rasterizer + depth unit (the reference's single
``cmd_draw_indexed``, ``src/renderer.rs:533-540``).  One grid step per
framebuffer tile; the tile's (d16, tri_id) visibility planes live in VMEM
(as pipelined output blocks) for the whole invocation while binned triangle
records stream HBM -> VMEM via double-buffered async DMA.

Per triangle: evaluate the three int32 edge functions incrementally from
precomputed tile-corner values (see ops/binning.py record layout), apply the
top-left fill rule, interpolate D16 depth, and merge with the
order-independent key min (specmath.depth_key_better).  Two triangles hitting
one pixel is resolved by pure compare-select — no atomics exist and none are
needed (SURVEY §5's raster write-hazard, solved structurally).

The kernel compiles for TPU and runs identically under ``interpret=True`` on
CPU, which is how the test suite checks it bit-for-bit against the oracle.
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

F32 = np.float32
I32 = np.int32

from .binning import F32_ROWS, RECORD_ROWS


def _kernel(
    start_ref,
    count_ref,
    rec_hbm,
    recf_hbm,
    vis_d_ref,
    vis_t_ref,
    scratch,
    scratch_f,
    sems,
    sems_f,
    *,
    cfg: RasterConfig,
):
    tile = pl.program_id(0)
    start = start_ref[tile]
    count = count_ref[tile]
    tb = cfg.tri_block
    win = tb + 128  # 128-aligned DMA window covering [start+b*tb, +tb)
    ss = cfg.subpixel_scale

    vis_d_ref[:] = jnp.full((cfg.tile_h, cfg.tile_w), sm.DEPTH_MAX, dtype=I32)
    vis_t_ref[:] = jnp.full((cfg.tile_h, cfg.tile_w), sm.BG_TRI, dtype=I32)

    # tile-local sample offsets in subpixel units (corner sample is offset 0)
    col_s = jax.lax.broadcasted_iota(I32, (cfg.tile_h, cfg.tile_w), 1) * ss
    row_s = jax.lax.broadcasted_iota(I32, (cfg.tile_h, cfg.tile_w), 0) * ss

    nblocks = pl.cdiv(count, tb)

    # HBM lane slices must be 128-aligned in offset and size: DMA an aligned
    # window around the block and index with the in-window offset.
    def aligned_base(b):
        base = start + b * tb
        return (base // 128) * 128, base - (base // 128) * 128

    def dma(slot, b):
        ab, _ = aligned_base(b)
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(ab, win)],
            scratch.at[slot],
            sems.at[slot],
        )

    def dma_f(slot, b):
        ab, _ = aligned_base(b)
        return pltpu.make_async_copy(
            recf_hbm.at[:, pl.ds(ab, win)],
            scratch_f.at[slot],
            sems_f.at[slot],
        )

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()
        dma_f(0, 0).start()

        def block_body(b, _):
            slot = b % 2

            @pl.when(b + 1 < nblocks)
            def _():
                dma((b + 1) % 2, b + 1).start()
                dma_f((b + 1) % 2, b + 1).start()

            dma(slot, b).wait()
            dma_f(slot, b).wait()
            _, jofs = aligned_base(b)

            def tri_body(jj, _):
                @pl.when(jj < count - b * tb)
                def _():
                    j = jofs + jj
                    # per-triangle record scalars, read one by one from SMEM
                    a0 = scratch[slot, 0, j]
                    b0 = scratch[slot, 1, j]
                    a1 = scratch[slot, 2, j]
                    b1 = scratch[slot, 3, j]
                    a2 = scratch[slot, 4, j]
                    b2 = scratch[slot, 5, j]
                    e0c = scratch[slot, 6, j]
                    e1c = scratch[slot, 7, j]
                    e2c = scratch[slot, 8, j]
                    zq0 = scratch[slot, 9, j]
                    zq1 = scratch[slot, 10, j]
                    zq2 = scratch[slot, 11, j]
                    inv_area = scratch_f[slot, 0, j]
                    tri_id = scratch[slot, 12, j]
                    bias = scratch[slot, 13, j]

                    e0 = (e0c + a0 * col_s) + b0 * row_s
                    e1 = (e1c + a1 * col_s) + b1 * row_s
                    e2 = (e2c + a2 * col_s) + b2 * row_s
                    # top-left rule: covered iff E_i >= (1 - topleft_bit)
                    t0 = I32(1) - (bias & 1)
                    t1 = I32(1) - ((bias >> 1) & 1)
                    t2 = I32(1) - ((bias >> 2) & 1)
                    cov = (e0 >= t0) & (e1 >= t1) & (e2 >= t2)

                    @pl.when(jnp.any(cov))
                    def _():
                        d16 = sm.interp_depth16(
                            e0, e1, e2, inv_area, zq0, zq1, zq2, jnp
                        )
                        fb_d = vis_d_ref[:]
                        fb_t = vis_t_ref[:]
                        better = cov & sm.depth_key_better(
                            d16, tri_id, fb_d, fb_t
                        )
                        vis_d_ref[:] = jnp.where(better, d16, fb_d)
                        vis_t_ref[:] = jnp.where(better, tri_id, fb_t)

            jax.lax.fori_loop(0, tb, tri_body, None, unroll=cfg.tri_unroll)

        jax.lax.fori_loop(0, nblocks, block_body, None)


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "tile_rows")
)
def rasterize_visibility(
    records_i, records_f, tile_start, tile_count, cfg: RasterConfig,
    interpret: bool = False, tile_rows: int | None = None
):
    """records_i: (16, P_pad) i32, records_f: (F32_ROWS, F_pad) f32; returns
    (vis_d16, vis_tri) cropped to (height, width).  tile_rows renders only a
    slab of that many tile rows (records must be binned with the matching
    window) — the multi-chip sharding path."""
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
        # index_map receives the scalar-prefetch refs after the grid indices
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
            # SMEM: per-triangle record scalars are read with dynamic indices,
            # which only scalar memory supports on TPU
            pltpu.SMEM((2, RECORD_ROWS, cfg.tri_block + 128), I32),
            pltpu.SMEM((2, F32_ROWS, cfg.tri_block + 128), F32),
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
