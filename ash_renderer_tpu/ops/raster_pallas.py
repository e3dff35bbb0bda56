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

from .binning import RECORD_ROWS


def _kernel(
    start_ref,
    count_ref,
    rec_hbm,
    vis_d_ref,
    vis_t_ref,
    scratch,
    sems,
    *,
    cfg: RasterConfig,
):
    tile = pl.program_id(0)
    start = start_ref[tile]
    count = count_ref[tile]
    tb = cfg.tri_block
    ss = cfg.subpixel_scale

    vis_d_ref[:] = jnp.full((cfg.tile_h, cfg.tile_w), sm.DEPTH_MAX, dtype=I32)
    vis_t_ref[:] = jnp.full((cfg.tile_h, cfg.tile_w), sm.BG_TRI, dtype=I32)

    # tile-local sample offsets in subpixel units (corner sample is offset 0)
    col_s = jax.lax.broadcasted_iota(I32, (cfg.tile_h, cfg.tile_w), 1) * ss
    row_s = jax.lax.broadcasted_iota(I32, (cfg.tile_h, cfg.tile_w), 0) * ss

    nblocks = pl.cdiv(count, tb)

    def dma(slot, b):
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(start + b * tb, tb)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

        def block_body(b, _):
            slot = b % 2

            @pl.when(b + 1 < nblocks)
            def _():
                dma((b + 1) % 2, b + 1).start()

            dma(slot, b).wait()
            data = scratch[slot]  # (16, tb) i32 in VMEM

            def tri_body(j, _):
                @pl.when(j < count - b * tb)
                def _():
                    a0 = data[0, j]
                    b0 = data[1, j]
                    a1 = data[2, j]
                    b1 = data[3, j]
                    a2 = data[4, j]
                    b2 = data[5, j]
                    e0c = data[6, j]
                    e1c = data[7, j]
                    e2c = data[8, j]
                    zq0 = data[9, j]
                    zq1 = data[10, j]
                    zq2 = data[11, j]
                    inv_area = sm._bitcast_f32(data[12, j], jnp)
                    tri_id = data[13, j]
                    bias = data[14, j]

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

            jax.lax.fori_loop(0, tb, tri_body, None)

        jax.lax.fori_loop(0, nblocks, block_body, None)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def rasterize_visibility(
    records, tile_start, tile_count, cfg: RasterConfig, interpret: bool = False
):
    """records: (16, P_pad) i32; returns (vis_d16, vis_tri) cropped to
    (height, width)."""
    grid = (cfg.n_tiles,)
    out_shape = (
        jax.ShapeDtypeStruct(
            (cfg.grid_h * cfg.tile_h, cfg.grid_w * cfg.tile_w), I32
        ),
        jax.ShapeDtypeStruct(
            (cfg.grid_h * cfg.tile_h, cfg.grid_w * cfg.tile_w), I32
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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(block, block),
        scratch_shapes=[
            pltpu.VMEM((2, RECORD_ROWS, cfg.tri_block), I32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vis_d, vis_t = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_count, records)
    return vis_d[: cfg.height, : cfg.width], vis_t[: cfg.height, : cfg.width]
