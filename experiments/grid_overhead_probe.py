"""Isolate the fused kernel's per-grid-step structural overhead.

phases=e measured 14.9 ms for a 2040-step grid whose per-step compute is
tiny — ~7 us/step of machinery.  Candidates: Mosaic per-step dispatch,
and the per-step OUTPUT-block DMAs (3 of them: vis_d (8,128), vis_t
(8,128), planes (1,24,1024) = 96 KB).  This probe times minimal kernels
over the same grid shape:

  a) 3 outputs, same shapes as the real kernel (zero stores only)
  b) 1 output (planes only)
  c) 1 output, 2 tiles per step (grid 1020, planes block (2,24,1024))
  d) 1 output, 4 tiles per step (grid 510)
  e) 3 outputs, planes shrunk to the 17 used rows

Whatever (a)-(b) shows is the per-step cost of the extra output DMAs;
(b)-(c)-(d) shows the pure per-step dispatch cost.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = np.int32
N_TILES = 2040
GW = 15
N_PIX = 1024


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:2])
    print(f"{label:34s} {(time.perf_counter()-t0)/10*1000:7.2f} ms",
          flush=True)


def k3(x_ref, vd_ref, vt_ref, p_ref, *, oc):
    vd_ref[:] = jnp.zeros((8, 128), I32)
    vt_ref[:] = jnp.zeros((8, 128), I32)
    p_ref[0, :, :] = jnp.zeros((oc, N_PIX), I32)


def k1(x_ref, p_ref, *, tps, oc):
    p_ref[:, :, :] = jnp.zeros((tps, oc, N_PIX), I32)


def run3(oc):
    vis = pl.BlockSpec((8, 128), lambda t: (t // GW, t % GW),
                       memory_space=pltpu.VMEM)
    pla = pl.BlockSpec((1, oc, N_PIX), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            functools.partial(k3, oc=oc),
            grid=(N_TILES,),
            out_shape=(
                jax.ShapeDtypeStruct((N_TILES // GW * 8, GW * 128), I32),
                jax.ShapeDtypeStruct((N_TILES // GW * 8, GW * 128), I32),
                jax.ShapeDtypeStruct((N_TILES, oc, N_PIX), I32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(vis, vis, pla),
        )(x)

    return f


def run1(tps, oc):
    pla = pl.BlockSpec((tps, oc, N_PIX), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            functools.partial(k1, tps=tps, oc=oc),
            grid=(N_TILES // tps,),
            out_shape=jax.ShapeDtypeStruct((N_TILES // tps, tps * oc, N_PIX),
                                           I32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pla,
        )(x)

    return f


def k3s(rm_ref, x_ref, vd_ref, vt_ref, p_ref, *bufs, oc, read_scal=False):
    fill = I32(0)
    if read_scal:
        t = pl.program_id(0)
        fill = rm_ref[t * 12] + rm_ref[t * 12 + 1]
    vd_ref[:] = jnp.full((8, 128), fill, I32)
    vt_ref[:] = jnp.zeros((8, 128), I32)
    p_ref[0, :, :] = jnp.zeros((oc, N_PIX), I32)


def run3s(oc, n_scal, scratch, read_scal=False):
    """The real kernel's structure: PrefetchScalarGridSpec with an
    n_scal-int scalar operand (+ optionally the real scratch shapes)."""
    vis = pl.BlockSpec((8, 128), lambda t, *_: (t // GW, t % GW),
                       memory_space=pltpu.VMEM)
    pla = pl.BlockSpec((1, oc, N_PIX), lambda t, *_: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    scr = []
    if scratch:
        scr = [
            pltpu.VMEM((6, 128, 128), I32),
            pltpu.VMEM((128, 128), I32),
            pltpu.VMEM((128, 8), I32),
            pltpu.VMEM((1, N_PIX), I32),
            pltpu.VMEM((64, N_PIX), I32),
            pltpu.VMEM((64, N_PIX), I32),
            pltpu.VMEM((64, N_PIX), I32),
            pltpu.VMEM((64, N_PIX), I32),
            pltpu.SemaphoreType.DMA((6,)),
        ]

    @jax.jit
    def f(rm, x):
        return pl.pallas_call(
            functools.partial(k3s, oc=oc, read_scal=read_scal),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N_TILES,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=(vis, vis, pla),
                scratch_shapes=scr,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((N_TILES // GW * 8, GW * 128), I32),
                jax.ShapeDtypeStruct((N_TILES // GW * 8, GW * 128), I32),
                jax.ShapeDtypeStruct((N_TILES, oc, N_PIX), I32),
            ),
        )(rm, x)

    return f


def main():
    x = jnp.zeros((8, 128), I32)
    bench(run3(24), x, label="a) 3 outs, planes 24 rows")
    rm_big = jnp.zeros(24301, I32)
    rm_small = jnp.zeros(1024, I32)
    bench(run3s(24, 24301, False), rm_big, x,
          label="g) +97KB scalar prefetch")
    bench(run3s(24, 1024, False), rm_small, x,
          label="h) +4KB scalar prefetch")
    bench(run3s(24, 24301, True), rm_big, x,
          label="i) +97KB prefetch +scratch")
    bench(run3s(24, 1024, True), rm_small, x,
          label="j) +4KB prefetch +scratch")
    bench(run3s(24, 24301, True, read_scal=True), rm_big, x,
          label="k) i + per-step scalar reads")
    from ash_renderer_tpu.ops import fused_kernel
    from ash_renderer_tpu.config import derive_raster_config
    cfg = derive_raster_config(1920, 1080, tile_h=8)
    rm_real = jnp.zeros(cfg.n_tiles * 12 + 1, I32)
    tbl_tiny = jnp.zeros((512, 128), I32)
    tbl_big = jnp.zeros((1 << 20, 128), I32)
    ext0 = jnp.zeros((512, 128), I32)
    f = jax.jit(lambda rm_, tb_: fused_kernel.rasterize_distribute(
        rm_, tb_, ext0, cfg, phases="z"))
    bench(f, rm_real, tbl_tiny, label="l) real kernel z, tiny table")
    bench(f, rm_real, tbl_big, label="m) real kernel z, 512MB table")


if __name__ == "__main__":
    main()
