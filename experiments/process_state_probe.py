"""Find what inflates pallas kernel wall time ~3.5 -> ~13 ms at the
headline grid in a pipeline-warm process.

The identical phases="z" kernel (immediate return; writes zeros to the
three output blocks) measures ~3.5 ms in a fresh process
(grid_overhead_probe cases l/m) but 12.5-15 ms in the kernel_phase_probe
process after the XLA pipeline stages ran — independent of operand
CONTENT (real vs zeros A/B'd clean).  Suspects: HBM residency /
allocator state, prior big XLA ops, output-buffer churn.  This probe
applies the candidate states one at a time in a single process.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc

import jax
import jax.numpy as jnp
import numpy as np

I32 = np.int32


def timeit(fn, *args, reps=8, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{label:44s} {(time.perf_counter()-t0)/reps*1000:7.2f} ms",
          flush=True)


def main():
    from ash_renderer_tpu.config import derive_raster_config
    from ash_renderer_tpu.ops import fused_kernel

    cfg = derive_raster_config(1920, 1080, tile_h=8)
    rm = jnp.zeros(cfg.n_tiles * 12 + 1, I32)
    tbl = jnp.zeros((1 << 20, 128), I32)
    ext0 = jnp.zeros((512, 128), I32)
    fnz = jax.jit(
        lambda rm_, tb_: fused_kernel.rasterize_distribute(
            rm_, tb_, ext0, cfg, phases="z"
        )
    )

    timeit(fnz, rm, tbl, label="1) fresh process")

    junk = [
        jax.device_put(np.zeros((1 << 20, 128), np.int32))
        for _ in range(3)
    ]  # ~1.6 GB resident
    timeit(fnz, rm, tbl, label="2) +1.6 GB resident buffers")

    big = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 20, (1 << 21,)).astype(np.int32))
    srt = jax.jit(lambda x: jax.lax.sort_key_val(
        x, jnp.arange(x.shape[0], dtype=I32))[1])
    o = srt(big)
    np.asarray(o.ravel()[:1])
    timeit(fnz, rm, tbl, label="3) after a 2M-key XLA sort")

    gath = jax.jit(lambda t, o_: t[o_])
    g = gath(junk[0], jnp.arange(1 << 20, dtype=I32))
    np.asarray(g.ravel()[:1])
    timeit(fnz, rm, tbl, label="4) after a 1M-row XLA gather")

    del junk, g
    gc.collect()
    timeit(fnz, rm, tbl, label="5) after freeing the buffers")

    for r in (1, 4, 32):
        timeit(fnz, rm, tbl, reps=r, label=f"6) reps={r}")


if __name__ == "__main__":
    main()
