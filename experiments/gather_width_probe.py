"""Probe: sorted-table row-gather cost vs table width.

The fused pipeline's per-frame `comb[order]` gather moves (S, 128) int32
rows (~717 MB at the headline) but phases V/D/E consume only cols 0..47
(+ID).  Round-2 measurements pinned 128-col rows as the gather fast path
vs 46-col (12 ms vs 56 ms at 1.4M rows); 64-col was never measured.  If
(S, 64) also hits the fast path, the gather, the kernel DMA stream, and
the phase-D byte-plane matmuls all halve.

Also measures a (S, 128)->(S, 64) gather (wide source, narrow out) and
the 256-row-block padded form sorted_table uses.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")

S = 1 << 19  # probe at 512k rows (scales linearly; headline is ~1.57M)
REPS = 10


@functools.partial(jax.jit, static_argnames=("cols",))
def row_gather(tbl, order, cols):
    return tbl[:, :cols][order]


@jax.jit
def row_gather_full(tbl, order):
    return tbl[order]


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(out.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out.ravel()[:2])
    dt = (time.perf_counter() - t0) / REPS
    gb = out.size * 4 / 1e9
    print(f"{label:28s} {dt*1000:7.2f} ms  ({gb:.2f} GB out, "
          f"{gb/dt:.0f} GB/s eff)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    order = jnp.asarray(rng.permutation(S).astype(np.int32))
    for cols in (128, 64):
        tbl = jnp.asarray(
            rng.integers(0, 1 << 30, (S, cols)).astype(np.int32)
        )
        bench(row_gather_full, tbl, order, label=f"gather ({S},{cols})")
    tbl128 = jnp.asarray(rng.integers(0, 1 << 30, (S, 128)).astype(np.int32))
    bench(functools.partial(row_gather, cols=64), tbl128, order,
          label=f"gather ({S},128)->64")


if __name__ == "__main__":
    main()
