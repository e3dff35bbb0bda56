"""Feasibility probes for strip sub-binned phase V.

1. SMEM scalar-prefetch capacity: the fine-grid bounds table is
   (n_bins * 4 + pair_starts) ints — 130 KB at 32-px strips (8100 bins),
   259 KB at 16-px strips (16200 bins).  Today's rmeta (97 KB) works;
   find where the prefetch stops fitting.
2. searchsorted scan cost vs query count over 1.4M sorted keys: today's
   8.1k bound queries cost ~2.4 ms; the fine grids need 32k-65k.
"""
import functools
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = np.int32


def smem_probe(n_ints):
    """A kernel whose scalar-prefetch operand has n_ints int32s; reads two
    entries per grid step so the prefetch cannot be elided."""

    def kernel(sref, oref):
        t = pl.program_id(0)
        oref[...] = jnp.full((8, 128), sref[t] + sref[n_ints - 1 - t], I32)

    @jax.jit
    def run(s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16 * 8, 128), I32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(16,),
                in_specs=[],
                out_specs=pl.BlockSpec(
                    (8, 128), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                ),
            ),
        )(s)

    s = jnp.arange(n_ints, dtype=I32)
    try:
        out = run(s)
        v = np.asarray(out.ravel()[:1])
        print(f"SMEM prefetch {n_ints:>8d} ints ({n_ints*4/1024:7.0f} KB): OK"
              f" (v={v[0]})", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"SMEM prefetch {n_ints:>8d} ints ({n_ints*4/1024:7.0f} KB): "
              f"FAIL {msg}", flush=True)
        return False


@functools.partial(jax.jit, static_argnames=("nq",))
def ss_scan(keys_sorted, nq):
    q = jnp.arange(nq, dtype=I32)
    return jnp.searchsorted(keys_sorted, q, side="left").astype(I32)


def main():
    for n in (24_304, 32_402, 66_830, 131_072, 262_144):
        if not smem_probe(n):
            break

    S = 1 << 20  # ~1M keys plus change, close to the headline's 1.44M
    S = int(1.44 * 2**20)
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 65_000, S).astype(np.int32))
    keys_d = jnp.asarray(keys)
    for nq in (8_105, 16_203, 32_403, 64_803):
        out = ss_scan(keys_d, nq)
        np.asarray(out.ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(10):
            out = ss_scan(keys_d, nq)
        np.asarray(out.ravel()[:2])
        dt = (time.perf_counter() - t0) / 10
        print(f"searchsorted scan {nq:>6d} queries over {S} keys: "
              f"{dt*1000:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
