"""Same-process A/B: searchsorted scan vs the Pallas counting kernel
(ops/bincount.sorted_run_bounds) for the fused pipeline's run bounds at
the real headline shape (1.57M sorted keys, 8162 bins).

Timing discipline per DESIGN.md: one-leaf force, reps=16, deltas only.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

I32 = np.int32


def timeit(fn, *args, reps=16, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{label:40s} {(time.perf_counter()-t0)/reps*1000:7.2f} ms",
          flush=True)
    return out


def main():
    from ash_renderer_tpu.ops.bincount import sorted_run_bounds

    s = 1_572_864
    n_bins = 2040 * 4 + 2
    rng = np.random.default_rng(0)
    # realistic shape: ~327k live keys over the bins, the rest dead
    live = np.sort(rng.integers(0, n_bins - 2, 327_118)).astype(np.int32)
    dead = np.full(s - live.shape[0], n_bins - 1, np.int32)
    keys = jnp.asarray(np.concatenate([live, dead]))

    f_scan = jax.jit(
        lambda k: jnp.searchsorted(
            k, jnp.arange(n_bins, dtype=I32), side="left"
        ).astype(I32)
    )
    f_cnt = jax.jit(lambda k: sorted_run_bounds(k, n_bins))
    a = timeit(f_scan, keys, label="searchsorted scan (8162 queries)")
    b = timeit(f_cnt, keys, label="bincount kernel")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bit-equal", flush=True)

    idx = jnp.arange(s, dtype=I32)
    f_sort = jax.jit(lambda k: jax.lax.sort_key_val(k, idx))
    timeit(f_sort, keys, label="sort_key_val context (1.57M)")


if __name__ == "__main__":
    main()
