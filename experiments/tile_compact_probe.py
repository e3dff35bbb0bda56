"""Tile-level shade compaction feasibility: cost of (a) gathering B live
tiles' plane rows from (n_tiles, 24, 1024), (b) the inverse row-gather of
the packed u8 image, (c) the live-tile order sort — vs the saving of
running the texture chain on B instead of n_tiles tiles.

Run at the headline shape (2025 tiles) with B = 1280 (5/8 tier)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

I32 = np.int32


def force(x):
    return [np.asarray(l.ravel()[:1]) for l in jax.tree.leaves(x)]


def timeit(fn, *args, reps=16):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / reps, out


def main():
    n_tiles, rows, lanes = 2025, 24, 1024
    B = 1280
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.integers(0, 1 << 30, size=(n_tiles, rows, lanes), dtype=np.int32)
    )
    order = jnp.asarray(rng.permutation(n_tiles).astype(np.int32))

    # (a) forward gather of B tiles' planes (the compaction)
    dt, _ = timeit(jax.jit(lambda p, o: p[o[:B]]), planes, order)
    print(f"planes fwd gather {B} tiles (24x1024): {dt*1e3:.2f} ms",
          flush=True)

    # flat variant: (n_tiles, 24*1024)
    planes_f = planes.reshape(n_tiles, rows * lanes)
    dt, _ = timeit(jax.jit(lambda p, o: p[o[:B]]), planes_f, order)
    print(f"planes fwd gather {B} tiles (flat 24576): {dt*1e3:.2f} ms",
          flush=True)

    # (b) inverse gather of the packed image + clear fill
    packed = jnp.asarray(
        rng.integers(0, 255, size=(B, lanes, 4), dtype=np.int32).astype(
            np.uint8
        )
    )
    inv = jnp.asarray(rng.integers(0, B, size=n_tiles, dtype=np.int32))
    live = jnp.asarray(rng.random(n_tiles) > 0.4)

    def inverse(p, iv, lv):
        out = p[iv]
        clear = jnp.zeros((1, lanes, 4), jnp.uint8)
        return jnp.where(lv[:, None, None], out, clear)

    dt, _ = timeit(jax.jit(inverse), packed, inv, live)
    print(f"inverse u8 gather {n_tiles} tiles: {dt*1e3:.2f} ms", flush=True)

    # (c) live-order sort of n_tiles keys + inverse permutation
    def mkorder(lv):
        key = jnp.where(lv, I32(0), I32(1)) * I32(n_tiles) + jnp.arange(
            n_tiles, dtype=I32
        )
        o = jnp.argsort(key)
        inv_p = jnp.zeros(n_tiles, I32).at[o].set(
            jnp.arange(n_tiles, dtype=I32)
        )
        return o, inv_p

    dt, _ = timeit(jax.jit(mkorder), live)
    print(f"order sort + inv perm ({n_tiles} keys): {dt*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()


def better_primitives():
    n_tiles, rows, lanes = 2025, 24, 1024
    B = 512
    rng = np.random.default_rng(0)
    live = jnp.asarray(rng.random(n_tiles) > 0.8)

    def mkorder2(lv):
        key = jnp.where(lv, I32(0), I32(1)) * I32(n_tiles) + jnp.arange(
            n_tiles, dtype=I32
        )
        o = jnp.argsort(key)
        inv_p = jnp.argsort(o)  # inverse permutation without scatter
        return o, inv_p

    dt, (o, inv) = timeit(jax.jit(mkorder2), live)
    print(f"order via 2x argsort ({n_tiles}): {dt*1e3:.2f} ms", flush=True)

    packed32 = jnp.asarray(
        rng.integers(0, 1 << 30, size=(B, lanes), dtype=np.int32)
    )

    def inverse32(p, iv, lv):
        out = p[jnp.clip(iv, 0, B - 1)]
        return jnp.where(lv[:, None], out, jnp.zeros((1, lanes), p.dtype))

    dt, _ = timeit(jax.jit(inverse32), packed32, inv, live)
    print(f"inverse i32 gather {n_tiles} rows from {B}: {dt*1e3:.2f} ms",
          flush=True)

    planes_f = jnp.asarray(
        rng.integers(0, 1 << 30, size=(n_tiles, 18 * 1024), dtype=np.int32)
    )
    dt, _ = timeit(jax.jit(lambda p, oo: p[oo[:B]]), planes_f, o)
    print(f"planes fwd gather {B} tiles (18 rows): {dt*1e3:.2f} ms",
          flush=True)


better_primitives()
