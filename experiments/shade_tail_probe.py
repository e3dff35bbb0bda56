"""Probe the shade stage's TAIL at the headline shape: from 4 tile-flat
f32 channels + valid mask to the (H, W, 4) u8 image.

Legs:
  A. current: where(valid) -> stack(...,4) -> pack_unorm8 -> transpose
  B. channel-wise: where -> cvt+shift-or to one u32/px -> XLA transpose ->
     bitcast to (H, W, 4)
  C. like B but the relayout is a Pallas kernel (grid over tile rows,
     in (gw, 1024) u32 block -> out (8, 1920) block)
All three must be bit-identical.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ash_renderer_tpu import specmath as sm

F32 = np.float32


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


GH, GW, TH, TW = 135, 15, 8, 128
H, W = 1080, 1920
N_TILES, LANES = GH * GW, TH * TW
CLEAR = (0.0, 0.0, 0.0, 1.0)


def leg_a(ch, valid):
    rgba = jnp.stack(ch, axis=-1)
    clear = jnp.asarray(np.asarray(CLEAR, dtype=F32))
    rgba = jnp.where(valid[..., None], rgba, clear)
    p = sm.pack_unorm8(rgba, jnp)
    img = (
        p.reshape(GH, GW, TH, TW, 4).transpose(0, 2, 1, 3, 4)
        .reshape(GH * TH, GW * TW, 4)
    )
    return img[:H, :W]


def pack_u32(ch, valid):
    acc = None
    for c in range(4):
        v = jnp.where(valid, ch[c], F32(CLEAR[c]))
        b = jnp.round(jnp.clip(v, F32(0.0), F32(1.0)) * F32(255.0)).astype(
            jnp.uint32
        )
        acc = b if acc is None else acc | (b << (8 * c))
    return acc


def leg_b(ch, valid):
    p = pack_u32(ch, valid)  # (N_TILES, LANES) u32
    img = (
        p.reshape(GH, GW, TH, TW).transpose(0, 2, 1, 3)
        .reshape(GH * TH, GW * TW)
    )
    return jax.lax.bitcast_convert_type(img[:H, :W], jnp.uint8)


def _relayout_kernel(i_ref, o_ref):
    x = i_ref[0]  # (GW, LANES) u32: one tile row
    x = x.reshape(GW, TH, TW)
    o_ref[...] = x.transpose(1, 0, 2).reshape(TH, GW * TW)


def leg_c(ch, valid):
    p = pack_u32(ch, valid)
    img = pl.pallas_call(
        _relayout_kernel,
        grid=(GH,),
        in_specs=[pl.BlockSpec((1, GW, LANES), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((TH, GW * TW), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((GH * TH, GW * TW), jnp.uint32),
    )(p.reshape(GH, GW, LANES))
    return jax.lax.bitcast_convert_type(img[:H, :W], jnp.uint8)


def main():
    rng = np.random.default_rng(0)
    ch = [
        jnp.asarray(rng.random((N_TILES, LANES), dtype=np.float32))
        for _ in range(4)
    ]
    valid = jnp.asarray(rng.random((N_TILES, LANES)) > 0.5)

    dt_a, out_a = timeit(jax.jit(leg_a), ch, valid)
    print(f"A current stack+pack+transpose: {dt_a*1e3:.2f} ms", flush=True)
    dt_b, out_b = timeit(jax.jit(leg_b), ch, valid)
    eq_b = bool(jnp.all(out_b == out_a))
    print(f"B u32-pack + XLA transpose:    {dt_b*1e3:.2f} ms  eq={eq_b}",
          flush=True)
    dt_c, out_c = timeit(jax.jit(leg_c), ch, valid)
    eq_c = bool(jnp.all(out_c == out_a))
    print(f"C u32-pack + Pallas relayout:  {dt_c*1e3:.2f} ms  eq={eq_c}",
          flush=True)


if __name__ == "__main__":
    main()
