"""Split the shade stage's ~6.3 ms 'vertex color only' floor (shade_probe)
into its pieces at the headline shape: the valid-select+stack, the sRGB LUT
gather (4096-entry LUT, 3 indices/px = 6.2M), pack_unorm8, and the
tile-flat -> (H, W) relayout.  Also times an exact one-hot MXU form of the
LUT lookup (64x64 two-stage) as a candidate replacement."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ash_renderer_tpu import specmath as sm
from ash_renderer_tpu.ops import shade

F32 = np.float32
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
    gh, gw, th, tw = 135, 15, 8, 128  # headline tile grid 1920x1080
    n_tiles, lanes = gh * gw, th * tw
    rng = np.random.default_rng(0)
    rgba_tf = jnp.asarray(
        rng.random((n_tiles, lanes, 4), dtype=np.float32)
    )

    # 1. pack only (no srgb)
    dt, _ = timeit(jax.jit(lambda x: sm.pack_unorm8(x, jnp)), rgba_tf)
    print(f"pack_unorm8 only: {dt*1e3:.2f} ms", flush=True)

    # 2. srgb LUT gather + pack (the current resolve_and_pack path)
    dt, _ = timeit(
        jax.jit(lambda x: shade.resolve_and_pack(jnp, x, 1, True)), rgba_tf
    )
    print(f"srgb LUT + pack: {dt*1e3:.2f} ms", flush=True)

    # 3. relayout tile-flat -> (H, W) of the packed u8 image
    packed = jax.jit(lambda x: sm.pack_unorm8(x, jnp))(rgba_tf)

    def relayout(x):
        img = (
            x.reshape(gh, gw, th, tw, 4).transpose(0, 2, 1, 3, 4)
            .reshape(gh * th, gw * tw, 4)
        )
        return img[:1080, :1920]

    dt, _ = timeit(jax.jit(relayout), packed)
    print(f"relayout packed u8: {dt*1e3:.2f} ms", flush=True)

    # 4. exact one-hot MXU LUT (64x64 two-stage) vs the LUT gather
    lut = np.asarray(sm.srgb_encode_lut(), dtype=np.float32)  # (4096,)
    lut2d = jnp.asarray(lut.reshape(64, 64))
    idx = jnp.asarray(
        rng.integers(0, 4096, size=(n_tiles * lanes, 3), dtype=np.int32)
    )

    def lut_gather(ix):
        return jnp.asarray(lut)[ix]

    dt, ref = timeit(jax.jit(lut_gather), idx)
    print(f"LUT gather 6.2M idx: {dt*1e3:.2f} ms", flush=True)

    def lut_mxu(ix):
        ixf = ix.reshape(-1)  # (6.2M,)
        hi = (ixf >> 6).astype(I32)
        lo = (ixf & 63).astype(I32)
        io = jax.lax.broadcasted_iota(I32, (ixf.shape[0], 64), 1)
        oh_hi = (io == hi[:, None]).astype(F32)
        row = jax.lax.dot_general(
            oh_hi, lut2d, (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
        )  # (N, 64)
        oh_lo = io == lo[:, None]
        return jnp.sum(jnp.where(oh_lo, row, F32(0.0)), axis=1).reshape(
            ix.shape
        )

    dt, got = timeit(jax.jit(lut_mxu), idx)
    same = bool(jnp.all(got == ref))
    print(f"LUT one-hot MXU:  {dt*1e3:.2f} ms  bit-equal={same}", flush=True)


if __name__ == "__main__":
    main()


def variants():
    gh, gw, th, tw = 135, 15, 8, 128
    n_tiles, lanes = gh * gw, th * tw
    rng = np.random.default_rng(0)
    rgba_tf = jnp.asarray(rng.random((n_tiles, lanes, 4), dtype=np.float32))

    def pack_i32(x):
        # 4 channel cvts on (n_tiles, lanes) lanes, shift-or into one i32/px
        ch = [
            jnp.round(jnp.clip(x[..., c], F32(0.0), F32(1.0)) * F32(255.0))
            .astype(jnp.uint32) for c in range(4)
        ]
        return (ch[0] | (ch[1] << 8) | (ch[2] << 16) | (ch[3] << 24)).astype(
            jnp.uint32)

    dt, packed32 = timeit(jax.jit(pack_i32), rgba_tf)
    print(f"pack to one u32/px: {dt*1e3:.2f} ms", flush=True)

    def relayout32(x):
        img = (
            x.reshape(gh, gw, th, tw).transpose(0, 2, 1, 3)
            .reshape(gh * th, gw * tw)
        )
        img = img[:1080, :1920]
        return jax.lax.bitcast_convert_type(img, jnp.uint8)  # (H, W, 4)

    dt, out32 = timeit(jax.jit(relayout32), packed32)
    print(f"relayout u32 + bitcast: {dt*1e3:.2f} ms", flush=True)

    # reference: current path end-to-end
    def cur(x):
        p = sm.pack_unorm8(x, jnp)
        img = (
            p.reshape(gh, gw, th, tw, 4).transpose(0, 2, 1, 3, 4)
            .reshape(gh * th, gw * tw, 4)
        )
        return img[:1080, :1920]

    dt, ref = timeit(jax.jit(cur), rgba_tf)
    print(f"current pack+relayout: {dt*1e3:.2f} ms", flush=True)
    new = jax.jit(lambda x: relayout32(pack_i32(x)))(rgba_tf)
    print("bit-equal:", bool(jnp.all(new == ref)), flush=True)


variants()
