"""Probe: Mosaic/Pallas mechanics needed by the fused raster+shade kernel.

Tests (compile + exactness + rough cost on TPU):
  1. dynamic-row-offset DMA of an (S, F) int8 table from HBM -> VMEM
  2. in-kernel one-hot i8 matmul gather (exactness with arbitrary i32 bytes)
  3. sublane-slice copies into a (1, 1024) scratch (tile flatten)
  4. distribute matmul (F,128)@(128,1024) byte-planes + reassembly
  5. static (8,1) field slices from a (128, F) VMEM block + sublane reduce
  6. pltpu.roll with traced shift; pltpu.repeat semantics
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = np.int32
I8 = np.int8


def force(x):
    return [np.asarray(l.ravel()[:1]) for l in jax.tree.leaves(x)]


def timeit(fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / reps, out


S = 1 << 20
F = 48
FB = 4 * F  # bytes per row
W = 1024  # gather window rows
NB = 2048  # blocks to process


def test_windowed_gather():
    """Blocks of 128 ascending indices; in-kernel: DMA (Wt,128)-i8 window of
    a byte-plane-interleaved table, one one-hot i8 matmul, reassemble int32
    fields from contiguous 8-wide lane slices."""
    rng = np.random.default_rng(0)
    NF = 8
    tbl = rng.integers(-(2**31), 2**31, (S, NF), dtype=np.int64).astype(I32)
    # byte-plane-major 128-wide i8 rows: cols [8k:8k+8] = byte k of fields
    tbl_b = np.zeros((S + W + 128, 128), dtype=I8)
    for k in range(4):
        tbl_b[:S, 8 * k : 8 * k + 8] = (
            ((tbl >> (8 * k)) & 0xFF).astype(np.uint8).view(I8)
        )
    base = rng.integers(0, S - W, NB)
    offs = np.sort(rng.integers(0, W - 1, (NB, 128)), axis=1)
    idx = (base[:, None] + offs).astype(I32)

    def kernel(idx_hbm, tbl_hbm, out_ref, ids_s, win, sem, sem2):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(idx_hbm.at[b], ids_s, sem2)
        cp.start()
        cp.wait()
        first = ids_s[0, 0]
        base128 = (first // 128) * 128
        dma = pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(base128, W + 128)], win, sem
        )
        dma.start()
        rel = ids_s[0:1, :] - base128  # (1,128)
        iota_w = jax.lax.broadcasted_iota(I32, (128, W + 128), 1)
        oh = (iota_w == rel.reshape(128, 1)).astype(I8)
        dma.wait()
        got = jnp.dot(oh, win[:], preferred_element_type=I32)  # (128, 128)
        out = (
            (got[:, 0:8] & 255)
            | ((got[:, 8:16] & 255) << 8)
            | ((got[:, 16:24] & 255) << 16)
            | (got[:, 24:32] << 24)
        )
        out_ref[0] = out

    @jax.jit
    def run(idx, tblb):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NB, 128, NF), I32),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128, NF), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, 128), I32),
                pltpu.VMEM((W + 128, 128), I8),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(idx.reshape(NB, 1, 128), tblb)

    try:
        dt, out = timeit(run, jnp.asarray(idx), jnp.asarray(tbl_b))
        host = np.asarray(out[:4])
        ref = np.stack([tbl[idx[b]] for b in range(4)])
        n = NB * 128
        print(
            f"windowed gather (interleaved 128-i8): {dt*1000:.2f} ms for "
            f"{n} rows = {dt/n*1e9:.1f} ns/row; exact: "
            f"{np.array_equal(host, ref)}",
            flush=True,
        )
    except Exception as e:
        print(f"windowed gather FAILED: {type(e).__name__}: {e}"[:400],
              flush=True)


def test_dist_gather_transposed():
    """Distribute-side gather: (4, 44, S) transposed i8 byte planes, lane-dim
    window DMA, (44,Wd)@(Wd,128) matmuls -> field-major records."""
    rng = np.random.default_rng(1)
    FD = 44
    tbl = rng.integers(-(2**31), 2**31, (S, FD), dtype=np.int64).astype(I32)
    planes = np.zeros((4, FD, S + W + 256), dtype=I8)
    for k in range(4):
        planes[k, :, :S] = (
            ((tbl >> (8 * k)) & 0xFF).astype(np.uint8).view(I8).T
        )
    base = rng.integers(0, S - W, NB)
    offs = np.sort(rng.integers(0, W - 1, (NB, 128)), axis=1)
    idx = (base[:, None] + offs).astype(I32)

    def kernel(idx_hbm, p_hbm, out_ref, ids_s, win, sem, sem2):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(idx_hbm.at[b], ids_s, sem2)
        cp.start()
        cp.wait()
        first = ids_s[0, 0]
        base128 = (first // 128) * 128
        for k in range(4):
            pltpu.make_async_copy(
                p_hbm.at[k, :, pl.ds(base128, W + 128)], win.at[k], sem.at[k]
            ).start()
        rel = ids_s[0:1, :] - base128  # (1,128)
        iota_w = jax.lax.broadcasted_iota(I32, (W + 128, 128), 0)
        ohg = (iota_w == rel).astype(I8)  # (W+128, 128)
        acc = None
        for k in range(4):
            pltpu.make_async_copy(
                p_hbm.at[k, :, pl.ds(base128, W + 128)], win.at[k], sem.at[k]
            ).wait()
            got = jnp.dot(win[k], ohg, preferred_element_type=I32)  # (44,128)
            got = got & 255 if k < 3 else got
            term = got << (8 * k) if k else got
            acc = term if acc is None else acc | term
        out_ref[0] = acc

    @jax.jit
    def run(idx, planes):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NB, FD, 128), I32),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, FD, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, 128), I32),
                pltpu.VMEM((4, FD, W + 128), I8),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(idx.reshape(NB, 1, 128), planes)

    try:
        dt, out = timeit(run, jnp.asarray(idx), jnp.asarray(planes))
        host = np.asarray(out[:4])
        ref = np.stack([tbl[idx[b]].T for b in range(4)])
        n = NB * 128
        print(
            f"dist transposed gather: {dt*1000:.2f} ms = "
            f"{dt/n*1e9:.1f} ns/row; exact: {np.array_equal(host, ref)}",
            flush=True,
        )
    except Exception as e:
        print(f"dist gather FAILED: {type(e).__name__}: {e}"[:400],
              flush=True)


def test_distribute():
    """Per tile: flatten (8,128) vis plane to (1,1024) scratch via 8 static
    sublane-slice copies, build ohT (128,1024), distribute recT byte planes
    (F,128)@(128,1024) and reassemble (F,1024) i32."""
    rng = np.random.default_rng(2)
    NT = 1024  # tiles
    FD = 48
    vis = rng.integers(-1, 128, (NT, 8, 128)).astype(I32)
    rec = rng.integers(-(2**31), 2**31, (NT, FD, 128), dtype=np.int64).astype(
        I32
    )
    tri = np.broadcast_to(np.arange(128, dtype=I32), (NT, 1, 128)).copy()
    rec = np.concatenate([rec, tri], axis=1)  # tri ids as the last field row

    def kernel(vis_ref, rec_ref, out_ref, flat):
        for y in range(8):
            flat[0:1, 128 * y : 128 * (y + 1)] = vis_ref[0, y : y + 1, :]
        tri_row = rec_ref[0, FD : FD + 1, :]  # (1,128)
        ohT = (tri_row.reshape(128, 1) == flat[:]).astype(I8)  # (128,1024)
        recs = rec_ref[0, :FD, :]  # (FD, 128) i32
        acc = None
        for k in range(4):
            plane = ((recs >> (8 * k)) & 255).astype(I8)
            got = jnp.dot(plane, ohT, preferred_element_type=I32)
            got = got & 255 if k < 3 else got
            term = got << (8 * k) if k else got
            acc = term if acc is None else acc | term
        out_ref[0] = acc

    @jax.jit
    def run(vis, rec, tri):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NT, FD, 1024), I32),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, FD + 1, 128), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, FD, 1024), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 1024), I32)],
        )(vis, rec, tri)

    try:
        dt, out = timeit(run, jnp.asarray(vis), jnp.asarray(rec))
        # exactness: out[t, :, y*128+x] == rec[t, :, vis[t,y,x]] (or 0 if -1)
        o = np.asarray(out[:3])
        ok = True
        for t in range(3):
            v = vis[t].reshape(-1)
            exp = np.where(
                v[None, :] >= 0, rec[t][:FD, np.clip(v, 0, 127)], 0
            )
            ok &= np.array_equal(o[t], exp)
        print(
            f"distribute: {dt*1000:.2f} ms for {NT} tiles "
            f"({dt/NT*1e6:.1f} us/tile); exact: {ok}",
            flush=True,
        )
    except Exception as e:
        print(f"distribute FAILED: {type(e).__name__}: {e}", flush=True)


def test_sublane_ops():
    """v3 visibility inner ops: (8,1) field slices from (128,F) block,
    sublane reductions, (8,128) eval — per-op cost sanity."""
    rng = np.random.default_rng(3)
    NT = 2048
    rec = rng.integers(-1000, 1000, (NT, 128, 16)).astype(I32)

    def kernel(rec_ref, out_d, out_t):
        acc_d = jnp.full((8, 128), 65535, I32)
        acc_t = jnp.full((8, 128), -1, I32)
        col = jax.lax.broadcasted_iota(I32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(I32, (8, 128), 0)
        r = rec_ref[0]  # (128, 16)
        for g in range(16):
            blk = r[8 * g : 8 * (g + 1), :]  # (8,16)
            a0 = blk[:, 0:1]
            b0 = blk[:, 1:2]
            e0c = blk[:, 2:3]
            zq = blk[:, 3:4].astype(np.float32)
            inv = blk[:, 4:5].astype(np.float32) * np.float32(1e-6)
            tid = blk[:, 5:6]
            for rrow in range(8):
                e0 = e0c + a0 * col + b0 * rrow
                cov = e0 >= 0
                d16 = jnp.clip(
                    jnp.round(e0.astype(np.float32) * zq * inv), 0, 65535
                ).astype(I32)
                dmask = jnp.where(cov, d16, I32(65536))
                dmin = jnp.min(dmask, axis=0, keepdims=True)  # (1,128)
                tw = jnp.max(
                    jnp.where(dmask == dmin, tid, I32(-1)), axis=0,
                    keepdims=True,
                )
                rowm = row == rrow
                better = rowm & (dmin < acc_d) & (tw >= 0)
                acc_d = jnp.where(better, dmin, acc_d)
                acc_t = jnp.where(better, tw, acc_t)
        out_d[0] = acc_d
        out_t[0] = acc_t

    @jax.jit
    def run(rec):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((NT, 8, 128), I32),
                jax.ShapeDtypeStruct((NT, 8, 128), I32),
            ),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((1, 128, 16), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        )(rec)

    try:
        dt, out = timeit(run, jnp.asarray(rec))
        pairs = NT * 128
        print(
            f"v3-style sublane visibility: {dt*1000:.2f} ms for {pairs} "
            f"pairs = {dt/pairs*1e9:.1f} ns/pair (8x128 tile)",
            flush=True,
        )
    except Exception as e:
        print(f"sublane ops FAILED: {type(e).__name__}: {e}", flush=True)


def test_roll_repeat():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 100, (1, 128)).astype(I32)
    s = np.array([[5]], dtype=I32)

    def kernel(x_ref, s_ref, out_roll, out_rep):
        sh = s_ref[0, 0]
        out_roll[:] = pltpu.roll(x_ref[:], sh, 1)
        r = pltpu.repeat(x_ref[:, 0:8], 16, 1)
        out_rep[:] = r

    @jax.jit
    def run(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, 128), I32),
                jax.ShapeDtypeStruct((1, 128), I32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(x, s)

    try:
        ro, rep = run(jnp.asarray(x), jnp.asarray(s))
        ro = np.asarray(ro)
        rep = np.asarray(rep)
        exp_roll_pos = np.roll(x[0], 5)
        exp_roll_neg = np.roll(x[0], -5)
        kind = (
            "roll=+shift(np.roll)" if np.array_equal(ro[0], exp_roll_pos)
            else "roll=-shift" if np.array_equal(ro[0], exp_roll_neg)
            else "roll=OTHER"
        )
        exp_interleave = np.repeat(x[0, :8], 16)
        exp_concat = np.tile(x[0, :8], 16)
        rkind = (
            "repeat=interleave(jnp.repeat)"
            if np.array_equal(rep[0], exp_interleave)
            else "repeat=tile-concat" if np.array_equal(rep[0], exp_concat)
            else "repeat=OTHER"
        )
        print(f"roll/repeat: {kind}; {rkind}", flush=True)
    except Exception as e:
        print(f"roll/repeat FAILED: {type(e).__name__}: {e}", flush=True)




def test_transpose():
    rng = np.random.default_rng(5)
    NT = 512
    x = rng.integers(-1000, 1000, (NT, 128, 48)).astype(I32)

    def kernel(x_ref, out_ref):
        out_ref[0] = jnp.transpose(x_ref[0], (1, 0))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NT, 48, 128), I32),
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, 128, 48), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 48, 128), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    try:
        dt, out = timeit(run, jnp.asarray(x))
        ok = np.array_equal(np.asarray(out[0]), x[0].T)
        print(f"in-kernel (128,48) transpose: {dt/NT*1e6:.2f} us/tile; "
              f"exact: {ok}", flush=True)
    except Exception as e:
        print(f"transpose FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    test_roll_repeat()
    test_transpose()
    test_sublane_ops()
    test_distribute()
    test_windowed_gather()
    test_dist_gather_transposed()
