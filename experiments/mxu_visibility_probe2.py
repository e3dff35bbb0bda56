"""Corrected MXU-visibility feasibility probe (apples-to-apples).

Round-3's mxu_visibility_probe.py reported "5.9x" (39 ns vs 230 ns per
tri-tile pair) — but it compared a 16x128-pixel-tile matmul core against
the real kernel's 8x128 tiles (2x the pixels per 'pair'), with no DMA
streaming, no window masking, no exact-int machinery, and a per-block
f32 argmin winner.  Per PIXEL-pair the gap is 230/1024 = 0.225 ns vs
39/2048 = 0.019 ns — and an element-op count puts BOTH forms near the
VPU roofline, so most of the "5.9x" is tile-size mismatch + missing
machinery, not MXU magic.

This probe runs both cores on the SAME 8x128 tile with the same group
size and the same winner reduction structure, plus the exactness costs
the MXU form would actually need (byte-split matmuls for int32 edges):

  a) the real kernel's eval_group structure (incremental int edges,
     sublane-grouped winner merge) — copied shape-for-shape;
  b) f32-matmul edge planes (P, 3) @ (3, T) + lane-axis winner reduction
     (INEXACT — would break the parity contract; upper bound only);
  c) b + byte-split exact matmuls (3 planes x 3 byte passes) — the
     cheapest EXACT MXU form.

Prints ns per (tri, tile) slot for each.  If (c) is not clearly below
(a), the MXU respec is a measured negative and phase V stays as is.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32, I32, I8 = jnp.float32, jnp.int32, np.int8

TH, TW = 8, 128
P = TH * TW
GRP = 32       # triangles per group (real kernel GRP_T)
NG = 8         # groups per tile => 256 slots/tile
NT = 1024      # tiles
SLOTS = NT * NG * GRP


def mk_inputs(seed=0):
    rng = np.random.default_rng(seed)
    # per-slot records: corner coords in a 2048-subpixel box near the tile
    recs = rng.integers(0, 2048, (NT, NG * GRP, 6), dtype=np.int32)
    zq = rng.integers(0, 65535, (NT, NG * GRP, 3), dtype=np.int32)
    inv = (1.0 / rng.uniform(8, 5000, (NT, 1, NG * GRP))).astype(np.float32)
    return jnp.asarray(recs), jnp.asarray(zq), jnp.asarray(inv)


def kernel_vpu(recs_ref, zq_ref, inv_ref, out_d, out_t):
    """Structure copy of fused_kernel.eval_group: incremental int32 edges,
    8-row sweep, sublane winner reduction."""
    acc_d = [jnp.full((1, TW), 65535, I32) for _ in range(TH)]
    acc_t = [jnp.full((1, TW), -1, I32) for _ in range(TH)]
    colp = jax.lax.broadcasted_iota(I32, (1, TW), 1)

    for g in range(NG):
        blk = recs_ref[0, g * GRP:(g + 1) * GRP, :]  # (GRP, 6)
        zqg = zq_ref[0, g * GRP:(g + 1) * GRP, :]
        invg = inv_ref[0, 0, g * GRP:(g + 1) * GRP]
        x0, y0 = blk[:, 0:1], blk[:, 1:2]
        x1, y1 = blk[:, 2:3], blk[:, 3:4]
        x2, y2 = blk[:, 4:5], blk[:, 5:6]
        ids = jax.lax.broadcasted_iota(I32, (GRP, 1), 0) + g * GRP
        a0 = -(y2 - y1); b0 = x2 - x1
        a1 = -(y0 - y2); b1 = x0 - x2
        a2 = -(y1 - y0); b2 = x1 - x0
        e0 = a0 * (colp * 16 - x1) + b0 * (8 - y1)
        e1 = a1 * (colp * 16 - x2) + b1 * (8 - y2)
        e2 = a2 * (colp * 16 - x0) + b2 * (8 - y0)
        z0 = zqg[:, 0:1].astype(F32)
        z1 = zqg[:, 1:2].astype(F32)
        z2 = zqg[:, 2:3].astype(F32)
        iv = invg[:, None]
        for r in range(TH):
            cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            num = (e0.astype(F32) * z0 + e1.astype(F32) * z1) + (
                e2.astype(F32) * z2
            )
            d16 = jnp.clip(jnp.round(num * iv), 0, 65535).astype(I32)
            dmask = jnp.where(cov, d16, I32(65536))
            dmin = jnp.min(dmask, axis=0, keepdims=True)
            twin = jnp.max(
                jnp.where(dmask == dmin, ids, I32(-1)), axis=0, keepdims=True
            )
            better = (dmin < acc_d[r]) | ((dmin == acc_d[r]) & (twin > acc_t[r]))
            acc_d[r] = jnp.where(better, dmin, acc_d[r])
            acc_t[r] = jnp.where(better, twin, acc_t[r])
            if r + 1 < TH:
                e0 = e0 + b0 * 16
                e1 = e1 + b1 * 16
                e2 = e2 + b2 * 16
    out_d[0] = jnp.concatenate(acc_d, axis=0)
    out_t[0] = jnp.concatenate(acc_t, axis=0)


def kernel_mxu(coef_ref, z_ref, out_d, out_t, *, exact: bool):
    """Matmul edge planes for ALL P pixels x GRP*NG tris of the tile, then
    per-pixel winner over the slot lane axis, group by group.
    coef: (1, 4, NG*GRP*4) f32 rows [e00, a, b, byte-planes...]; here we
    synthesize: e(p) = e00 + a*col + b*row via (P,3)@(3,T).
    exact=True adds the byte-split passes an int32-exact form needs
    (3 bytes per coefficient => 3x the matmuls, recombined in f32)."""
    pix = jnp.concatenate(
        [
            jnp.ones((P, 1), F32),
            (jax.lax.broadcasted_iota(I32, (P, 1), 0) % TW).astype(F32),
            (jax.lax.broadcasted_iota(I32, (P, 1), 0) // TW).astype(F32),
        ],
        axis=1,
    )  # (P, 3)
    acc_d = jnp.full((P, 1), 65535.0, F32)
    acc_t = jnp.full((P, 1), -1, I32)
    T = GRP  # evaluate one group at a time (VMEM-bounded like the real kernel)
    for g in range(NG):
        base = g * GRP * 4
        planes = []
        for e in range(4):  # e0, e1, e2, depth-numerator
            c = coef_ref[0, :, base + e * GRP: base + (e + 1) * GRP]  # (3,T)
            if exact:
                # byte-split the coefficient matrix: 3 exact passes
                p = jnp.zeros((P, T), F32)
                for k in range(3):
                    ck = jnp.floor(c / (256.0 ** k)) % 256.0
                    p = p + jnp.dot(
                        pix, ck, preferred_element_type=F32
                    ) * F32(256.0 ** k)
                planes.append(p)
            else:
                planes.append(jnp.dot(pix, c, preferred_element_type=F32))
        e0, e1, e2, zn = planes
        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        iv = z_ref[0, 0:1, g * GRP:(g + 1) * GRP]  # (1, T) inv_area
        d16 = jnp.clip(jnp.round(zn * iv), 0, 65535)
        dmask = jnp.where(cov, d16, F32(65536.0))
        dmin = jnp.min(dmask, axis=1, keepdims=True)  # lane reduction (P,1)
        ids = jax.lax.broadcasted_iota(I32, (1, T), 1) + g * GRP
        twin = jnp.max(
            jnp.where(dmask == dmin, ids, I32(-1)), axis=1, keepdims=True
        )
        better = (dmin < acc_d) | ((dmin == acc_d) & (twin > acc_t))
        acc_d = jnp.where(better, dmin, acc_d)
        acc_t = jnp.where(better, twin, acc_t)
    out_d[0] = acc_d.astype(I32).reshape(TH, TW)
    out_t[0] = acc_t.reshape(TH, TW)


def run_vpu(recs, zq, inv):
    return pl.pallas_call(
        kernel_vpu,
        out_shape=(
            jax.ShapeDtypeStruct((NT, TH, TW), I32),
            jax.ShapeDtypeStruct((NT, TH, TW), I32),
        ),
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, NG * GRP, 6), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NG * GRP, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NG * GRP), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TH, TW), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(recs, zq, inv)


def run_mxu(coefs, zs, exact):
    return pl.pallas_call(
        functools.partial(kernel_mxu, exact=exact),
        out_shape=(
            jax.ShapeDtypeStruct((NT, TH, TW), I32),
            jax.ShapeDtypeStruct((NT, TH, TW), I32),
        ),
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 3, NG * GRP * 4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NG * GRP), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TH, TW), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(coefs, zs)


def bench(fn, *args, label, reps=10):
    out = fn(*args)
    [np.asarray(x.ravel()[:1]) for x in jax.tree.leaves(out)]
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    [np.asarray(x.ravel()[:1]) for x in jax.tree.leaves(out)]
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:7.2f} ms  -> {dt/SLOTS*1e9:6.1f} ns/slot",
          flush=True)
    return dt


def main():
    recs, zq, inv = mk_inputs()
    rng = np.random.default_rng(1)
    coefs = jnp.asarray(
        rng.uniform(-1000, 1000, (NT, 3, NG * GRP * 4)).astype(np.float32)
    )
    zs = jnp.asarray(
        rng.uniform(0, 1, (NT, 1, NG * GRP)).astype(np.float32)
    )
    jv = jax.jit(run_vpu)
    jm_f = jax.jit(functools.partial(run_mxu, exact=False))
    jm_x = jax.jit(functools.partial(run_mxu, exact=True))
    print(f"{SLOTS} slots ({NT} tiles x {NG*GRP} tris), 8x128 tiles",
          flush=True)
    bench(jv, recs, zq, inv, label="a) VPU incremental (kernel structure)")
    bench(jm_f, coefs, zs, label="b) MXU f32 (INEXACT upper bound)  ")
    bench(jm_x, coefs, zs, label="c) MXU byte-split exact           ")


if __name__ == "__main__":
    main()
