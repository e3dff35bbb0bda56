"""Probe: phase-V eval-loop cost, barycentric-depth spec vs plane-depth spec.

Replicates the fused kernel's visibility inner loop (32-triangle groups,
8-row sweeps, per-row winner reduction + merge) at the headline workload
shape (~2040 tiles x 384 slots), with the table pipelined HBM->VMEM per
tile, and times two eval variants:

  baryc: the current spec — unpack zq0/zq1/zq2, interp_depth16
         (3 cvt + 3 mul + 2 add + mul + round/clip per pair) and the
         3-compare + 2-and coverage test;
  plane: the candidate respec — per-triangle screen-space depth plane
         (z0f, dzdx, dzdy baked at setup), d16 = clip(round(dzdx*fx +
         (z0f + dzdy*fy))), fill-rule bias folded into the corner edge
         values so coverage is or/or/compare on sign bits.

Decision data for landing the respec in specmath/oracle/kernels.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")

from ash_renderer_tpu import specmath as sm

F32, I32 = np.float32, np.int32
NT = 2040          # tiles (1080p at 8x128)
SLOTS = 384        # streamed slots per tile (~headline avg incl. prefixes)
GRP_T = 32
TILE_H, TILE_W = 8, 128
SS = 16
DEPTH_SENTINEL = sm.DEPTH_MAX + 1


def _unpack16(p, min_c):
    return ((p & 0xFFFF) + min_c), (((p >> 16) & 0xFFFF) + min_c)


def _kernel(tbl_ref, vis_d_ref, vis_t_ref, *, variant: str):
    t = pl.program_id(0)
    min_c = I32(-512)
    sx0 = (t % 15) * TILE_W * SS + SS // 2
    sy0 = (t // 15) * TILE_H * SS + SS // 2
    colp = jax.lax.broadcasted_iota(I32, (1, TILE_W), 1)

    acc_d = [jnp.full((1, TILE_W), sm.DEPTH_MAX, I32) for _ in range(TILE_H)]
    acc_t = [jnp.full((1, TILE_W), sm.BG_TRI, I32) for _ in range(TILE_H)]
    acc = tuple(acc_d + acc_t)

    if variant == "plane":
        colf = (colp * SS).astype(F32)  # exact ints in f32

    def eval_group(blk, ids_g, acc):
        acc_d, acc_t = list(acc[:TILE_H]), list(acc[TILE_H:])
        x0, y0 = _unpack16(blk[:, 0:1], min_c)
        x1, y1 = _unpack16(blk[:, 1:2], min_c)
        x2, y2 = _unpack16(blk[:, 2:3], min_c)
        a0, b0, tl0 = sm.edge_coeffs(x1, y1, x2, y2)
        a1, b1, tl1 = sm.edge_coeffs(x2, y2, x0, y0)
        a2, b2, tl2 = sm.edge_coeffs(x0, y0, x1, y1)
        t0 = I32(1) - tl0.astype(I32)
        t1 = I32(1) - tl1.astype(I32)
        t2 = I32(1) - tl2.astype(I32)
        e0 = sm.edge_at(a0, b0, x1, y1, sx0, sy0) + (a0 * SS) * colp
        e1 = sm.edge_at(a1, b1, x2, y2, sx0, sy0) + (a1 * SS) * colp
        e2 = sm.edge_at(a2, b2, x0, y0, sx0, sy0) + (a2 * SS) * colp
        bss0, bss1, bss2 = b0 * SS, b1 * SS, b2 * SS

        if variant == "baryc":
            zq01 = blk[:, 3:4]
            zq0 = zq01 & 0xFFFF
            zq1 = (zq01 >> 16) & 0xFFFF
            zq2 = blk[:, 4:5]
            inv_area = jax.lax.bitcast_convert_type(blk[:, 5:6], F32)
            for r in range(TILE_H):
                cov = (e0 >= t0) & (e1 >= t1) & (e2 >= t2)
                d16 = sm.interp_depth16(e0, e1, e2, inv_area, zq0, zq1, zq2, jnp)
                dmask = jnp.where(cov, d16, I32(DEPTH_SENTINEL))
                dmin = jnp.min(dmask, axis=0, keepdims=True)
                twin = jnp.max(
                    jnp.where(dmask == dmin, ids_g, I32(sm.BG_TRI)),
                    axis=0, keepdims=True,
                )
                better = sm.depth_key_better(dmin, twin, acc_d[r], acc_t[r])
                acc_d[r] = jnp.where(better, dmin, acc_d[r])
                acc_t[r] = jnp.where(better, twin, acc_t[r])
                if r + 1 < TILE_H:
                    e0 = e0 + bss0
                    e1 = e1 + bss1
                    e2 = e2 + bss2
        else:
            dzdx = jax.lax.bitcast_convert_type(blk[:, 3:4], F32)
            dzdy = jax.lax.bitcast_convert_type(blk[:, 4:5], F32)
            z0f = jax.lax.bitcast_convert_type(blk[:, 5:6], F32)
            # fold the fill-rule bias into the corner values: cov == e' >= 0
            e0 = e0 - t0
            e1 = e1 - t1
            e2 = e2 - t2
            fxb = (sx0 - x0).astype(F32) + colf  # exact: both ints < 2^17
            for r in range(TILE_H):
                cov = (e0 | e1 | e2) >= 0
                fy = jnp.float32(sy0 + SS * r) - y0.astype(F32)
                zrow = z0f + dzdy * fy
                d16 = jnp.clip(
                    jnp.round(dzdx * fxb + zrow), 0, sm.DEPTH_MAX
                ).astype(I32)
                dmask = jnp.where(cov, d16, I32(DEPTH_SENTINEL))
                dmin = jnp.min(dmask, axis=0, keepdims=True)
                twin = jnp.max(
                    jnp.where(dmask == dmin, ids_g, I32(sm.BG_TRI)),
                    axis=0, keepdims=True,
                )
                better = sm.depth_key_better(dmin, twin, acc_d[r], acc_t[r])
                acc_d[r] = jnp.where(better, dmin, acc_d[r])
                acc_t[r] = jnp.where(better, twin, acc_t[r])
                if r + 1 < TILE_H:
                    e0 = e0 + bss0
                    e1 = e1 + bss1
                    e2 = e2 + bss2
        return tuple(acc_d + acc_t)

    def grp_body(g, acc):
        off = pl.multiple_of(GRP_T * g, GRP_T)
        blk = tbl_ref[0, pl.ds(off, GRP_T), 0:6]
        ids = tbl_ref[0, pl.ds(off, GRP_T), 6:7]
        return eval_group(blk, ids, acc)

    acc = jax.lax.fori_loop(0, SLOTS // GRP_T, grp_body, acc)
    vis_d_ref[:] = jnp.concatenate(list(acc[:TILE_H]), axis=0)
    vis_t_ref[:] = jnp.concatenate(list(acc[TILE_H:]), axis=0)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(tbl, variant):
    block = pl.BlockSpec(
        (TILE_H, TILE_W), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=(
            jax.ShapeDtypeStruct((NT * TILE_H, TILE_W), I32),
            jax.ShapeDtypeStruct((NT * TILE_H, TILE_W), I32),
        ),
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, SLOTS, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(block, block),
    )(tbl)


def main():
    rng = np.random.default_rng(0)
    tbl = np.zeros((NT, SLOTS, 128), np.int32)
    # plausible tiny-triangle records: coords near the tile, packed 16-bit
    xy = rng.integers(400, 600, (NT, SLOTS, 6)).astype(np.int64)
    tbl[..., 0] = (xy[..., 0] | (xy[..., 1] << 16)).astype(np.int32)
    tbl[..., 1] = (xy[..., 2] | (xy[..., 3] << 16)).astype(np.int32)
    tbl[..., 2] = (xy[..., 4] | (xy[..., 5] << 16)).astype(np.int32)
    tbl[..., 3] = rng.integers(0, 1 << 31, (NT, SLOTS)).astype(np.int32)
    tbl[..., 4] = rng.integers(0, 65536, (NT, SLOTS)).astype(np.int32)
    tbl[..., 5] = np.float32(rng.uniform(0.001, 1.0, (NT, SLOTS))).view(np.int32)
    tbl[..., 6] = rng.integers(0, 1 << 20, (NT, SLOTS)).astype(np.int32)
    tbl = jnp.asarray(tbl)

    def force(o):
        return [np.asarray(x.ravel()[:2]) for x in jax.tree.leaves(o)]

    for variant in ("baryc", "plane"):
        out = run(tbl, variant)
        force(out)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(tbl, variant)
        force(out)
        dt = (time.perf_counter() - t0) / reps
        pairs = NT * SLOTS * TILE_H * TILE_W
        print(
            f"{variant:6s}: {dt*1000:7.2f} ms  "
            f"({dt/pairs*1e12:.2f} ps/pair, {pairs/1e6:.0f}M pairs)",
            flush=True,
        )


if __name__ == "__main__":
    main()
