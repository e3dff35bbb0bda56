"""Probe: per-group row-window skipping in phase V via lax.cond.

The headline scene's triangles are 1-2 px tall, but eval_group sweeps all
8 tile rows for every 32-triangle group (~31 vreg-ops per group-row).  If
the sort key orders each (tile, group) run by the triangle's first covered
row (3 band bits), consecutive groups become row-coherent, and the kernel
can compute a conservative per-group row window [g_r0, g_r1) from the
coords and branch around the whole per-row eval with lax.cond — REGISTER
accumulators intact (the earlier measured negative used VMEM RMW accs +
dynamic fori bounds; this keeps the static unroll and only gates each row).

Correctness is free: rows outside the window fail the exact coverage test
anyway, so skipping them cannot change the winner reduction (verified here
by bitwise-comparing base vs skip outputs on the same table).

Variants:
  base:  current kernel shape — all 8 rows unconditionally;
  skip:  per-row lax.cond gated by the group's row window.

Both run on band-coherent synthetic data (tiny triangles, groups spanning
~2 rows) at the headline workload shape.
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
GW = 15
DEPTH_SENTINEL = sm.DEPTH_MAX + 1


def _unpack16(p, min_c):
    return ((p & 0xFFFF) + min_c), (((p >> 16) & 0xFFFF) + min_c)


def _kernel(tbl_ref, vis_d_ref, vis_t_ref, *, variant: str):
    t = pl.program_id(0)
    min_c = I32(-512)
    sx0 = (t % GW) * TILE_W * SS + SS // 2
    sy0 = (t // GW) * TILE_H * SS + SS // 2
    colp = jax.lax.broadcasted_iota(I32, (1, TILE_W), 1)

    acc_d = [jnp.full((1, TILE_W), sm.DEPTH_MAX, I32) for _ in range(TILE_H)]
    acc_t = [jnp.full((1, TILE_W), sm.BG_TRI, I32) for _ in range(TILE_H)]
    acc = tuple(acc_d + acc_t)

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
        zq01 = blk[:, 3:4]
        zq0 = zq01 & 0xFFFF
        zq1 = (zq01 >> 16) & 0xFFFF
        zq2 = blk[:, 4:5]
        inv_area = jax.lax.bitcast_convert_type(blk[:, 5:6], F32)

        if variant == "skip":
            # conservative covered-row window from the group's y coords
            ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
            ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
            g_r0 = jnp.min(ymin) - sy0  # subpixel, relative to row-0 sample
            g_r1 = jnp.max(ymax) - sy0
            r_lo = g_r0 // I32(SS)  # floor div: negative -> conservative
            r_hi = g_r1 // I32(SS)

        def row_eval(r, acc_d_r, acc_t_r):
            er0 = e0 + bss0 * r
            er1 = e1 + bss1 * r
            er2 = e2 + bss2 * r
            cov = (er0 >= t0) & (er1 >= t1) & (er2 >= t2)
            d16 = sm.interp_depth16(er0, er1, er2, inv_area, zq0, zq1, zq2, jnp)
            dmask = jnp.where(cov, d16, I32(DEPTH_SENTINEL))
            dmin = jnp.min(dmask, axis=0, keepdims=True)
            twin = jnp.max(
                jnp.where(dmask == dmin, ids_g, I32(sm.BG_TRI)),
                axis=0, keepdims=True,
            )
            better = sm.depth_key_better(dmin, twin, acc_d_r, acc_t_r)
            return (
                jnp.where(better, dmin, acc_d_r),
                jnp.where(better, twin, acc_t_r),
            )

        for r in range(TILE_H):
            if variant == "skip":
                pred = (r >= r_lo) & (r <= r_hi)
                acc_d[r], acc_t[r] = jax.lax.cond(
                    pred,
                    lambda r=r: row_eval(r, acc_d[r], acc_t[r]),
                    lambda r=r: (acc_d[r], acc_t[r]),
                )
            else:
                acc_d[r], acc_t[r] = row_eval(r, acc_d[r], acc_t[r])
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
    # band-coherent tiny triangles: group g of tile t lives in row band
    # (g % 4)*2, each triangle ~1.5 px tall/wide inside the tile
    min_c = -512
    ty = (np.arange(NT) // GW)[:, None] * (TILE_H * SS)
    tx = (np.arange(NT) % GW)[:, None] * (TILE_W * SS)
    band = ((np.arange(SLOTS) // GRP_T) % 4)[None, :] * (2 * SS)
    y_base = ty + band + rng.integers(0, SS, (NT, SLOTS))
    x_base = tx + rng.integers(0, TILE_W * SS - 2 * SS, (NT, SLOTS))
    xs = np.stack([x_base + rng.integers(0, 24, (NT, SLOTS))
                   for _ in range(3)], -1)
    ys = np.stack([y_base + rng.integers(0, 24, (NT, SLOTS))
                   for _ in range(3)], -1)
    xs -= min_c
    ys -= min_c
    for c in range(3):
        tbl[..., c] = (xs[..., c] | (ys[..., c] << 16)).astype(np.int32)
    tbl[..., 3] = rng.integers(0, 1 << 31, (NT, SLOTS)).astype(np.int32)
    tbl[..., 4] = rng.integers(0, 65536, (NT, SLOTS)).astype(np.int32)
    tbl[..., 5] = np.float32(rng.uniform(0.001, 1.0, (NT, SLOTS))).view(np.int32)
    tbl[..., 6] = rng.integers(0, 1 << 20, (NT, SLOTS)).astype(np.int32)
    tbl = jnp.asarray(tbl)

    def force(o):
        return [np.asarray(x.ravel()[:2]) for x in jax.tree.leaves(o)]

    outs = {}
    for variant in ("base", "skip"):
        out = run(tbl, variant)
        force(out)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(tbl, variant)
        force(out)
        dt = (time.perf_counter() - t0) / reps
        outs[variant] = tuple(np.asarray(x) for x in out)
        pairs = NT * SLOTS * TILE_H * TILE_W
        print(
            f"{variant:5s}: {dt*1000:7.2f} ms  "
            f"({dt/pairs*1e12:.2f} ps/pair, {pairs/1e6:.0f}M pairs)",
            flush=True,
        )
    eq = all(
        (outs["base"][i] == outs["skip"][i]).all() for i in range(2)
    )
    print(f"bitwise equal: {eq}", flush=True)
    assert eq


if __name__ == "__main__":
    main()
