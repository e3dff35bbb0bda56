"""Exact MXU one-hot gather: triangle-corner assembly via int8 matmuls.

XLA's general gather runs on the TPU scalar path (~22 ns/row); with
meshlet-local indices (scene.build_meshlets packs every 128 triangles
against a 128-row vertex window) the gather becomes, per meshlet,

    one_hot(local_idx) (384, 128) int8  @  vertex_bytes (128, 32) int8
        -> gathered byte values (384, 32) int32

which the MXU executes EXACTLY (int8 x int8 -> int32 accumulation is
integer arithmetic; at most one nonzero per one-hot row).  Measured 3.7
ns/row vs 22 (experiments/onehot_gather_probe.py) — and bit-exact, so the
oracle-parity contract is untouched.

The int32 fields are reassembled from bytes in plain XLA (shifts/ors on
int32 wrap, preserving bit patterns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import MESHLET_TRIS, MESHLET_VERTS

I32 = np.int32
I8 = np.int8

# ---------------------------------------------------------------------------
# Generic corner-row gather with IN-KERNEL byte reassembly (round-2): the
# wrapper above materializes int32-per-byte outputs (16x the bytes) and
# reassembles in XLA, which made it memory-bound.  This version uses the
# byte-interleaved 128-wide i8 table layout + circular-roll reassembly
# (non-zero lane-offset slices of matmul results miscompile on this Mosaic
# version — see ops/fused_kernel.py) and writes final int32 fields.
# ---------------------------------------------------------------------------


def _rows_kernel(idx_ref, tbl_ref, out_ref, *, nf: int):
    # one-hot over this meshlet's 128-row table, all 3 corners in one matmul
    rels = []
    for c in range(3):
        rel = idx_ref[0, c : c + 1, :]  # (1, 128)
        rels.append(rel.reshape(MESHLET_TRIS, 1))
    rel_cat = jnp.concatenate(rels, axis=0)  # (384, 1)
    iota = jax.lax.broadcasted_iota(I32, (3 * MESHLET_TRIS, MESHLET_VERTS), 1)
    oh = (iota == rel_cat).astype(I8)
    got = jnp.dot(oh, tbl_ref[:], preferred_element_type=I32)  # (384, 128)
    r1 = pltpu.roll(got, 128 - nf, 1)
    r2 = pltpu.roll(got, 128 - 2 * nf, 1)
    r3 = pltpu.roll(got, 128 - 3 * nf, 1)
    full = (got & 255) | ((r1 & 255) << 8) | ((r2 & 255) << 16) | (r3 << 24)
    vals = full[:, 0:nf]  # (384, nf)
    out_ref[...] = jnp.concatenate(
        [
            vals[0:MESHLET_TRIS],
            vals[MESHLET_TRIS : 2 * MESHLET_TRIS],
            vals[2 * MESHLET_TRIS :],
        ],
        axis=1,
    )  # (128, 3*nf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_tri_rows(tbl, local_tri, interpret: bool = False):
    """Exact meshlet-local corner gather: tbl (V, F) int32 with
    V = n_meshlets * 128, local_tri (T, 3) int32 in [0, 128).  Returns
    (T, 3*F) int32 — corner k's row at cols [k*F, (k+1)*F), bitwise equal
    to tbl[tri_v[:, k]].  F <= 32.

    2-D on purpose: a (T, 3, F) result would tile-pad its (3, F) minor dims
    to (8, 128) — 5.4 GB of phantom HBM at 1.3M triangles, measured to turn
    every downstream slice into a ~100 ms relayout."""
    v, nf = tbl.shape
    assert nf <= 32
    m = v // MESHLET_VERTS
    t = local_tri.shape[0]
    assert t == m * MESHLET_TRIS, (t, m)

    # byte-interleaved (V, 128) i8 rows: cols [nf*k, nf*k+nf) = byte k
    planes = [
        ((tbl >> (8 * k)) & 0xFF).astype(jnp.uint8).astype(I8)
        for k in range(4)
    ]
    tblb = jnp.concatenate(planes, axis=1)
    tblb = jnp.pad(tblb, ((0, 0), (0, 128 - 4 * nf)))

    idx = (
        local_tri.reshape(m, MESHLET_TRIS, 3).transpose(0, 2, 1)
    )  # (M, 3, 128)

    out = pl.pallas_call(
        functools.partial(_rows_kernel, nf=nf),
        out_shape=jax.ShapeDtypeStruct((t, 3 * nf), jnp.int32),
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, 3, MESHLET_TRIS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MESHLET_VERTS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (MESHLET_TRIS, 3 * nf), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(idx, tblb)
    return out
