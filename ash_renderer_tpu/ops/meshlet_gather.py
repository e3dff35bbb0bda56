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

GB = 8  # meshlets per grid step
OUT = 3 * MESHLET_TRIS  # gathered rows per meshlet (3 corners x 128 tris)
FIELDS = 8  # int32 fields per vertex row
BYTES = 4 * FIELDS


def _kernel(idx_ref, tbl_ref, out_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (OUT, MESHLET_VERTS), 1)
    for g in range(GB):
        idx = idx_ref[g]  # (OUT,)
        oh = (iota == idx[:, None]).astype(I8)
        tbl = tbl_ref[g * MESHLET_VERTS : (g + 1) * MESHLET_VERTS]
        out_ref[g] = jnp.dot(oh, tbl, preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_corners(vtx_pack, local_tri, interpret: bool = False):
    """vtx_pack: (V, 8) int32 with V = n_meshlets * 128; local_tri: (T, 3)
    int32 in [0, 128).  Returns (3, T, 8) int32, bitwise equal to
    ``vtx_pack[tri_v[:, k]]`` for each corner k."""
    v = vtx_pack.shape[0]
    m = v // MESHLET_VERTS
    t = local_tri.shape[0]
    assert t == m * MESHLET_TRIS, (t, m)

    # (M, 384) index layout: corner-major then triangle
    idx = (
        local_tri.reshape(m, MESHLET_TRIS, 3)
        .transpose(0, 2, 1)
        .reshape(m, OUT)
    )
    # int32 rows -> little-endian bytes (minor dim = least significant)
    tbl_bytes = jax.lax.bitcast_convert_type(vtx_pack, jnp.int8).reshape(
        v, BYTES
    )
    # pad meshlet count to the grid-block multiple (padding output discarded)
    mp = -(-m // GB) * GB
    if mp != m:
        idx = jnp.pad(idx, ((0, mp - m), (0, 0)))
        tbl_bytes = jnp.pad(
            tbl_bytes, ((0, (mp - m) * MESHLET_VERTS), (0, 0))
        )

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((mp, OUT, BYTES), jnp.int32),
        grid=(mp // GB,),
        in_specs=[
            pl.BlockSpec((GB, OUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (GB * MESHLET_VERTS, BYTES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (GB, OUT, BYTES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(idx, tbl_bytes)

    # reassemble int32 fields from byte values (int32 shifts wrap: exact bits)
    b = out & jnp.int32(0xFF)
    fields = []
    for f in range(FIELDS):
        fields.append(
            b[..., 4 * f]
            | (b[..., 4 * f + 1] << 8)
            | (b[..., 4 * f + 2] << 16)
            | (b[..., 4 * f + 3] << 24)
        )
    res = jnp.stack(fields, axis=-1)[:m]  # (M, OUT, 8)
    return (
        res.reshape(m, 3, MESHLET_TRIS, FIELDS)
        .transpose(1, 0, 2, 3)
        .reshape(3, t, FIELDS)
    )
