"""Run-bounds of a sorted key stream via a Pallas counting kernel.

Replaces ``jnp.searchsorted(key_sorted, arange(K))`` in the fused
pipeline's binning (ops/binsort.sort_and_bounds).  The scan searchsorted
costs ~0.41 us per query on this TPU (binary search = 21 rounds of
scalar-path 1-D gathers; measured 6.7 ms at 8.1k queries / 26.5 ms at
64.8k over 1.5M keys — experiments/strip_feasibility_probe.py), which
made today's bounds a real frame cost and priced a finer bin grid out
entirely.

TPU-first formulation: after the ONE bin sort the keys are ascending, so
``bounds[v] = first position with key >= v`` needs no search.  Block b
(positions [1024*b, 1024*(b+1))) OWNS the value range
(last key of block b-1, last key of block b] — ownership partitions
[0, max key], so blocks never write the same bin and the sequential TPU
grid needs no cross-block accumulation:

* block-last keys are extracted on the XLA side (a static stride slice)
  and prefetched as scalars, so the kernel's loop bounds never touch
  VMEM;
* per 128-aligned bin window intersecting the owned range: count local
  keys < v with one exact f32 transpose matmul (keys and bin ids are
  < 2^24) + 8 sublane compare-accumulates, and write
  ``bounds[v] = block_base + count`` via a masked read-modify-write
  into a whole-array VMEM output (lanes outside the owned range keep
  their contents — their owner writes them in its own step);
* bins above the global maximum key have no owner and are filled with S
  on the XLA side.

Exactness: counts are integer sums of comparison results; the transpose
matmul moves values < 2^24 through f32, which is exact.  The result is
bit-identical to the searchsorted form (tests/test_fused.py asserts
equality directly, and the fused-vs-oracle parity suite pins it
end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = np.float32
I32 = np.int32

_BLK = 1024  # keys per grid step (8 sublanes x 128 lanes)
_W = 128  # bin-window lanes


def _kernel(lasts_ref, keys_ref, bounds_ref, *, n_lanes: int):
    b = pl.program_id(0)
    p0 = b * _BLK
    klo = lasts_ref[b] + 1  # first owned bin value
    khi = lasts_ref[b + 1]  # last owned bin value

    keys = keys_ref[0]  # (8, 128) int32, values < 2^24
    eye8 = (
        jax.lax.broadcasted_iota(I32, (8, 8), 0)
        == jax.lax.broadcasted_iota(I32, (8, 8), 1)
    ).astype(F32)

    def tpose(x):  # (8, 128) f32 -> (128, 8) via identity matmul
        return jax.lax.dot_general(
            x, eye8, (((0,), (0,)), ((), ())), preferred_element_type=F32
        )

    # EXACT transpose despite the MXU's default single-bf16 pass: each
    # byte plane is <= 255 (exact in bf16, as is the 0/1 identity), so
    # each matmul is exact and the f32 recombination is exact < 2^24.
    # A single f32 matmul of the raw keys silently rounds values > 256
    # through bf16 — wrong bounds at real tile counts (caught on
    # hardware; interpret mode computes true f32 and hides it).
    kT = (
        tpose(((keys >> 16) & 0xFF).astype(F32)) * F32(65536.0)
        + tpose(((keys >> 8) & 0xFF).astype(F32)) * F32(256.0)
        + tpose((keys & 0xFF).astype(F32))
    )  # (128, 8)

    lane = jax.lax.broadcasted_iota(I32, (1, _W), 1)

    @pl.when(khi >= klo)
    def _():
        a0 = (klo // _W) * _W  # first aligned window start

        def win(w, _):
            # both operands are 128-multiples; hint it for Mosaic's
            # alignment prover (it can't see through the min)
            base = pl.multiple_of(
                jnp.minimum(a0 + w * _W, n_lanes - _W), _W
            )
            v = base + lane  # (1, 128) aligned bin values
            vf = v.astype(F32)
            cnt = jnp.zeros((1, _W), I32)
            for c in range(8):
                col = kT[:, c : c + 1]  # (128, 1) keys of sublane c
                cnt = cnt + jnp.sum(
                    (col < vf).astype(I32), axis=0, keepdims=True
                )
            own = (v >= klo) & (v <= khi)
            idx = pl.ds(base, _W)
            cur = bounds_ref[0:1, idx]
            bounds_ref[0:1, idx] = jnp.where(own, p0 + cnt, cur)
            return 0

        nwin = (khi - a0) // _W + 1
        jax.lax.fori_loop(0, nwin, win, 0)


@functools.partial(jax.jit, static_argnames=("n_bins", "interpret"))
def sorted_run_bounds(key_sorted, n_bins: int, interpret: bool = False):
    """bounds[v] = first index i with key_sorted[i] >= v, for v in
    [0, n_bins); key_sorted ascending int32, values in [0, n_bins).
    Bit-equal to ``jnp.searchsorted(key_sorted, arange(n_bins),
    side="left")``.  Requires n_bins < 2^24 (f32 matmul exactness)."""
    assert n_bins < (1 << 24)
    s = key_sorted.shape[0]
    nb = -(-s // _BLK)
    pad = nb * _BLK - s
    kp = jnp.pad(key_sorted, (0, pad), constant_values=I32(n_bins - 1))
    # block-last keys with a leading -1: block b owns (lasts[b], lasts[b+1]]
    lasts = jnp.concatenate(
        [jnp.full((1,), -1, I32), kp[_BLK - 1 :: _BLK].astype(I32)]
    )
    n_lanes = max(-(-n_bins // _W) * _W, 2 * _W)
    out = pl.pallas_call(
        functools.partial(_kernel, n_lanes=n_lanes),
        out_shape=jax.ShapeDtypeStruct((1, n_lanes), I32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, _W), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, n_lanes), lambda b, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(lasts, kp.reshape(nb, 8, _W))
    # bins above the global max key have no owner: bounds = s there.
    # Padding keys (value n_bins - 1) sit after every real row, so an
    # owned bin's first >= position is never past s.
    v = jnp.arange(n_lanes, dtype=I32)
    bounds = jnp.where(v > lasts[nb], I32(s), out[0])
    return bounds[:n_bins]
