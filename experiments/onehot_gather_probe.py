"""Probe: exact one-hot int8 matmul gather in a Pallas TPU kernel.

Workload shape mimics the geometry corner gather: for each meshlet,
gather 384 rows (3 corners x 128 tris) of 32 bytes from a 128-row local
vertex table.  Exactness: int8 x one-hot -> int32 accumulate reproduces
bytes exactly; int32 fields reassembled by shifts.
"""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NM = 4096        # meshlets (~= 524k gathered rows)
ROWS = 128       # table rows per meshlet
OUT = 384        # gathered rows per meshlet
BYTES = 32       # 8 int32 fields

GB = 8  # meshlets per grid step

def kernel(idx_ref, tbl_ref, out_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (OUT, ROWS), 1)
    for m in range(GB):
        idx = idx_ref[m]  # (OUT,)
        oh = (iota == idx[:, None]).astype(jnp.int8)
        out_ref[m] = jnp.dot(oh, tbl_ref[m], preferred_element_type=jnp.int32)

@jax.jit
def run(indices, tables):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NM, OUT, BYTES), jnp.int32),
        grid=(NM // GB,),
        in_specs=[
            pl.BlockSpec((GB, OUT), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, ROWS, BYTES), lambda m: (m, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GB, OUT, BYTES), lambda m: (m, 0, 0),
                               memory_space=pltpu.VMEM),
    )(indices, tables)

rng = np.random.default_rng(0)
indices = jnp.asarray(rng.integers(0, ROWS, (NM, OUT)).astype(np.int32))
tables = jnp.asarray(rng.integers(-128, 128, (NM, ROWS, BYTES)).astype(np.int8))

def force(o): return [np.asarray(l.ravel()[:1]) for l in jax.tree.leaves(o)]
out = run(indices, tables); force(out)
t0=time.time(); REPS=10
for _ in range(REPS): out = run(indices, tables)
force(out)
dt=(time.time()-t0)/REPS
n = NM*OUT
print(f"one-hot gather: {dt*1000:.2f} ms for {n} rows x {BYTES}B -> {dt/n*1e9:.1f} ns/row", flush=True)
# exactness check
host = np.asarray(out[:8])
idx_h = np.asarray(indices[:8]); tbl_h = np.asarray(tables[:8])
ref = np.stack([tbl_h[m][idx_h[m]] for m in range(8)]).astype(np.int32)
print("exact:", np.array_equal(host, ref), flush=True)
print(f"(XLA gather baseline: ~45ms / 2M rows = 22 ns/row; here {dt/n*1e9:.1f} ns/row incl overheads)", flush=True)
