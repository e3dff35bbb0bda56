"""The experimental lane-parallel visibility kernel is bit-identical to v1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ash_renderer_tpu import (
    Camera,
    Mesh,
    Scene,
    SceneObject,
    derive_raster_config,
)
from ash_renderer_tpu.oracle import geometry_oracle, visibility_oracle
from ash_renderer_tpu.ops import binning, raster_lanes


@pytest.mark.parametrize("seed", [5, 11])
def test_lane_kernel_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    nv, nt = 90, 110
    pos = rng.uniform(-2.5, 2.5, (nv, 3)).astype(np.float32)
    pos[:, 2] += 2.5
    mesh = Mesh(
        positions=pos, indices=rng.integers(0, nv, (nt, 3)).astype(np.int32)
    )
    sc = Scene()
    sc.add_object(SceneObject(mesh=sc.add_mesh(mesh)))
    cfg = derive_raster_config(160, 96, lane_kernel=True)
    assert cfg.tile_h == 8
    cam = Camera()
    su, attrs = geometry_oracle(
        sc.pack(), sc.model_matrices(), cam.view_matrix(),
        cam.projection_matrix(160 / 96), cfg, 64,
    )
    ovd, ovt = visibility_oracle(su, cfg)
    su_j = jax.tree.map(jnp.asarray, su)
    rec_i, rec_f, ts, tc, _ = jax.jit(
        lambda s: binning.bin_triangles(s, cfg, 1 << 14)
    )(su_j)
    vd, vt = raster_lanes.rasterize_visibility_lanes(
        rec_i, rec_f, ts, tc, cfg, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(vt), ovt)
    np.testing.assert_array_equal(np.asarray(vd), ovd)
