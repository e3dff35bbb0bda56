"""The Pallas triangle-setup kernel must reproduce the XLA setup path
bit-for-bit: comb-table rows, bin_sort streaming keys, and validity flags
(ops/setup_kernel.py vs ops/geometry.py + ops/tritables.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ash_renderer_tpu import (
    Camera,
    Mesh,
    Scene,
    SceneObject,
    derive_raster_config,
)
from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
from ash_renderer_tpu.ops import binsort, geometry, setup_kernel, tritables


def _packed_scene(seed, nv, nt, spread):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-spread, spread, (nv, 3)).astype(np.float32)
    pos[:, 2] += 2.5  # straddles the near plane for large spreads
    mesh = Mesh(
        positions=pos,
        indices=rng.integers(0, nv, (nt, 3)).astype(np.int32),
        colors=rng.uniform(0, 1, (nv, 4)).astype(np.float32),
    )
    sc = Scene()
    sc.add_object(SceneObject(mesh=sc.add_mesh(mesh)))
    return sc, sc.pack(meshlets=True)


@pytest.mark.parametrize(
    "seed,spread", [(1, 2.0), (2, 8.0), (4, 0.3)]
)
def test_setup_kernel_matches_xla_path(seed, spread):
    sc, packed = _packed_scene(seed, nv=170, nt=300, spread=spread)
    cfg = derive_raster_config(512, 256, tile_h=8)
    cam = Camera()
    view = cam.view_matrix()
    proj = cam.projection_matrix(2.0)
    mm = sc.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    args = (
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(mm), jnp.asarray(mvp),
    )
    t = packed.tri_v.shape[0]

    # ---- reference: XLA setup + comb assembly
    clip, attrs = geometry.transform_vertices(*args)
    su, attrs_full, gstats = geometry.geometry_device(
        clip, attrs, jnp.asarray(packed.tri_v), jnp.asarray(packed.tri_obj),
        jnp.asarray(packed.obj_material), cfg, 64,
        local_tri=jnp.asarray(packed.local_tri), interpret=True,
    )
    comb_ref = np.asarray(
        tritables.build_comb_table(
            su, attrs_full, cfg,
            local_tri=jnp.asarray(packed.local_tri), interpret=True,
        )
    )
    keys_ref = np.asarray(
        binsort.stream_keys(
            su.valid, su.x0, su.y0, su.x1, su.y1, su.x2, su.y2, cfg
        )
    )

    # ---- kernel path
    tblT = setup_kernel.transform_vertices_T(*args)
    tri_mat = packed.obj_material[
        np.clip(packed.tri_obj, 0, len(packed.obj_material) - 1)
    ]
    ltT, matT = setup_kernel.prep_static(
        packed.local_tri, tri_mat, packed.tri_v[:, 0] >= 0
    )
    comb_k, keys_k, flags_k, extx_k, exty_k = setup_kernel.triangle_setup(
        tblT, jnp.asarray(ltT), jnp.asarray(matT), cfg, interpret=True
    )
    comb_k = np.asarray(comb_k)
    flags_k = np.asarray(flags_k)

    # the transposed vertex table carries the same bits as (clip | attrs)
    both = np.concatenate(
        [np.asarray(clip), np.asarray(attrs)], axis=1
    ).view(np.int32)
    np.testing.assert_array_equal(np.asarray(tblT), both.T)

    assert int(np.asarray(su.valid)[:t].sum()) > 3, "want a live scene"
    if spread > 4:  # the wide scene must exercise the clip path
        assert int(((flags_k >> 1) & 1).sum()) > 0
    np.testing.assert_array_equal(flags_k & 1, np.asarray(su.valid)[:t])
    # full-row equality on real triangles of ALIVE meshlets; rows of DEAD
    # meshlets (no valid and no clip-candidate triangle) are zero-filled
    # by the meshlet-level cull, and padding rows (tri_v < 0) differ only
    # in attr cols (ref gathers vertex-0 attrs there) — all of those are
    # never streamed or gathered live, so frame bits are unaffected (the
    # fused-vs-oracle suite pins that end-to-end)
    from ash_renderer_tpu.scene import MESHLET_TRIS

    m = t // MESHLET_TRIS
    alive_m = (
        (flags_k.reshape(m, MESHLET_TRIS) & 3).any(axis=1)
    )
    alive_rows = np.repeat(alive_m, MESHLET_TRIS)
    real = (packed.tri_v[:, 0] >= 0) & alive_rows
    np.testing.assert_array_equal(comb_k[real], comb_ref[:t][real])
    assert not comb_k[~alive_rows].any(), "dead meshlets must zero-fill"
    np.testing.assert_array_equal(
        comb_k[alive_rows][:, :10], comb_ref[:t][alive_rows][:, :10]
    )
    np.testing.assert_array_equal(
        comb_k[alive_rows][:, 46:], comb_ref[:t][alive_rows][:, 46:]
    )
    np.testing.assert_array_equal(np.asarray(keys_k), keys_ref[:t])
    assert int(gstats["n_fast"]) == int(((flags_k >> 2) & 1).sum())


def test_fused_pipeline_with_precomputed_tables_matches_inline():
    """ltT/matT precomputed on the host (Renderer path) vs derived in-jit
    must be the same frame."""
    from ash_renderer_tpu import RendererSettings
    from ash_renderer_tpu.pipeline import FrameStatics, render_frame_fused_jit

    sc, packed = _packed_scene(21, nv=140, nt=260, spread=4.0)
    settings = RendererSettings(width=256, height=192, clip_budget=128)
    cfg = derive_raster_config(256, 192, tile_h=8)
    cam = Camera()
    view = cam.view_matrix()
    proj = cam.projection_matrix(256 / 192)
    mm = sc.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=False, has_atlas=False,
        has_light=False, interpret=True,
    )
    base = (
        statics,
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
        jnp.asarray(cam.position.astype(np.float32)),
        None, None, None, jnp.asarray(packed.local_tri),
    )
    f_inline, aux_inline = render_frame_fused_jit(*base)

    tri_mat = packed.obj_material[
        np.clip(packed.tri_obj, 0, len(packed.obj_material) - 1)
    ]
    ltT, matT = setup_kernel.prep_static(
        packed.local_tri, tri_mat, packed.tri_v[:, 0] >= 0
    )
    f_pre, aux_pre = render_frame_fused_jit(
        *base, jnp.asarray(tri_mat), ltT=jnp.asarray(ltT),
        matT=jnp.asarray(matT),
    )
    np.testing.assert_array_equal(np.asarray(f_inline), np.asarray(f_pre))
    np.testing.assert_array_equal(
        np.asarray(aux_inline["vis_tri"]), np.asarray(aux_pre["vis_tri"])
    )

    # the Renderer's execution mode: per-stage jits, same bits
    from ash_renderer_tpu.pipeline import render_frame_fused_staged

    f_staged, aux_staged = render_frame_fused_staged(
        *base, jnp.asarray(tri_mat), ltT=jnp.asarray(ltT),
        matT=jnp.asarray(matT),
    )
    np.testing.assert_array_equal(np.asarray(f_inline), np.asarray(f_staged))
    np.testing.assert_array_equal(
        np.asarray(aux_inline["vis_tri"]), np.asarray(aux_staged["vis_tri"])
    )
    for k in ("n_valid", "n_clipped", "n_fast"):
        assert int(aux_inline[k]) == int(aux_staged[k]), k
