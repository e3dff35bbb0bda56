"""Fused-pipeline components: sort-based binning streams, per-tri tables,
and (as they land) the fused kernel's bit-parity with the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from ash_renderer_tpu import (
    Camera,
    Mesh,
    RendererSettings,
    Scene,
    SceneObject,
    derive_raster_config,
)
from ash_renderer_tpu.oracle.raster_cpu import compose_mvp
from ash_renderer_tpu.ops import binsort, geometry, tritables


def _setup(seed=7, nv=120, nt=300, w=512, h=256, spread=2.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-spread, spread, (nv, 3)).astype(np.float32)
    pos[:, 2] += 3.0
    mesh = Mesh(
        positions=pos,
        indices=rng.integers(0, nv, (nt, 3)).astype(np.int32),
        colors=rng.uniform(0, 1, (nv, 4)).astype(np.float32),
    )
    sc = Scene()
    sc.add_object(SceneObject(mesh=sc.add_mesh(mesh)))
    packed = sc.pack()
    cfg = derive_raster_config(w, h, tile_h=8)
    cam = Camera()
    view = cam.view_matrix()
    proj = cam.projection_matrix(w / h)
    mm = sc.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    clip, attrs = geometry.transform_vertices(
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(mm), jnp.asarray(mvp),
    )
    su, attrs_full, _ = geometry.geometry_device(
        clip, attrs, jnp.asarray(packed.tri_v), jnp.asarray(packed.tri_obj),
        jnp.asarray(packed.obj_material), cfg, 128, interpret=True,
    )
    return su, attrs_full, cfg


def _aabb_tiles(su, cfg):
    """Brute-force {(tri, tile)} overlap set (the coverage contract)."""
    ss = cfg.subpixel_scale
    half = ss // 2
    x = np.stack([np.asarray(su.x0), np.asarray(su.x1), np.asarray(su.x2)])
    y = np.stack([np.asarray(su.y0), np.asarray(su.y1), np.asarray(su.y2)])
    ok = np.asarray(su.valid)
    pxmin = np.maximum(0, (x.min(0) - half + ss - 1) // ss)
    pxmax = np.minimum(cfg.width - 1, (x.max(0) - half) // ss)
    pymin = np.maximum(0, (y.min(0) - half + ss - 1) // ss)
    pymax = np.minimum(cfg.height - 1, (y.max(0) - half) // ss)
    live = ok & (pxmax >= pxmin) & (pymax >= pymin)
    want = set()
    for t in np.nonzero(live)[0]:
        for tyy in range(pymin[t] // cfg.tile_h, pymax[t] // cfg.tile_h + 1):
            for txx in range(
                pxmin[t] // cfg.tile_w, pxmax[t] // cfg.tile_w + 1
            ):
                want.add((int(t), tyy * cfg.grid_w + txx))
    return want


@pytest.mark.parametrize("seed,spread", [(7, 2.0), (8, 0.4), (9, 6.0)])
def test_binsort_streams_cover_all_overlaps(seed, spread):
    su, _, cfg = _setup(seed=seed, spread=spread)
    order, bounds = binsort.bin_sort(su, cfg, interpret=True)
    order = np.asarray(order)
    bounds = np.asarray(bounds)
    want = _aabb_tiles(su, cfg)

    streamed = {}
    for tile in range(cfg.n_tiles):
        ranges = binsort.stream_ranges_host(
            bounds, tile, cfg.grid_w, cfg.n_tiles
        )
        items = []
        for rs, re in ranges:
            items.extend(order[rs:re].tolist())
        # no duplicates within a tile's streams (distribute-phase invariant)
        assert len(items) == len(set(items)), f"dup stream items, tile {tile}"
        streamed[tile] = set(items)

    for (t, tile) in want:
        assert t in streamed[tile], (
            f"overlap (tri {t}, tile {tile}) not streamed"
        )


@pytest.mark.parametrize("seed,s,nbins", [
    (0, 1_000, 130),       # single block, sparse bins
    (1, 5_000, 34),        # dense bins, multi-block
    (2, 4_096, 2_050),     # exact block multiple
    (3, 17, 3_000),        # tiny input, huge bin space
    (4, 9_000, 9_000),     # bins ~ keys
])
def test_sorted_run_bounds_matches_searchsorted(seed, s, nbins):
    """The Pallas counting kernel is bit-equal to searchsorted over every
    block/ownership edge case (empty bins, bins past the max key, dead-key
    padding, blocks owning nothing)."""
    from ash_renderer_tpu.ops.bincount import sorted_run_bounds

    rng = np.random.default_rng(seed)
    keys = np.sort(rng.integers(0, nbins, s).astype(np.int32))
    if seed == 1:  # long constant runs: blocks that own nothing
        keys[: s // 2] = 7
        keys = np.sort(keys)
    got = np.asarray(
        sorted_run_bounds(jnp.asarray(keys), nbins, interpret=True)
    )
    want = np.searchsorted(keys, np.arange(nbins), side="left").astype(
        np.int32
    )
    np.testing.assert_array_equal(got, want)


def _frame_args(scene, settings, cam, has_mats=False, has_atlas=False,
                has_light=False):
    from ash_renderer_tpu.pipeline import FrameStatics
    from ash_renderer_tpu.rtypes import LightPack, MaterialsPack

    packed = scene.pack()
    cfg = derive_raster_config(
        settings.render_width, settings.render_height, tile_h=8
    )
    view = cam.view_matrix()
    proj = cam.projection_matrix(settings.render_width / settings.render_height)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    if has_mats:
        mats = MaterialsPack(
            base_color=np.array(
                [m.base_color for m in scene.materials], np.float32
            ),
            tex_id=np.array([m.texture_id for m in scene.materials], np.int32),
            specular=np.array([m.specular for m in scene.materials], np.float32),
            shininess=np.array([m.shininess for m in scene.materials], np.int32),
        )
    else:
        mats = None
    if has_light and scene.light is not None:
        light = LightPack(
            direction=np.asarray(scene.light.direction, np.float32),
            color=np.asarray(scene.light.color, np.float32),
            ambient=np.float32(scene.light.ambient),
        )
    else:
        light = None
    statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=has_mats,
        has_atlas=has_atlas, has_light=light is not None, interpret=True,
    )
    args = (
        statics,
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
        jnp.asarray(cam.position.astype(np.float32)),
        mats, scene.atlas if has_atlas else None, light, None,
    )
    return args, packed, mm, view, proj


def _rand_scene(seed=3, nv=90, nt=70, spread=2.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-spread, spread, (nv, 3)).astype(np.float32)
    pos[:, 2] += 3.0
    mesh = Mesh(
        positions=pos,
        indices=rng.integers(0, nv, (nt, 3)).astype(np.int32),
        colors=rng.uniform(0, 1, (nv, 4)).astype(np.float32),
    )
    sc = Scene()
    sc.add_object(SceneObject(mesh=sc.add_mesh(mesh)))
    return sc


@pytest.mark.parametrize("seed,spread", [(3, 2.0), (5, 0.5), (11, 5.0)])
def test_fused_matches_classic_vertex_colors(seed, spread):
    from ash_renderer_tpu.pipeline import (
        render_frame_fused_jit,
        render_frame_jit,
    )

    scene = _rand_scene(seed=seed, spread=spread)
    settings = RendererSettings(width=256, height=192, clip_budget=128)
    args, *_ = _frame_args(scene, settings, Camera())
    classic, aux_c = render_frame_jit(*args)
    fused, aux_f = render_frame_fused_jit(*args)
    assert int(np.asarray(aux_c["vis_tri"] >= 0).sum()) > 100
    np.testing.assert_array_equal(
        np.asarray(aux_c["vis_tri"]), np.asarray(aux_f["vis_tri"])
    )
    np.testing.assert_array_equal(
        np.asarray(aux_c["vis_d16"]), np.asarray(aux_f["vis_d16"])
    )
    np.testing.assert_array_equal(np.asarray(classic), np.asarray(fused))


@pytest.mark.parametrize(
    "wide_rows,wide_pairs",
    [
        (64, 256),   # expansion active, generous budgets
        (64, 4),     # pair budget tiny -> most rows fall back to global wide
        (2, 256),    # row budget tiny -> suffix falls back to global wide
    ],
)
def test_wide_pair_expansion_budgets(wide_rows, wide_pairs):
    """Wide-triangle pair expansion is a pure perf feature: any budget
    (including ones that force the global-wide fallback for most rows)
    must produce the identical frame.  spread=5 at 256x192/tile_h=8 makes
    most triangles span >2 tiles, exercising the expansion heavily."""
    import dataclasses

    from ash_renderer_tpu.pipeline import (
        render_frame_fused_jit,
        render_frame_jit,
    )

    scene = _rand_scene(seed=11, spread=5.0)
    settings = RendererSettings(width=256, height=192, clip_budget=128)
    args, *_ = _frame_args(scene, settings, Camera())
    classic, aux_c = render_frame_jit(*args)

    wsettings = dataclasses.replace(
        settings, wide_rows=wide_rows, wide_pairs=wide_pairs
    )
    wstatics = dataclasses.replace(args[0], settings=wsettings)
    fused, aux_f = render_frame_fused_jit(wstatics, *args[1:])
    np.testing.assert_array_equal(
        np.asarray(aux_c["vis_tri"]), np.asarray(aux_f["vis_tri"])
    )
    np.testing.assert_array_equal(np.asarray(classic), np.asarray(fused))


def test_fused_matches_oracle_textured_lit():
    from ash_renderer_tpu import DirectionalLight, Material
    from ash_renderer_tpu.models import icosphere
    from ash_renderer_tpu.oracle import render_oracle
    from ash_renderer_tpu.pipeline import render_frame_fused_jit
    from ash_renderer_tpu.textures import TextureAtlas, checkerboard
    from ash_renderer_tpu import mathx

    scene = Scene(
        materials=[Material(texture_id=0, specular=0.4, shininess=32)],
        light=DirectionalLight(direction=(0.3, -0.6, 0.74), ambient=0.15),
    )
    scene.atlas = TextureAtlas.build([checkerboard(64)])
    scene.add_object(
        SceneObject(
            mesh=scene.add_mesh(icosphere(2)),
            model=mathx.translation([0, 0, 3]),
        )
    )
    # fused_surface_shade="on": keep the in-kernel phase F path (material/
    # mip/tap-addressing select trees) covered with an atlas even though
    # the auto rule now routes textured scenes to the XLA shade path
    settings = RendererSettings(width=192, height=128, clip_budget=128,
                                fused_surface_shade="on")
    cam = Camera()
    args, packed, mm, view, proj = _frame_args(
        scene, settings, cam, has_mats=True, has_atlas=True, has_light=True
    )
    fused, aux = render_frame_fused_jit(*args)
    o = render_oracle(
        packed, mm, view, proj, settings,
        materials=args[12], atlas=scene.atlas, light=args[14],
        camera_pos=cam.position.astype(np.float32),
        cfg=args[0].cfg,
    )
    assert int((o["vis_tri"] >= 0).sum()) > 500
    np.testing.assert_array_equal(np.asarray(aux["vis_tri"]), o["vis_tri"])
    np.testing.assert_array_equal(np.asarray(fused), o["rgba8"])


def test_fused_meshlets_matches_oracle():
    """The Renderer's fused configuration: meshlet packing (Morton triangle
    order + local indices) with the MXU corner/attr gathers — must equal the
    oracle on the SAME packed scene bit-for-bit."""
    from ash_renderer_tpu.oracle import render_oracle
    from ash_renderer_tpu.pipeline import FrameStatics, render_frame_fused_jit

    scene = _rand_scene(seed=13, nv=150, nt=220)
    settings = RendererSettings(width=192, height=128, clip_budget=128)
    cam = Camera()
    packed = scene.pack(meshlets=True)
    cfg = derive_raster_config(192, 128, tile_h=8)
    view = cam.view_matrix()
    proj = cam.projection_matrix(192 / 128)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=False, has_atlas=False,
        has_light=False, interpret=True,
    )
    fused, aux = render_frame_fused_jit(
        statics,
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
        jnp.asarray(cam.position.astype(np.float32)),
        None, None, None, jnp.asarray(packed.local_tri),
    )
    o = render_oracle(packed, mm, view, proj, settings, cfg=cfg)
    assert int((o["vis_tri"] >= 0).sum()) > 300
    np.testing.assert_array_equal(np.asarray(aux["vis_tri"]), o["vis_tri"])
    np.testing.assert_array_equal(np.asarray(fused), o["rgba8"])


def test_fused_tile_h4_matches_oracle():
    """The tile_h=4 kernel variant (RasterConfig.tile_h=4) must equal the
    oracle bit-for-bit — semantics are tiling-independent."""
    from ash_renderer_tpu.oracle import render_oracle
    from ash_renderer_tpu.pipeline import FrameStatics, render_frame_fused_jit

    scene = _rand_scene(seed=31, nv=140, nt=200)
    settings = RendererSettings(width=192, height=120, clip_budget=128,
                                fused_tile_h=4)
    cam = Camera()
    packed = scene.pack(meshlets=True)
    cfg = derive_raster_config(192, 120, tile_h=4)
    view = cam.view_matrix()
    proj = cam.projection_matrix(192 / 120)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=False, has_atlas=False,
        has_light=False, interpret=True,
    )
    fused, aux = render_frame_fused_jit(
        statics,
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
        jnp.asarray(cam.position.astype(np.float32)),
        None, None, None, jnp.asarray(packed.local_tri),
    )
    o = render_oracle(packed, mm, view, proj, settings, cfg=cfg)
    assert int((o["vis_tri"] >= 0).sum()) > 300
    np.testing.assert_array_equal(np.asarray(aux["vis_tri"]), o["vis_tri"])
    np.testing.assert_array_equal(np.asarray(fused), o["rgba8"])


def test_fused_supersampled_two_textures_matches_oracle():
    """config5's shape: fused pipeline + 4x SSAA + TWO textures + lighting
    + specular — exercises phase F's mip/tap select trees at T=2 and the
    supersample resolve on the phase-F combine path."""
    from ash_renderer_tpu import DirectionalLight, Material
    from ash_renderer_tpu.oracle import render_oracle
    from ash_renderer_tpu.pipeline import FrameStatics, render_frame_fused_jit
    from ash_renderer_tpu.rtypes import LightPack, MaterialsPack
    from ash_renderer_tpu.textures import TextureAtlas, checkerboard

    rng = np.random.default_rng(17)
    nv, nt = 90, 70
    pos = rng.uniform(-1.5, 1.5, (nv, 3)).astype(np.float32)
    pos[:, 2] += 3.0
    mesh = Mesh(
        positions=pos,
        indices=rng.integers(0, nv, (nt, 3)).astype(np.int32),
        colors=rng.uniform(0.2, 1, (nv, 4)).astype(np.float32),
        uvs=rng.uniform(0, 2, (nv, 2)).astype(np.float32),
    ).compute_normals()
    scene = Scene(
        materials=[
            Material(texture_id=0, specular=0.5, shininess=32),
            Material(texture_id=1, specular=0.2, shininess=8),
        ],
        light=DirectionalLight(direction=(0.4, -0.6, 0.7), ambient=0.2),
    )
    o1 = scene.add_object(SceneObject(mesh=scene.add_mesh(mesh), material=0))
    scene.add_object(
        SceneObject(mesh=0, material=1,
                    model=np.diag([1, 1, 1, 1]).astype(np.float32))
    )
    atlas = TextureAtlas.build([checkerboard(64), checkerboard(32)])
    # "on": pins the in-kernel phase F T=2 select trees (see the textured
    # test above for why the auto rule no longer exercises them)
    settings = RendererSettings(width=96, height=64, supersample=2,
                                clip_budget=64, fused_surface_shade="on")
    cam = Camera()
    packed = scene.pack(meshlets=True)
    cfg = derive_raster_config(
        settings.render_width, settings.render_height, tile_h=8
    )
    view = cam.view_matrix()
    proj = cam.projection_matrix(settings.render_width / settings.render_height)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    mats = MaterialsPack(
        base_color=np.array([m.base_color for m in scene.materials], np.float32),
        tex_id=np.array([m.texture_id for m in scene.materials], np.int32),
        specular=np.array([m.specular for m in scene.materials], np.float32),
        shininess=np.array([m.shininess for m in scene.materials], np.int32),
    )
    light = LightPack(
        direction=np.asarray(scene.light.direction, np.float32),
        color=np.asarray(scene.light.color, np.float32),
        ambient=np.float32(scene.light.ambient),
    )
    statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=True, has_atlas=True,
        has_light=True, interpret=True,
    )
    fused, aux = render_frame_fused_jit(
        statics,
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
        jnp.asarray(cam.position.astype(np.float32)),
        mats, atlas, light, jnp.asarray(packed.local_tri),
    )
    o = render_oracle(
        packed, mm, view, proj, settings, materials=mats, atlas=atlas,
        light=light, camera_pos=cam.position.astype(np.float32), cfg=cfg,
    )
    assert int((o["vis_tri"] >= 0).sum()) > 200
    np.testing.assert_array_equal(np.asarray(aux["vis_tri"]), o["vis_tri"])
    np.testing.assert_array_equal(np.asarray(fused), o["rgba8"])


def test_staged_front_merge_matches():
    """render_frame_fused_staged with fused_front_merge on (one merged
    XLA-front program) must be bit-identical to the per-stage form and to
    render_frame_fused."""
    import dataclasses

    from ash_renderer_tpu.ops import setup_kernel
    from ash_renderer_tpu.pipeline import (
        FrameStatics,
        render_frame_fused_jit,
        render_frame_fused_staged,
    )

    scene = _rand_scene(seed=21, nv=130, nt=180)
    settings = RendererSettings(width=192, height=128, clip_budget=128)
    cam = Camera()
    packed = scene.pack(meshlets=True)
    cfg = derive_raster_config(192, 128, tile_h=8)
    view = cam.view_matrix()
    proj = cam.projection_matrix(192 / 128)
    mm = scene.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    tri_mat = packed.obj_material[
        np.clip(packed.tri_obj, 0, len(packed.obj_material) - 1)
    ]
    ltT, matT = setup_kernel.prep_static(
        packed.local_tri, tri_mat, packed.tri_v[:, 0] >= 0
    )
    args = (
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
        jnp.asarray(cam.position.astype(np.float32)),
        None, None, None, jnp.asarray(packed.local_tri),
        jnp.asarray(tri_mat),
    )
    kw = dict(ltT=jnp.asarray(ltT), matT=jnp.asarray(matT))
    outs = {}
    for merge in (False, True):
        st = dataclasses.replace(settings, fused_front_merge=merge)
        statics = FrameStatics(
            cfg=cfg, settings=st, has_materials=False, has_atlas=False,
            has_light=False, interpret=True,
        )
        outs[merge] = render_frame_fused_staged(statics, *args, **kw)
    ref_statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=False, has_atlas=False,
        has_light=False, interpret=True,
    )
    ref, _ = render_frame_fused_jit(ref_statics, *args, **kw)
    np.testing.assert_array_equal(
        np.asarray(outs[True][0]), np.asarray(outs[False][0])
    )
    np.testing.assert_array_equal(np.asarray(outs[True][0]), np.asarray(ref))
    assert int(np.asarray(outs[True][1]["n_valid"])) == int(
        np.asarray(outs[False][1]["n_valid"])
    )


def test_tritables_roundtrip():
    su, attrs_full, cfg = _setup()
    comb = np.asarray(tritables.build_comb_table(su, attrs_full, cfg))
    x0, y0 = tritables.unpack_coord_planes(comb[:, 0], cfg)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(su.x0))
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(su.y0))
    zq0 = comb[:, 3] & 0xFFFF
    zq1 = (comb[:, 3] >> 16) & 0xFFFF
    np.testing.assert_array_equal(zq0, np.asarray(su.zq0))
    np.testing.assert_array_equal(zq1, np.asarray(su.zq1))
    inv = comb[:, 5].copy().view(np.float32)
    np.testing.assert_array_equal(inv, np.asarray(su.inv_area2))
    a_v0 = comb[:, 10:22].copy().view(np.float32)
    np.testing.assert_array_equal(
        a_v0, np.asarray(attrs_full)[np.asarray(su.v0)]
    )

    # id column is the row index; zero pad after it
    s = comb.shape[0]
    np.testing.assert_array_equal(
        comb[:, tritables.ID_COL], np.arange(s, dtype=np.int32)
    )
    np.testing.assert_array_equal(comb[:, tritables.ID_COL + 1 :], 0)

    # sorted table: rows follow the order permutation and carry ids
    rng = np.random.default_rng(0)
    order = jnp.asarray(rng.permutation(s).astype(np.int32))
    tbl = np.asarray(tritables.sorted_table(jnp.asarray(comb), order, 256))
    orderh = np.asarray(order)
    assert tbl.shape == (s + 256, tritables.TBL_COLS)
    np.testing.assert_array_equal(tbl[:s, tritables.ID_COL], orderh)
    np.testing.assert_array_equal(tbl[s:, tritables.ID_COL], s - 1)
    np.testing.assert_array_equal(tbl[:s], comb[orderh])


@pytest.mark.parametrize("yshift,ss", [(1.45, 1), (0.8, 1), (1.45, 2)])
def test_shade_row_band_matches_dense_and_oracle(yshift, ss):
    """Band-gated quad-tap gather (pipeline._shade_from_planes): TEXTURED
    scenes whose coverage spans a small/medium row band must produce
    frames byte-equal to both the band-disabled dense path and the
    oracle, in every switch branch (1/4 band, 1/2 band, dense) and under
    supersampling.  yshift pushes the scene toward the bottom rows (up is
    -Y): 1.45 -> narrow bottom band, 0.8 -> mid band."""
    import dataclasses

    from ash_renderer_tpu import Material, mathx
    from ash_renderer_tpu.oracle import render_oracle
    from ash_renderer_tpu.pipeline import FrameStatics, render_frame_fused_jit
    from ash_renderer_tpu.rtypes import MaterialsPack
    from ash_renderer_tpu.textures import TextureAtlas, checkerboard

    rng = np.random.default_rng(23)
    nv, nt = 120, 160
    pos = rng.uniform(-1.2, 1.2, (nv, 3)).astype(np.float32)
    pos[:, 1] *= 0.25  # flatten vertically so the band is narrow
    pos[:, 2] += 3.0
    mesh = Mesh(
        positions=pos,
        indices=rng.integers(0, nv, (nt, 3)).astype(np.int32),
        colors=rng.uniform(0, 1, (nv, 4)).astype(np.float32),
        uvs=rng.uniform(0, 2, (nv, 2)).astype(np.float32),
    )
    sc = Scene(materials=[Material(texture_id=0)])
    sc.atlas = TextureAtlas.build([checkerboard(64)])
    sc.add_object(
        SceneObject(
            mesh=sc.add_mesh(mesh), model=mathx.translation([0, yshift, 0])
        )
    )
    settings = RendererSettings(
        width=192, height=128, clip_budget=128, supersample=ss
    )
    cam = Camera()
    packed = sc.pack(meshlets=True)
    cfg = derive_raster_config(
        settings.render_width, settings.render_height, tile_h=8
    )
    view = cam.view_matrix()
    proj = cam.projection_matrix(settings.width / settings.height)
    mm = sc.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    mats = MaterialsPack(
        base_color=np.ones((1, 4), np.float32),
        tex_id=np.zeros(1, np.int32),
        specular=np.zeros(1, np.float32),
        shininess=np.full(1, 32, np.int32),
    )

    def run(st):
        statics = FrameStatics(
            cfg=cfg, settings=st, has_materials=True, has_atlas=True,
            has_light=False, interpret=True,
        )
        rgba8, aux = render_frame_fused_jit(
            statics,
            jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
            jnp.asarray(packed.normals), jnp.asarray(packed.colors),
            jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
            jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
            jnp.asarray(mm), jnp.asarray(mvp),
            jnp.asarray(cam.position.astype(np.float32)),
            mats, sc.atlas, None, jnp.asarray(packed.local_tri),
        )
        return np.asarray(rgba8), aux

    banded, aux = run(settings)
    dense, _ = run(dataclasses.replace(settings, shade_row_band=False))
    np.testing.assert_array_equal(banded, dense)
    o = render_oracle(
        packed, mm, view, proj, settings, materials=mats, atlas=sc.atlas,
        cfg=cfg,
    )
    assert int((o["vis_tri"] >= 0).sum()) > 200
    np.testing.assert_array_equal(banded, o["rgba8"])
    # the narrow scene must actually land in a BAND branch (span <= gh/2),
    # otherwise this test exercises nothing new
    vis = np.asarray(aux["vis_tri"]) >= 0
    rows = np.nonzero(vis.any(axis=1))[0]
    gh = cfg.grid_h
    span_tiles = rows.max() // cfg.tile_h - rows.min() // cfg.tile_h + 1
    if yshift > 1.0:
        assert span_tiles <= -(-gh // 4), span_tiles


def test_fused_graze_regime_matches_oracle():
    """The bench fly-by's closest-approach regime — camera just outside a
    unit sphere — drives live Sutherland-Hodgman clip fans, wide keys with
    the pair-expansion ext table, AND the packed fine stream in one frame;
    the fused device path must equal the oracle bit-for-bit on it (the
    moving-camera machinery otherwise has no direct oracle pin)."""
    from ash_renderer_tpu import mathx
    from ash_renderer_tpu.models import icosphere
    from ash_renderer_tpu.oracle import render_oracle
    from ash_renderer_tpu.pipeline import FrameStatics, render_frame_fused_jit

    sc = Scene()
    sc.add_object(
        SceneObject(
            mesh=sc.add_mesh(icosphere(2)),
            model=mathx.translation([0, 0, 1.02]),
        )
    )
    settings = RendererSettings(
        width=192, height=128, clip_budget=512,
        wide_rows=1 << 10, wide_pairs=1 << 13,
    )
    cam = Camera()
    packed = sc.pack(meshlets=True)
    cfg = derive_raster_config(192, 128, tile_h=8)
    view = cam.view_matrix()
    proj = cam.projection_matrix(192 / 128)
    mm = sc.model_matrices()
    mvp = compose_mvp(mm, view, proj)
    statics = FrameStatics(
        cfg=cfg, settings=settings, has_materials=False, has_atlas=False,
        has_light=False, interpret=True,
    )
    fused, aux = render_frame_fused_jit(
        statics,
        jnp.asarray(packed.positions), jnp.asarray(packed.vert_obj),
        jnp.asarray(packed.normals), jnp.asarray(packed.colors),
        jnp.asarray(packed.uvs), jnp.asarray(packed.tri_v),
        jnp.asarray(packed.tri_obj), jnp.asarray(packed.obj_material),
        jnp.asarray(mm), jnp.asarray(mvp),
        jnp.asarray(cam.position.astype(np.float32)),
        None, None, None, jnp.asarray(packed.local_tri),
    )
    # the regime actually ran the paths under test
    assert int(np.asarray(aux["n_clipped"])) > 0
    assert int(np.asarray(aux["n_wide"])) > 0
    assert int(np.asarray(aux["wide_pairs_n"])) > 0
    assert int(np.asarray(aux["wide_leftover"])) == 0
    assert int(np.asarray(aux["clip_overflow"])) == 0
    o = render_oracle(packed, mm, view, proj, settings, cfg=cfg)
    assert int((o["vis_tri"] >= 0).sum()) > 2000
    np.testing.assert_array_equal(np.asarray(aux["vis_tri"]), o["vis_tri"])
    np.testing.assert_array_equal(np.asarray(fused), o["rgba8"])
