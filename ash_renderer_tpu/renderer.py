"""Renderer facade: the stateful top-level object with the reference's
three-tier lifecycle.

Mirrors ``src/renderer.rs``'s architecture exactly (SURVEY §1):

* **Settings-independent tier** (SettingsIndependentComponents,
  renderer.rs:75-153): process/JAX runtime init + device selection — done
  once in ``__init__``.
* **Settings-dependent tier** (SettingsDependentComponents,
  renderer.rs:156-308): scene buffers uploaded to the device, materials/
  atlas/light packs, and the jit-compiled frame function — rebuilt wholesale
  by :meth:`update_settings` (the update_user_settings analogue,
  renderer.rs:624-627).
* **Resize-dependent tier** (ResizeDependentComponents,
  renderer.rs:601-620): the RasterConfig + shape-specialized compiled kernels
  + framebuffer ring — rebuilt by :meth:`resize`.

Per frame (:meth:`draw_frame`, the renderer.rs:389-597 analogue): the host
composes camera + per-object matrices (the 192-byte UBO write), calls the
compiled pipeline (async dispatch), and pushes the frame into the present
ring, which blocks only frames_in_flight frames later (fence analogue).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .config import RendererSettings, derive_raster_config
from .oracle.raster_cpu import compose_mvp
from .pipeline import (
    FrameStatics,
    render_frame_fused_jit,
    render_frame_fused_staged,
    render_frame_jit,
    render_frame_staged,
)
from .present import FrameRing
from .rtypes import LightPack, MaterialsPack
from .scene import Scene
from .utils.profiling import FrameStats

F32 = np.float32


def select_device(settings: RendererSettings):
    """Device selection mirroring the reference's scoring
    (renderer.rs:332-387): honor the explicit preference, else prefer
    tpu > gpu > cpu (discrete > integrated > cpu analogue)."""
    devices = jax.devices()
    if settings.preferred_device_index is not None:
        return devices[settings.preferred_device_index]
    score = {"tpu": 1000, "gpu": 100, "cpu": 1}
    return max(devices, key=lambda d: score.get(d.platform, 10))


class Renderer:
    def __init__(
        self,
        scene: Scene,
        settings: Optional[RendererSettings] = None,
        interpret: Optional[bool] = None,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh (1-D, any axis name) for
        multi-chip rendering — framebuffer tile rows are data-parallel over
        its devices (parallel/sharding.py) and the frame is bit-identical to
        single-device output.  Alternatively set
        ``RendererSettings.n_devices``; the explicit mesh wins."""
        settings = settings or RendererSettings()
        # --- settings-independent tier
        self._mesh_arg = mesh
        self.device = (
            select_device(settings) if mesh is None else mesh.devices.flat[0]
        )
        if interpret is None:
            interpret = self.device.platform != "tpu"
        self._interpret = interpret
        self.stats = FrameStats()
        self._build_settings_dependent(scene, settings)

    # ----- settings-dependent world -------------------------------------
    def _build_settings_dependent(self, scene: Scene, settings: RendererSettings):
        if settings.pipeline == "auto":
            # fused on TPU — except for tiny scenes, where its fixed
            # per-frame cost loses to the classic pair pipeline (measured
            # at 800x600: 2-tri reference 38 vs 52 FPS, 3.5k-tri config2
            # 28 vs 34; 9k-tri config1 already wins 70.7 vs ~30)
            n_tris = sum(m.num_triangles for m in scene.meshes)
            settings = dataclasses.replace(
                settings,
                pipeline=(
                    "fused"
                    if self.device.platform == "tpu" and n_tris >= 4096
                    else "classic"
                ),
            )
        self.scene = scene
        self.settings = settings
        # multi-chip: resolve the device mesh (explicit Renderer(mesh=...)
        # wins; else settings.n_devices slices jax.devices())
        self.mesh = self._mesh_arg
        if self.mesh is None and settings.n_devices is not None:
            from .parallel import make_render_mesh

            devs = jax.devices()
            if len(devs) < settings.n_devices:
                raise ValueError(
                    f"n_devices={settings.n_devices} but only {len(devs)} "
                    "jax devices exist"
                )
            self.mesh = make_render_mesh(devs[: settings.n_devices])
        # the fused pipeline wants meshlet-local indices so triangle-corner
        # assembly runs as exact one-hot MXU gathers instead of XLA's
        # scalar-path row gathers
        packed = scene.pack(meshlets=settings.pipeline == "fused")
        self.packed = packed
        if self.mesh is not None:
            # replicate scene buffers across the mesh so the sharded frame
            # jit never sees single-device-committed inputs
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(self.mesh, PartitionSpec())
            put = lambda a: jax.device_put(jnp.asarray(a), repl)
        else:
            dev = self.device
            put = lambda a: jax.device_put(jnp.asarray(a), dev)
        self._buffers = dict(
            positions=put(packed.positions),
            vert_obj=put(packed.vert_obj),
            normals=put(packed.normals),
            colors=put(packed.colors),
            uvs=put(packed.uvs),
            tri_v=put(packed.tri_v),
            tri_obj=put(packed.tri_obj),
            obj_material=put(packed.obj_material),
            local_tri=(
                put(packed.local_tri) if packed.local_tri is not None else None
            ),
            # static per scene: per-triangle material ids precomputed on the
            # host so the frame never pays a T-sized scalar-path gather
            tri_mat=put(
                packed.obj_material[
                    np.clip(packed.tri_obj, 0, len(packed.obj_material) - 1)
                ]
            ),
        )
        # static setup-kernel tables (transposed meshlet-local corner ids +
        # per-meshlet material rows) — host-precomputed once per scene
        self._buffers["ltT"] = self._buffers["matT"] = None
        if packed.local_tri is not None:
            from .ops import setup_kernel

            tri_mat_h = packed.obj_material[
                np.clip(packed.tri_obj, 0, len(packed.obj_material) - 1)
            ]
            ltT, matT = setup_kernel.prep_static(
                packed.local_tri, tri_mat_h, packed.tri_v[:, 0] >= 0
            )
            self._buffers["ltT"] = put(ltT)
            self._buffers["matT"] = put(matT)
        self.materials = MaterialsPack(
            base_color=put(
                np.array([m.base_color for m in scene.materials], F32)
            ),
            tex_id=put(
                np.array([m.texture_id for m in scene.materials], np.int32)
            ),
            specular=put(np.array([m.specular for m in scene.materials], F32)),
            shininess=put(
                np.array([m.shininess for m in scene.materials], np.int32)
            ),
        )
        self.atlas = None
        if scene.atlas is not None:
            self.atlas = jax.tree.map(put, scene.atlas)
        self.light = None
        if scene.light is not None:
            self.light = LightPack(
                direction=put(np.asarray(scene.light.direction, F32)),
                color=put(np.asarray(scene.light.color, F32)),
                ambient=put(np.asarray(scene.light.ambient, F32)),
            )
        self._build_resize_dependent()

    # ----- resize-dependent tier ----------------------------------------
    def _build_resize_dependent(self):
        st = self.settings
        # Scene-adaptive pair budget: binning's fixed-shape passes scale with
        # the static budget, so cap it by triangle count (8x headroom, floor
        # 16k) instead of paying the worst-case budget on small scenes.
        # settings.max_pairs remains the explicit ceiling; overflow is
        # counted in aux/pairs_overflow and surfaced by the debug validator.
        t = self.packed.tri_v.shape[0]
        eff_pairs = min(
            st.max_pairs, max(1 << 14, -(-8 * t // 128) * 128)
        )
        if eff_pairs != st.max_pairs:
            st = dataclasses.replace(st, max_pairs=eff_pairs)
        self.cfg = derive_raster_config(
            st.render_width,
            st.render_height,
            # fused kernel tiles are (fused_tile_h x 128); classic is 16x128
            tile_h=st.fused_tile_h if st.pipeline == "fused" else 16,
        )
        self.statics = FrameStatics(
            cfg=self.cfg,
            settings=st,
            has_materials=True,
            has_atlas=self.atlas is not None,
            has_light=self.light is not None,
            interpret=self._interpret,
        )
        self._sharded_fn = None
        if self.mesh is not None:
            # any resolution works on any device count: the sharded path
            # pads the tile-row decomposition up and crops (sharding.py),
            # so resize (incl. the in-draw self-recovery) never hard-fails
            from .parallel import (
                render_frame_sharded,
                render_frame_sharded_fused,
            )

            self._sharded_fn = jax.jit(
                functools.partial(
                    render_frame_sharded_fused
                    if st.pipeline == "fused"
                    else render_frame_sharded,
                    self.statics,
                    self.mesh,
                )
            )
        self.ring = FrameRing(st.frames_in_flight)
        # frame-coherence memo for the fused front (pipeline.FrontCache):
        # lives in the resize tier so ANY settings/resize/mesh rebuild
        # drops it (its value is keyed on scene buffers + statics, which
        # are exactly what these rebuilds replace)
        from .pipeline import FrontCache

        self._front_cache = (
            FrontCache()
            if (
                st.front_coherence
                and st.pipeline == "fused"
                and st.fused_front_merge
                and self.mesh is None
            )
            else None
        )

    # ----- public API ----------------------------------------------------
    def update_settings(self, settings: RendererSettings, scene: Scene = None):
        """Rebuild the whole settings-dependent world
        (update_user_settings analogue, renderer.rs:624-627) — including
        re-selecting the device when the preference changed (the reference's
        switch-GPU path re-creates the logical device on the new adapter)."""
        self.ring.drain()
        if settings.preferred_device_index != self.settings.preferred_device_index:
            self.device = select_device(settings)
        self._build_settings_dependent(scene or self.scene, settings)

    def resize(self, width: int, height: int):
        """Swapchain-invalidation path: rebuild resolution-keyed state
        (renderer.rs:601-620)."""
        self.ring.drain()
        self.settings = dataclasses.replace(
            self.settings, width=width, height=height
        )
        self._build_resize_dependent()

    def update_mesh(self, mesh_index: int, mesh):
        """Re-upload geometry after a mesh edit (update_vertices analogue,
        vertex_buffer_components.rs:71-87)."""
        self.scene.meshes[mesh_index] = mesh
        self.update_settings(self.settings, self.scene)

    def warmup(self, parallel: bool = True, execute: bool = True,
               verbose: bool = False) -> float:
        """Warm every pipeline stage for the current configuration by
        CALLING the real per-stage jits with dummy device inputs, in
        parallel threads, then running one real frame.

        Why calls and not AOT: ``.lower().compile()`` populates only the
        persistent compilation cache — the jit CALL cache is keyed by real
        calls, so the first frame after an AOT warmup re-traces and
        re-deserializes every stage (paying trace + cache-deserialize
        twice) and still does the per-program device load serially.  A
        dummy call through each stage jit warms trace + compile/deserialize
        + device load in ONE pass on the exact call path real frames use;
        running the stage calls in threads overlaps the GIL-free parts
        (deserialize, device load) across stages.  Dummy inputs are zeros
        (empty runs / identity matrices), so the device work per stage is
        one steady-state execution.  Returns seconds spent.

        Note (this container's remote-TPU tunnel): the irreducible floor is
        per-program device load at first execution; single-program paths
        (multi-chip, classic unstaged) simply run one real frame."""
        import concurrent.futures
        import time as _time

        from . import pipeline as plmod
        from .camera import Camera as _Cam
        from .ops import fused_kernel, setup_kernel

        t0 = _time.perf_counter()

        def say(msg):
            if verbose:
                import sys as _sys

                print(f"warmup: {msg} [{_time.perf_counter()-t0:.1f}s]",
                      file=_sys.stderr, flush=True)

        def finish_real_frame():
            # one real frame through the exact render_frame path: absorbs
            # anything the dummy calls missed (host-side matrix composition,
            # the aux pytree, present-path conversions)
            if execute:
                rgba8, _ = self.render_frame(_Cam())
                jax.block_until_ready(rgba8)
                np.asarray(rgba8.ravel()[:4])  # remote backends: force
                say("real frame done")
            return _time.perf_counter() - t0

        st = self.settings
        b = self._buffers
        stt = self.statics.settings  # resize tier may have capped max_pairs
        cfg = self.cfg

        def zdev(sd):
            return jax.device_put(
                jnp.zeros(sd.shape, sd.dtype), self.device
            )

        f32 = np.float32
        o = self.scene.model_matrices().shape[0]
        # identity matrices: finite w everywhere, geometry mostly culled —
        # a cheap but semantically well-formed frame for the front stages
        eye = jnp.asarray(np.broadcast_to(np.eye(4, dtype=f32), (o, 4, 4)))
        cam0 = jnp.asarray(np.zeros(3, f32))
        absd = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)

        single_program = (
            self._sharded_fn is not None
            or (st.pipeline != "fused" and not stt.staged_pipeline)
            or (st.pipeline == "fused" and b["local_tri"] is None)
        )
        if single_program:
            return finish_real_frame()

        calls = []
        if st.pipeline != "fused":
            # classic staged: four stage jits
            from .ops import raster_pallas

            geo_arrs = (
                b["positions"], b["vert_obj"], b["normals"], b["colors"],
                b["uvs"], b["tri_v"], b["tri_obj"], b["obj_material"],
                eye, eye,
            )
            geo_kw = dict(
                local_tri=b["local_tri"], interpret=self.statics.interpret,
                tri_mat=b["tri_mat"],
            )
            su, attrs_full, _ = jax.eval_shape(
                functools.partial(
                    plmod._stage_geometry.__wrapped__,
                    cfg, stt.clip_budget,
                    interpret=self.statics.interpret,
                ),
                *jax.tree.map(absd, geo_arrs),
                local_tri=(
                    absd(b["local_tri"])
                    if b["local_tri"] is not None else None
                ),
                tri_mat=absd(b["tri_mat"]),
            )
            rec_i, rec_f, tstart, tcount, _ = jax.eval_shape(
                functools.partial(
                    plmod._stage_binning.__wrapped__, cfg, stt.max_pairs
                ),
                su,
            )
            vis_d, vis_t = jax.eval_shape(
                functools.partial(
                    raster_pallas.rasterize_visibility.__wrapped__,
                    cfg=cfg, interpret=self.statics.interpret,
                ),
                rec_i, rec_f, tstart, tcount,
            )
            su_z = jax.tree.map(zdev, su)
            attrs_z = jax.tree.map(zdev, attrs_full)
            calls = [
                lambda: plmod._stage_geometry(
                    cfg, stt.clip_budget, *geo_arrs, **geo_kw
                ),
                lambda: plmod._stage_binning(cfg, stt.max_pairs, su_z),
                lambda: raster_pallas.rasterize_visibility(
                    zdev(rec_i), zdev(rec_f), zdev(tstart), zdev(tcount),
                    cfg, interpret=self.statics.interpret,
                ),
                lambda: plmod._stage_shade(
                    self.statics, zdev(vis_t), su_z, attrs_z, cam0,
                    self.materials, self.atlas, self.light,
                ),
            ]
        else:
            # fused staged (the flagship): 3 jits with fused_front_merge,
            # else 6.  Shapes of the stage boundaries via eval_shape.
            from .ops.geometry import MAX_CLIP_TRIS

            ntail = st.clip_budget * MAX_CLIP_TRIS
            vargs_abs = (
                absd(b["positions"]), absd(b["vert_obj"]),
                absd(b["normals"]), absd(b["colors"]), absd(b["uvs"]),
                jax.ShapeDtypeStruct((o, 4, 4), f32),
                jax.ShapeDtypeStruct((o, 4, 4), f32),
            )
            tblT = jax.eval_shape(
                setup_kernel.transform_vertices_T, *vargs_abs
            )
            setup_out = jax.eval_shape(
                functools.partial(
                    setup_kernel.triangle_setup, cfg=cfg, tail_rows=ntail
                ),
                tblT, absd(b["ltT"]), absd(b["matT"]),
            )
            comb, keys_m, flags = setup_out[0], setup_out[1], setup_out[2]
            tail_out = jax.eval_shape(
                functools.partial(plmod._clip_tail_into, self.statics),
                tblT, absd(b["tri_v"]), absd(b["tri_mat"]), flags, comb,
            )
            comb2, keys_t = tail_out[0], tail_out[1]
            sort_out = jax.eval_shape(
                functools.partial(
                    plmod._fstage_sort.__wrapped__, self.statics
                ),
                comb2, keys_m, keys_t,
            )
            rmeta, tbl, tbl_ext, _ss = sort_out
            rast_out = jax.eval_shape(
                functools.partial(
                    fused_kernel.rasterize_distribute.__wrapped__, cfg=cfg
                ),
                rmeta, tbl, tbl_ext,
            )
            _, vis_t, planes = rast_out
            smode = plmod.shade_mode_for(
                self.statics,
                self.materials if self.statics.has_materials else None,
                self.atlas if self.statics.has_atlas else None,
                self.light,
            )
            if stt.fused_front_merge:
                front = [
                    lambda: plmod._fstage_front(
                        self.statics, b["positions"], b["vert_obj"],
                        b["normals"], b["colors"], b["uvs"], eye, eye,
                        b["tri_v"], b["tri_mat"], b["ltT"], b["matT"],
                    ),
                ]
            else:
                tblT_z = zdev(tblT)
                comb_z = zdev(comb)

                def _tail_call():
                    # comb is donated by _fstage_tail — give it its own
                    # dummy buffer
                    return plmod._fstage_tail(
                        self.statics, tblT_z, b["tri_v"], b["tri_mat"],
                        zdev(flags), zdev(comb),
                    )

                front = [
                    lambda: plmod._fstage_transform(
                        b["positions"], b["vert_obj"], b["normals"],
                        b["colors"], b["uvs"], eye, eye,
                    ),
                    lambda: setup_kernel.triangle_setup(
                        tblT_z, b["ltT"], b["matT"], cfg,
                        interpret=self.statics.interpret, tail_rows=ntail,
                    ),
                    _tail_call,
                    lambda: plmod._fstage_sort(
                        self.statics, comb_z, zdev(keys_m), zdev(keys_t)
                    ),
                ]
            calls = front + [
                lambda: fused_kernel.rasterize_distribute(
                    zdev(rmeta), zdev(tbl), zdev(tbl_ext), cfg,
                    interpret=self.statics.interpret,
                    shade_mode=smode,
                    materials=(
                        self.materials
                        if self.statics.has_materials else None
                    ),
                    atlas=self.atlas if self.statics.has_atlas else None,
                    light=self.light if self.statics.has_light else None,
                    camera_pos=cam0,
                ),
                lambda: plmod._fstage_shade(
                    self.statics, zdev(planes), cam0, self.materials,
                    self.atlas, self.light,
                ),
            ]
        say(f"{len(calls)} stage calls built")

        def run_stage(i_fn):
            i, fn = i_fn
            out = fn()
            jax.block_until_ready(out)
            np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # remote: force
            say(f"stage {i} warm")

        if parallel:
            with concurrent.futures.ThreadPoolExecutor(
                max_workers=len(calls)
            ) as ex:
                list(ex.map(run_stage, enumerate(calls)))
        else:
            for item in enumerate(calls):
                run_stage(item)
        return finish_real_frame()

    def render_frame(self, camera: Camera, model_mats: np.ndarray = None):
        """Render one frame; returns (device rgba8, aux).  Async: does not
        block on device completion."""
        t0 = time.perf_counter()
        st = self.settings
        if model_mats is None:
            model_mats = self.scene.model_matrices()
        view = camera.view_matrix()
        proj = camera.projection_matrix(st.render_width / st.render_height)
        mvp = compose_mvp(model_mats, view, proj)
        if self._sharded_fn is not None:
            b = self._buffers
            common = (
                b["positions"], b["vert_obj"], b["normals"], b["colors"],
                b["uvs"], b["tri_v"], b["tri_obj"], b["obj_material"],
                jnp.asarray(model_mats), jnp.asarray(mvp),
                jnp.asarray(camera.position.astype(F32)),
                self.materials, self.atlas, self.light,
            )
            if st.pipeline == "fused":
                rgba8, aux = self._sharded_fn(
                    *common, b["tri_mat"], b["ltT"], b["matT"]
                )
            else:
                rgba8, aux = self._sharded_fn(*common, b["local_tri"])
            self.stats.record_dispatch(time.perf_counter() - t0)
            return rgba8, aux
        extra = {}
        if st.pipeline == "fused":
            # per-stage jits: the monolithic fused graph exceeds practical
            # XLA compile times at 1M-triangle shapes (pipeline.py)
            frame_fn = (
                render_frame_fused_staged
                if self._buffers["local_tri"] is not None
                else render_frame_fused_jit
            )
            if (
                frame_fn is render_frame_fused_staged
                and self._front_cache is not None
            ):
                # the front's only per-frame inputs, as raw bytes (the
                # 192-byte UBO analogue) — byte-equality keys the reuse
                extra = {
                    "front_cache": self._front_cache,
                    "front_key": (
                        np.ascontiguousarray(model_mats, dtype=F32).tobytes()
                        + np.ascontiguousarray(mvp, dtype=F32).tobytes()
                    ),
                }
        elif st.staged_pipeline:
            frame_fn = render_frame_staged
        else:
            frame_fn = render_frame_jit
        rgba8, aux = frame_fn(
            self.statics,
            self._buffers["positions"],
            self._buffers["vert_obj"],
            self._buffers["normals"],
            self._buffers["colors"],
            self._buffers["uvs"],
            self._buffers["tri_v"],
            self._buffers["tri_obj"],
            self._buffers["obj_material"],
            jnp.asarray(model_mats),
            jnp.asarray(mvp),
            jnp.asarray(camera.position.astype(F32)),
            self.materials,
            self.atlas,
            self.light,
            self._buffers["local_tri"],
            self._buffers["tri_mat"],
            **(
                {"ltT": self._buffers["ltT"], "matT": self._buffers["matT"]}
                if st.pipeline == "fused"
                else {}
            ),
            **extra,
        )
        self.stats.record_dispatch(time.perf_counter() - t0)
        return rgba8, aux

    def draw_frame(self, camera: Camera, model_mats=None, on_present=None,
                   extent=None):
        """Frame-loop step: render + submit to the present ring.  Returns the
        host RGBA8 of a frame completed frames_in_flight ago (or None).

        extent: the present target's current (width, height), when the
        caller has one (App passes its window extent).  If it no longer
        matches the built framebuffers, the renderer rebuilds its
        resize-dependent tier HERE, without caller help — the reference's
        in-draw OUT_OF_DATE/SUBOPTIMAL swapchain recovery
        (renderer.rs:416-428, 587-596)."""
        t0 = time.perf_counter()
        if extent is not None and tuple(extent) != (
            self.settings.width,
            self.settings.height,
        ):
            self.resize(*extent)
        rgba8, aux = self.render_frame(camera, model_mats)
        presented = self.ring.push(rgba8, on_present)
        self.stats.record_frame(time.perf_counter() - t0, aux)
        return presented

    def finish(self):
        """Drain in-flight frames (device_wait_idle analogue)."""
        return self.ring.drain()

    def read_frame(self, rgba8) -> np.ndarray:
        """Blocking readback of one frame."""
        return np.asarray(jax.device_get(rgba8))
