"""Scene containers: meshes, objects, materials, lights, and device packing.

The reference's scene state is a hard-coded vertex/index buffer pair
(``src/renderer/vertex_buffer_components.rs:12-37``,
``src/renderer/index_buffer_components.rs:5-6``) uploaded via staging buffers,
plus one global model matrix (``src/renderer/camera.rs:21-26``).  Here a scene
is a list of meshes instanced by objects with per-object model matrices
(finishing what the reference's empty ``src/model_loader.rs`` intended), packed
into padded structure-of-arrays jnp-compatible buffers for the TPU pipeline.

Vertex attribute layout mirrors the reference's ``Vertex { position, color }``
(vertex_buffer_components.rs:5-10), extended with normals and uvs for the
lighting/texturing configs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from . import mathx

_F32 = np.float32
_I32 = np.int32

VERTEX_PAD = 128  # pad vertex counts to lane multiples
TRI_PAD = 128


def _as2d(a, n, width, fill=0.0, dtype=_F32):
    if a is None:
        out = np.full((n, width), fill, dtype=dtype)
    else:
        out = np.asarray(a, dtype=dtype).reshape(n, width).copy()
    return out


@dataclasses.dataclass
class Mesh:
    """A triangle mesh with optional per-vertex attributes."""

    positions: np.ndarray  # (N, 3) f32
    indices: np.ndarray  # (T, 3) i32, CCW-front per reference convention
    colors: Optional[np.ndarray] = None  # (N, 4) f32, default white
    normals: Optional[np.ndarray] = None  # (N, 3) f32, default +0 (unlit)
    uvs: Optional[np.ndarray] = None  # (N, 2) f32

    def __post_init__(self):
        self.positions = np.asarray(self.positions, dtype=_F32).reshape(-1, 3)
        n = len(self.positions)
        self.indices = np.asarray(self.indices, dtype=_I32).reshape(-1, 3)
        self.colors = _as2d(self.colors, n, 4, 1.0)
        self.normals = _as2d(self.normals, n, 3, 0.0)
        self.uvs = _as2d(self.uvs, n, 2, 0.0)
        if self.indices.size and (
            self.indices.min() < 0 or self.indices.max() >= n
        ):
            raise ValueError("mesh indices out of range")

    @property
    def num_vertices(self) -> int:
        return len(self.positions)

    @property
    def num_triangles(self) -> int:
        return len(self.indices)

    def compute_normals(self) -> "Mesh":
        """Area-weighted smooth vertex normals (for meshes loaded without)."""
        p = self.positions.astype(np.float64)
        i0, i1, i2 = self.indices.T
        fn = np.cross(p[i1] - p[i0], p[i2] - p[i0])
        vn = np.zeros_like(p)
        for k, idx in enumerate((i0, i1, i2)):
            np.add.at(vn, idx, fn)
        ln = np.linalg.norm(vn, axis=1, keepdims=True)
        vn = np.where(ln > 1e-20, vn / np.maximum(ln, 1e-20), 0.0)
        self.normals = vn.astype(_F32)
        return self


@dataclasses.dataclass
class Material:
    base_color: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    texture_id: int = -1  # index into the scene's TextureAtlas, -1 = none
    specular: float = 0.0  # specular strength (0 disables)
    shininess: int = 32  # integer exponent (evaluated by squaring: exact)


@dataclasses.dataclass
class DirectionalLight:
    direction: tuple[float, float, float] = (0.0, 0.0, 1.0)  # world space
    color: tuple[float, float, float] = (1.0, 1.0, 1.0)
    ambient: float = 0.1


@dataclasses.dataclass
class SceneObject:
    mesh: int  # index into Scene.meshes
    model: np.ndarray = dataclasses.field(default_factory=lambda: mathx.IDENTITY)
    material: int = 0

    def __post_init__(self):
        self.model = np.asarray(self.model, dtype=_F32).reshape(4, 4)


@dataclasses.dataclass
class Scene:
    meshes: list[Mesh] = dataclasses.field(default_factory=list)
    objects: list[SceneObject] = dataclasses.field(default_factory=list)
    materials: list[Material] = dataclasses.field(
        default_factory=lambda: [Material()]
    )
    light: Optional[DirectionalLight] = None
    atlas: Optional["object"] = None  # textures.TextureAtlas

    def add_mesh(self, mesh: Mesh) -> int:
        self.meshes.append(mesh)
        return len(self.meshes) - 1

    def add_object(self, obj: SceneObject) -> int:
        self.objects.append(obj)
        return len(self.objects) - 1

    def add_material(self, mat: Material) -> int:
        self.materials.append(mat)
        return len(self.materials) - 1

    def model_matrices(self) -> np.ndarray:
        return np.stack([o.model for o in self.objects]).astype(_F32)

    def pack(self) -> "PackedScene":
        return PackedScene.from_scene(self)


@dataclasses.dataclass
class PackedScene:
    """Flattened, padded SoA buffers ready for device upload.

    Geometry is concatenated per object instance: each object gets its own
    copy of its mesh's vertex range, and every packed vertex carries the
    owning object id so the vertex stage can apply per-object model matrices
    with a single gathered matrix lookup (no per-triangle indirection).
    """

    positions: np.ndarray  # (V, 3) f32, padded
    colors: np.ndarray  # (V, 4)
    normals: np.ndarray  # (V, 3)
    uvs: np.ndarray  # (V, 2)
    vert_obj: np.ndarray  # (V,) i32 — owning object per packed vertex copy
    tri_v: np.ndarray  # (T, 3) i32 global vertex ids (-1 rows = padding)
    tri_obj: np.ndarray  # (T,) i32
    obj_material: np.ndarray  # (O,) i32
    num_vertices: int
    num_triangles: int
    has_normals: bool

    @staticmethod
    def from_scene(scene: Scene) -> "PackedScene":
        pos, col, nrm, uv, vobj = [], [], [], [], []
        tri, tobj = [], []
        vtx_base = 0
        for oi, obj in enumerate(scene.objects):
            m = scene.meshes[obj.mesh]
            pos.append(m.positions)
            col.append(m.colors)
            nrm.append(m.normals)
            uv.append(m.uvs)
            vobj.append(np.full(m.num_vertices, oi, dtype=_I32))
            tri.append(m.indices + vtx_base)
            tobj.append(np.full(m.num_triangles, oi, dtype=_I32))
            vtx_base += m.num_vertices
        if not pos:
            raise ValueError("empty scene")
        positions = np.concatenate(pos)
        nv = len(positions)
        nt = sum(len(t) for t in tri)
        vpad = -nv % VERTEX_PAD
        tpad = -nt % TRI_PAD

        def padv(a, w):
            return np.concatenate([a, np.zeros((vpad, w), dtype=_F32)])

        positions = padv(positions, 3)
        colors = padv(np.concatenate(col), 4)
        normals = padv(np.concatenate(nrm), 3)
        uvs = padv(np.concatenate(uv), 2)
        vert_obj = np.concatenate(vobj + [np.zeros(vpad, dtype=_I32)])
        tri_v = np.concatenate(
            tri + [np.full((tpad, 3), -1, dtype=_I32)]
        ).astype(_I32)
        tri_obj = np.concatenate(tobj + [np.zeros(tpad, dtype=_I32)]).astype(_I32)
        has_normals = any(
            np.any(scene.meshes[o.mesh].normals != 0) for o in scene.objects
        )
        return PackedScene(
            positions=positions,
            colors=colors,
            normals=normals,
            uvs=uvs,
            vert_obj=vert_obj,
            tri_v=tri_v,
            tri_obj=tri_obj,
            obj_material=np.array(
                [o.material for o in scene.objects], dtype=_I32
            ),
            num_vertices=nv,
            num_triangles=nt,
            has_normals=has_normals,
        )


def reference_two_triangle_scene() -> Scene:
    """The reference's hard-coded scene: 6 vertices, 2 triangles at z=2 and
    z=3 with per-vertex colors (vertex_buffer_components.rs:12-37) and indices
    [0..5] (index_buffer_components.rs:5-6).  Under the reference's CCW-front
    + back-cull state only the z=2 triangle is front-facing."""
    positions = [
        [-1.0, 1.0, 2.0],
        [1.0, 1.0, 2.0],
        [0.0, -1.0, 2.0],
        [-1.0, -1.0, 3.0],
        [1.0, -1.0, 3.0],
        [0.0, 1.0, 3.0],
    ]
    colors = [
        [1.0, 1.0, 0.0, 1.0],
        [1.0, 0.0, 1.0, 1.0],
        [1.0, 1.0, 0.0, 1.0],
        [0.0, 1.0, 0.5, 1.0],
        [0.5, 0.0, 1.0, 1.0],
        [1.0, 0.5, 0.0, 1.0],
    ]
    mesh = Mesh(
        positions=np.array(positions, dtype=_F32),
        indices=np.array([[0, 1, 2], [3, 4, 5]], dtype=_I32),
        colors=np.array(colors, dtype=_F32),
    )
    scene = Scene()
    mi = scene.add_mesh(mesh)
    scene.add_object(SceneObject(mesh=mi, model=mathx.IDENTITY))
    return scene
