"""Shared pipeline data types, usable with numpy (oracle) or jnp (device).

Registered as jax pytrees so jitted device functions can take/return them
directly while the oracle fills them with numpy arrays.
"""

from __future__ import annotations

import dataclasses

import jax

__all__ = ["TriangleSetup", "MaterialsPack", "LightPack", "register_pytree_dataclass"]


def register_pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@register_pytree_dataclass
@dataclasses.dataclass
class TriangleSetup:
    """SoA of rasterizer-ready triangles (see oracle/raster_cpu.py for the
    producing spec).  Row index == draw index for depth-tie resolution."""

    valid: object  # (S,) bool
    x0: object  # (S,) i32 snapped subpixel coords, winding normalized
    y0: object
    x1: object
    y1: object
    x2: object
    y2: object
    area2: object  # (S,) i32 > 0 where valid
    inv_area2: object  # (S,) f32 = 1 / f32(area2)
    zq0: object  # (S,) i32 D16 vertex depths
    zq1: object
    zq2: object
    iw0: object  # (S,) f32 per-corner 1/w_clip
    iw1: object
    iw2: object
    v0: object  # (S,) i32 into the combined attribute table
    v1: object
    v2: object
    mat: object  # (S,) i32 material ids


@register_pytree_dataclass
@dataclasses.dataclass
class MaterialsPack:
    base_color: object  # (M, 4) f32
    tex_id: object  # (M,) i32, -1 = untextured
    specular: object  # (M,) f32
    shininess: object  # (M,) i32  (< 256; specular exponent)


@register_pytree_dataclass
@dataclasses.dataclass
class LightPack:
    direction: object  # (3,) f32 world-space, need not be normalized
    color: object  # (3,) f32
    ambient: object  # () f32
