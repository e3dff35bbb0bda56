"""Configuration for the TPU renderer.

The reference keeps one knob — ``UserSettings { preferred_physical_device_id }``
(``src/renderer.rs:34-44``) — with the contract that changing settings rebuilds
the whole settings-dependent world (``renderer.rs:624-627``), and that resizing
rebuilds only the resolution-dependent components (``renderer.rs:601-620``).

We keep the same three-tier contract (see ``renderer.py``):

* process/runtime init (jax platform, device list) — settings independent;
* :class:`RendererSettings` — changing any field rebuilds compiled kernels and
  device buffers (the SDC analogue);
* resolution (``width``/``height``/``supersample``) — changing it re-allocates
  framebuffers and re-jits shape-specialized kernels (the RDC analogue).

:class:`RasterConfig` holds the derived fixed-point / tiling parameters of the
rasterizer.  Everything here is hashable and static so it can key jit caches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["RendererSettings", "RasterConfig", "derive_raster_config"]


@dataclasses.dataclass(frozen=True)
class RendererSettings:
    """User-facing settings (analogue of UserSettings, renderer.rs:34-44)."""

    # Device preference: index into jax.devices(); None = highest-score device
    # (the reference scores discrete > integrated > virtual > cpu,
    # renderer.rs:370-386; for us platform order tpu > gpu > cpu plays that role).
    preferred_device_index: Optional[int] = None

    width: int = 800
    height: int = 600
    # Supersampling factor per axis: 1 = off, 2 = 4x SSAA (BASELINE config 5).
    supersample: int = 1
    # Clear values (renderer.rs:441-457: color clear + depth cleared to 1.0).
    clear_color: tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)
    # Encode framebuffer to sRGB on RGBA8 pack (the reference presents to the
    # first surface format the driver reports, commonly *_SRGB; we make the
    # choice explicit and default linear for oracle-parity simplicity).
    srgb_output: bool = False
    # Debug mode: NaN/inf guards + overflow counters (stand-in for the
    # reference's validation layer, debug_components.rs).
    debug: bool = False
    # Cap on triangles needing polygon clipping per frame (static shape;
    # overflow is counted and dropped in debug stats).
    clip_budget: int = 4096
    # Cap on (triangle, tile) pairs for the binner (static shape).
    max_pairs: int = 1 << 21
    # Number of framebuffer ring slots (swapchain image-count analogue;
    # the reference asks for min_image_count + 1, swapchain_components.rs:35-41).
    frames_in_flight: int = 2
    # Wide-triangle expansion budgets (fused pipeline): triangles whose AABB
    # spans >2 tiles in either axis are expanded into exact per-tile pair
    # runs up to these static caps; the overflow stays in the global wide
    # run (streamed by every tile), so the caps trade speed, never
    # correctness.  Measured: the zoomed headline frame pays +98 ms without
    # expansion (experiments/flyby_stage_probe.py).
    wide_rows: int = 1 << 15
    wide_pairs: int = 1 << 17
    # Per-stage jits instead of one fused frame function: ~10x faster
    # compiles at 1M-triangle shapes, a few percent slower steady-state.
    staged_pipeline: bool = False
    # Merge the fused pipeline's four XLA-front stages (vertex transform,
    # setup kernel, clip tail, sort/expand) into ONE jitted program:
    # identical results, 6 -> 3 device programs — the per-(program, shape)
    # device-load term dominates cold start on the remote TPU.  The big
    # raster kernel and the shade stage stay separate (including them is
    # what made the monolithic compile intractable).
    fused_front_merge: bool = True
    # Pipeline implementation: "fused" = the sort-binned fused Pallas
    # kernels (setup kernel + raster/distribute kernel, no XLA scalar-path
    # gathers, budget-free binning); "classic" = the round-1 pair-record
    # pipeline; "auto" = fused on TPU, classic elsewhere (Pallas interpret
    # mode is slow on CPU). Bit-identical outputs (tests/test_fused.py,
    # tests/test_setup_kernel.py).
    pipeline: str = "auto"
    # In-kernel surface shading (phase F: material modulation, mip select,
    # tap addressing, Blinn-Phong on the VMEM-resident interpolated rows).
    # "auto" = in-kernel only for UNTEXTURED scenes — on textured scenes the
    # measured A/B (experiments/phaseF_ab_probe.py, TPU v5e, bit-identical
    # legs) has the XLA shade path FASTER: headline 39.0 vs 40.6 ms/frame,
    # config5 40.4 vs 41.9 (the tap-addressing rows the kernel must emit
    # and the XLA pass must re-read cost more than the fused elementwise
    # they replace), while untextured scenes drop the whole XLA shade pass.
    # "on"/"off" force it (within the M<=16/T<=2 select-tree caps).
    fused_surface_shade: str = "auto"
    # Raster-kernel range streaming form: True = the tbl-sourced ranges
    # share ONE traced-index streaming/eval body (program ~3x smaller ->
    # much faster XLA compile: fresh-compile warmup 812 s -> 53 s at the
    # headline, useful when iterating on kernel shapes); False (default) =
    # one static instantiation per range — measured ~2 FPS faster steady
    # state at the headline (37.1-37.3 vs 35.1 clean-host runs).  The
    # per-process device-load term the loop form was meant to shrink
    # measured 46-812 s for the SAME cached program across runs on this
    # container's remote tunnel — dominated by tunnel/server state, not
    # program size — so runtime wins the default.  Bit-identical either
    # way (phase V's reduction and phase D's disjoint one-hot
    # accumulation are order-independent; both gated EXACT on hardware).
    kernel_range_loop: bool = False
    # Fused-kernel framebuffer tile height (4 or 8).  8 is the default;
    # 4 halves the pixel rows each streamed slot evaluates (phase V work)
    # at the cost of 2x grid steps and slightly more spill/wide rows —
    # an A/B knob for hardware measurement.
    fused_tile_h: int = 8
    # Live-row band gating of the shade stage's QUAD-TAP GATHER: fetch
    # texels only for the smallest static tile-row band (1/4, 1/2, full)
    # covering the rows with any coverage — the gather is index-count-
    # bound, so frames whose coverage is a horizontal band (terrain ~6%
    # of 1080p, the config5 fly-through) stop paying the dense full-
    # screen fetch.  Bit-identical (out-of-band pixels are invalid by
    # construction and masked before packing); only the gather sits in
    # the switch branches — banding the whole shade chain blew the
    # per-shape device load 3x (see pipeline._shade_from_planes).
    # Full-frame single-device path, textured scenes only.
    shade_row_band: bool = True
    # Frame-coherence reuse of the fused front stage: when the per-frame
    # host inputs (model + mvp matrices — the reference's 192-byte UBO,
    # renderer.rs:431-439) are byte-identical to the previous frame's, the
    # front outputs (sorted/gathered tables + range meta) are reused
    # instead of recomputed — bit-exact by construction (the front is a
    # pure deterministic function of scene buffers + those matrices; see
    # pipeline.FrontCache).  A static camera skips the setup kernel, the
    # 1.37M-key sort and the table gathers (~1/3 of the headline frame);
    # any motion misses byte-for-byte and recomputes.  Guarded by
    # bench.py's post-motion static re-gate and the facade cache tests.
    front_coherence: bool = True
    # Multi-chip rendering: render over the first n jax devices as a 1-D
    # framebuffer-row mesh (parallel/sharding.py); None = single device.
    # Any resolution works: an indivisible tile-row count is padded up
    # inside the sharded path and the frame cropped back.
    # The frame comes back bit-identical to single-device rendering
    # (tests/test_sharding.py); an explicit ``mesh=`` argument to Renderer
    # overrides this knob.
    n_devices: Optional[int] = None

    @property
    def render_width(self) -> int:
        return self.width * self.supersample

    @property
    def render_height(self) -> int:
        return self.height * self.supersample


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Derived static rasterizer parameters.

    Fixed-point contract: vertex positions are snapped to a grid of
    ``1 / (1 << subpixel_bits)`` pixels and clamped to a guard rect extending
    ``guard_px`` beyond the screen.  With the rect's total extent bounded by
    ``2**15 - 16`` subpixel units, every edge-function value and the signed
    area fit in int32 (|E| <= 2 * extent^2 < 2^31), making coverage and depth
    bit-exact and platform-independent.  This replaces the float rasterization
    the GPU fixed-function hardware performs in the reference
    (graphics_pipeline_components.rs:69-108) with an exactly specified one.
    """

    width: int
    height: int
    subpixel_bits: int
    guard_px: int
    tile_h: int
    tile_w: int
    # Triangles processed per block in the visibility kernel.
    tri_block: int = 128
    # Inner-loop unroll factor for the per-triangle loop.
    tri_unroll: int = 1
    @property
    def subpixel_scale(self) -> int:
        return 1 << self.subpixel_bits

    @property
    def grid_h(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def grid_w(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def n_tiles(self) -> int:
        return self.grid_h * self.grid_w

    # Guard-rect bounds in snapped subpixel units (inclusive).
    @property
    def min_coord(self) -> int:
        return -self.guard_px * self.subpixel_scale

    @property
    def max_coord_x(self) -> int:
        return (self.width + self.guard_px) * self.subpixel_scale

    @property
    def max_coord_y(self) -> int:
        return (self.height + self.guard_px) * self.subpixel_scale


_MAX_EXTENT_SUBPIX = (1 << 15) - 16  # keeps 2*extent^2 < 2^31 with headroom


def derive_raster_config(
    width: int,
    height: int,
    tile_h: int = 16,
    tile_w: int = 128,
    guard_px: int = 32,
    tri_block: int = 128,
) -> RasterConfig:
    """Pick the largest subpixel precision that keeps int32 edge functions safe.

    The extent bound covers the tile-padded framebuffer (edge tiles extend
    past the screen, and the raster kernel evaluates edge functions at those
    samples too)."""
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    extent_px = max(pad_w, pad_h, width, height) + 2 * guard_px
    subpixel_bits = 4
    while subpixel_bits > 0 and extent_px * (1 << subpixel_bits) > _MAX_EXTENT_SUBPIX:
        subpixel_bits -= 1
    if extent_px * (1 << subpixel_bits) > _MAX_EXTENT_SUBPIX:
        raise ValueError(
            f"resolution {width}x{height} too large for int32 fixed-point raster"
        )
    return RasterConfig(
        width=width,
        height=height,
        subpixel_bits=subpixel_bits,
        guard_px=guard_px,
        tile_h=tile_h,
        tile_w=tile_w,
        tri_block=tri_block,
    )
