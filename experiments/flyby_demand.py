"""Pure-numpy wide-pair demand curve over bench.py's fly-by path.

No TPU needed: replays the oracle's vertex transform + snap + cull for each
of the 24 fly-by cameras and counts the binner's key populations — tiled
rows, wide rows (AABB > 2 tiles either axis), and the exact (tile, row)
pair demand of the wide rows.  This sizes the wide_rows / wide_pairs
budgets whose overflow degenerates the kernel to all-tiles x all-wide
(BENCH_r03: 6.11 FPS moving vs 23.0 static).

Note: near-plane-clipped triangles are EXCLUDED here (the oracle clip path
is slow in numpy); their fans add <= clip_budget * 4 extra rows, counted
separately as n_clipflagged.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from ash_renderer_tpu.benchmarks import config4_million_tri
from ash_renderer_tpu import specmath as sm
from ash_renderer_tpu.config import derive_raster_config
from ash_renderer_tpu.oracle.raster_cpu import compose_mvp

F32, I32 = np.float32, np.int32


def main():
    scene, settings, cams = config4_million_tri(subdiv=8)
    packed = scene.pack()
    cfg = derive_raster_config(
        settings.render_width, settings.render_height, tile_h=8
    )
    mm = scene.model_matrices()
    pos = packed.positions
    tri = packed.tri_v
    valid_tri = tri[:, 0] >= 0

    from bench import flyby_path

    fcams = flyby_path(24)

    ss = cfg.subpixel_scale
    half = ss // 2
    print(
        f"{'i':>2} {'tiled':>8} {'wide':>7} {'pairs':>9} {'p99tiles':>8} "
        f"{'maxtiles':>8} {'clipflag':>8}"
    )
    for i, cam in enumerate(fcams):
        view = cam.view_matrix()
        proj = cam.projection_matrix(settings.render_width / settings.render_height)
        mvp = compose_mvp(mm, view, proj)[0]
        cx, cy, cz, cw = sm.apply_mat4_point(
            mvp.astype(F32), pos[:, 0], pos[:, 1], pos[:, 2]
        )
        with np.errstate(all="ignore"):
            iw = np.where(np.isfinite(1.0 / cw) & (cw != 0), 1.0 / cw, 0.0).astype(F32)
            ndx = np.where(np.isfinite(cx * iw), cx * iw, 0.0).astype(F32)
            ndy = np.where(np.isfinite(cy * iw), cy * iw, 0.0).astype(F32)
        xi = sm.snap_coord(ndx, cfg.width, ss, cfg.min_coord, cfg.max_coord_x, np)
        yi = sm.snap_coord(ndy, cfg.height, ss, cfg.min_coord, cfg.max_coord_y, np)
        # outcodes for frustum classify (geometry semantics: fast = all-in)
        gx = F32(1.0 + 2.0 * cfg.guard_px / cfg.width)
        gy = F32(1.0 + 2.0 * cfg.guard_px / cfg.height)
        oc = (
            ((cz < 0).astype(I32) << 0)
            | (((cw - cz) < 0).astype(I32) << 1)
            | (((gx * cw + cx) < 0).astype(I32) << 2)
            | (((gx * cw - cx) < 0).astype(I32) << 3)
            | (((gy * cw + cy) < 0).astype(I32) << 4)
            | (((gy * cw - cy) < 0).astype(I32) << 5)
        )
        oc_t = oc[tri]
        out_any = (oc_t[:, 0] & oc_t[:, 1] & oc_t[:, 2]) != 0
        all_in = (oc_t[:, 0] | oc_t[:, 1] | oc_t[:, 2]) == 0
        fast = valid_tri & all_in
        clipflag = valid_tri & ~all_in & ~out_any

        x = xi[tri]
        y = yi[tri]
        sl = sm.shoelace2(x[:, 0], y[:, 0], x[:, 1], y[:, 1], x[:, 2], y[:, 2])
        v = fast & (sl < 0)
        xmin, xmax = x.min(1), x.max(1)
        ymin, ymax = y.min(1), y.max(1)
        pxmin = np.maximum(0, (xmin - half + ss - 1) // ss)
        pxmax = np.minimum(cfg.width - 1, (xmax - half) // ss)
        pymin = np.maximum(0, (ymin - half + ss - 1) // ss)
        pymax = np.minimum(cfg.height - 1, (ymax - half) // ss)
        live = v & (pxmax >= pxmin) & (pymax >= pymin)
        tx0, tx1 = pxmin // cfg.tile_w, pxmax // cfg.tile_w
        ty0, ty1 = pymin // cfg.tile_h, pymax // cfg.tile_h
        wide = live & ((tx1 - tx0 > 1) | (ty1 - ty0 > 1))
        tiled = live & ~wide
        ntiles = np.where(wide, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
        pairs = int(ntiles.sum())
        nw = int(wide.sum())
        p99 = int(np.percentile(ntiles[wide], 99)) if nw else 0
        mx = int(ntiles.max()) if nw else 0

        # --- clip-fan demand: Sutherland-Hodgman the flagged triangles
        # (oracle semantics, budget-capped) and count their fans' spans
        from ash_renderer_tpu.oracle.raster_cpu import _clip_polygon

        fan_rows = fan_wide = fan_pairs = 0
        fan_max = 0
        flag_idx = np.nonzero(clipflag)[0][: settings.clip_budget]
        clip4 = np.stack([cx, cy, cz, cw], axis=1).astype(F32)
        gxf = float(gx)
        gyf = float(gy)
        for t in flag_idx:
            vid = tri[t]
            pv, _ = _clip_polygon(
                clip4[vid], np.zeros((3, 4), F32), gxf, gyf
            )
            if len(pv) < 3:
                continue
            pv = np.stack(pv)
            with np.errstate(all="ignore"):
                piw = 1.0 / pv[:, 3]
                piw = np.where(np.isfinite(piw), piw, 0.0).astype(F32)
                pnx = np.where(np.isfinite(pv[:, 0] * piw), pv[:, 0] * piw, 0.0)
                pny = np.where(np.isfinite(pv[:, 1] * piw), pv[:, 1] * piw, 0.0)
            fx = sm.snap_coord(pnx.astype(F32), cfg.width, ss,
                               cfg.min_coord, cfg.max_coord_x, np)
            fy = sm.snap_coord(pny.astype(F32), cfg.height, ss,
                               cfg.min_coord, cfg.max_coord_y, np)
            for j in range(pv.shape[0] - 2):
                xs = np.array([fx[0], fx[j + 1], fx[j + 2]])
                ys = np.array([fy[0], fy[j + 1], fy[j + 2]])
                if sm.shoelace2(xs[0], ys[0], xs[1], ys[1], xs[2], ys[2]) >= 0:
                    continue
                a0 = max(0, (int(xs.min()) - half + ss - 1) // ss)
                a1 = min(cfg.width - 1, (int(xs.max()) - half) // ss)
                b0 = max(0, (int(ys.min()) - half + ss - 1) // ss)
                b1 = min(cfg.height - 1, (int(ys.max()) - half) // ss)
                if a1 < a0 or b1 < b0:
                    continue
                nt = (a1 // cfg.tile_w - a0 // cfg.tile_w + 1) * (
                    b1 // cfg.tile_h - b0 // cfg.tile_h + 1
                )
                fan_rows += 1
                if nt > 2:
                    fan_wide += 1
                    fan_pairs += nt
                    fan_max = max(fan_max, nt)
        print(
            f"{i:2d} {int(tiled.sum()):8d} {nw:7d} {pairs:9d} {p99:8d} "
            f"{mx:8d} {int(clipflag.sum()):8d} | fans={fan_rows:6d} "
            f"fwide={fan_wide:6d} fpairs={fan_pairs:8d} fmax={fan_max:6d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
