"""Capture a jax.profiler device trace of the fused config4 frame and print
the top-N fusions by device time (reads the Chrome-trace JSON the profiler
writes — no TensorBoard needed), each attributed to its source line via the
compiled HLO module's metadata."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ash_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ash_renderer_tpu.benchmarks import ALL_CONFIGS, config4_million_tri
    from ash_renderer_tpu.renderer import Renderer
    import dataclasses

    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "config4_million_tri"
    pipeline = sys.argv[2] if len(sys.argv) > 2 else "fused"
    scene, settings, cams = ALL_CONFIGS[cfg_name]()
    settings = dataclasses.replace(settings, pipeline=pipeline)
    r = Renderer(scene, settings)
    cam = cams[0]

    def force(x):
        return np.asarray(x.ravel()[:4])

    rgba8, _ = r.render_frame(cam)
    force(rgba8)
    t0 = time.time()
    for _ in range(3):
        rgba8, _ = r.render_frame(cam)
    force(rgba8)
    print(f"steady frame: {(time.time()-t0)/3*1000:.1f} ms", file=sys.stderr)

    tdir = "/tmp/ash_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(2):
            rgba8, _ = r.render_frame(cam)
        force(rgba8)

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    # device-side complete events, grouped by (thread track, op name):
    # the TPU profiler emits separate "XLA Modules" (whole-executable
    # spans — the per-stage ground truth) and "XLA Ops" (per-fusion)
    # tracks; summing them together double-counts
    pid_names = {}
    tid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    tracks = defaultdict(lambda: defaultdict(float))
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        tname = tid_names.get((ev.get("pid"), ev.get("tid")), "?")
        tracks[tname][ev.get("name", "")] += ev.get("dur", 0)
    for tname, by_name in sorted(tracks.items()):
        total = sum(by_name.values())
        print(f"--- track '{tname}': total {total/1000:.1f} ms (2 frames)")
        for nm, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:14]:
            print(f"    {us/1000/2:8.2f} ms/frame  {nm[:68]}")
    by_name = tracks[max(tracks, key=lambda t: sum(tracks[t].values()))]

    # Attribute op names to source lines via the compiled HLO text.
    # (Skipped for the staged fused pipeline: its modules are the stage
    # jits, and compiling the monolithic graph for names takes >10 min.)
    attrib = {}
    try:
        import re

        from ash_renderer_tpu import pipeline as plmod
        from ash_renderer_tpu.oracle.raster_cpu import compose_mvp

        if r.settings.pipeline == "fused":
            raise RuntimeError("staged fused: per-module attribution n/a")
        st = r.settings
        mm = r.scene.model_matrices()
        view = cam.view_matrix()
        proj = cam.projection_matrix(st.render_width / st.render_height)
        fn = (
            plmod.render_frame_fused_jit
            if st.pipeline == "fused"
            else plmod.render_frame_jit
        )
        hlo = fn.lower(
            r.statics,
            r._buffers["positions"], r._buffers["vert_obj"],
            r._buffers["normals"], r._buffers["colors"], r._buffers["uvs"],
            r._buffers["tri_v"], r._buffers["tri_obj"],
            r._buffers["obj_material"],
            jnp.asarray(mm), jnp.asarray(compose_mvp(mm, view, proj)),
            jnp.asarray(cam.position.astype(np.float32)),
            r.materials, r.atlas, r.light,
            r._buffers["local_tri"], r._buffers["tri_mat"],
        ).compile().as_text()
        pat = re.compile(
            r"%?([\w.\-]+) = .*?metadata=\{([^}]*)\}"
        )
        meta_src = re.compile(
            r'op_name="([^"]*)"(?:.*?source_file="([^"]*)")?'
            r"(?:.*?source_line=(\d+))?"
        )
        for m in pat.finditer(hlo):
            nm, meta = m.group(1), m.group(2)
            mm = meta_src.search(meta)
            if mm:
                src = mm.group(2) or ""
                line = mm.group(3) or ""
                attrib[nm] = f'{mm.group(1)[:60]} {src.split("/")[-1]}:{line}'
    except Exception as e:  # pragma: no cover — attribution is best-effort
        print(f"(hlo attribution unavailable: {e})", file=sys.stderr)

    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        where = attrib.get(name.split("(")[0], "")
        print(f"{us/2000.0:9.2f} ms  {name[:70]:70s}  {where}")


if __name__ == "__main__":
    main()
