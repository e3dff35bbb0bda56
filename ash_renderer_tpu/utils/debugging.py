"""Debug mode: the framework's analogue of the reference's Vulkan validation
layer + debug messenger (``src/renderer/debug_components.rs``, active only in
debug builds, renderer.rs:93-100).

What the validation layer caught at the API level (sync hazards, misuse),
XLA's dataflow makes structurally impossible; what remains worth guarding:

* NaN/Inf escaping the geometry pipeline into visible pixels;
* budget overflows (clip budget, pair budget) silently dropping work;
* out-of-range triangle ids in the visibility buffer;
* divergence from the CPU oracle (the deepest check, opt-in per frame).

`validate_frame` returns a list of human-readable findings; `DebugMessenger`
mirrors the severity/type callback shape of the reference's messenger
(debug_components.rs:46-72) printing to stdout.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

SEVERITIES = ("INFO", "WARNING", "ERROR")


@dataclasses.dataclass
class Finding:
    severity: str
    kind: str
    message: str

    def __str__(self):
        return f"[{self.severity}][{self.kind}] {self.message}"


class DebugMessenger:
    """Collects findings and prints them (stdout, like the reference's
    callback); severity filter defaults to WARNING+."""

    def __init__(self, min_severity: str = "WARNING",
                 sink: Callable[[str], None] = print):
        self.min_severity = min_severity
        self.sink = sink
        self.findings: list[Finding] = []

    def report(self, finding: Finding) -> None:
        self.findings.append(finding)
        if SEVERITIES.index(finding.severity) >= SEVERITIES.index(
            self.min_severity
        ):
            self.sink(str(finding))


def validate_frame(aux: dict, rgba8=None, messenger: DebugMessenger = None):
    """Check a frame's aux outputs for anomalies; returns findings."""
    messenger = messenger or DebugMessenger(sink=lambda s: None)
    out = []

    def emit(severity, kind, msg):
        f = Finding(severity, kind, msg)
        out.append(f)
        messenger.report(f)

    for key, kind in (
        ("clip_overflow", "clip-budget"),
        ("pairs_overflow", "pair-budget"),
    ):
        if key in aux:
            v = int(np.asarray(aux[key]))
            if v > 0:
                emit(
                    "WARNING",
                    kind,
                    f"{v} items dropped ({key}); raise the budget in "
                    "RendererSettings",
                )
    if "vis_tri" in aux and "n_setup" in aux:
        vt = np.asarray(aux["vis_tri"])
        n_setup = int(np.asarray(aux["n_setup"]))
        bad = int(((vt < -1) | (vt >= n_setup)).sum())
        if bad:
            emit(
                "ERROR",
                "tri-id-range",
                f"{bad} visibility-buffer pixels reference triangle ids "
                f"outside [-1, {n_setup}) — corrupted raster output",
            )
    if rgba8 is not None:
        arr = np.asarray(rgba8)
        if arr.dtype != np.uint8:
            if not np.isfinite(arr).all():
                emit("ERROR", "nan-inf", "non-finite values in framebuffer")
    if not out:
        emit("INFO", "ok", "frame clean")
    return out


def compare_with_oracle(renderer, camera, model_mats=None) -> list[Finding]:
    """Deep check: render the current scene with the CPU oracle and diff —
    the 'pixel parity vs CPU ref' oracle as an online debug tool."""
    import jax

    from ..oracle import render_oracle

    rgba8, aux = renderer.render_frame(camera, model_mats)
    packed = renderer.packed
    st = renderer.settings
    view = camera.view_matrix()
    proj = camera.projection_matrix(st.render_width / st.render_height)
    o = render_oracle(
        packed,
        model_mats if model_mats is not None else renderer.scene.model_matrices(),
        view,
        proj,
        st,
        materials=jax.device_get(renderer.materials),
        atlas=jax.device_get(renderer.atlas) if renderer.atlas else None,
        light=jax.device_get(renderer.light) if renderer.light else None,
        camera_pos=camera.position.astype(np.float32),
    )
    host = np.asarray(jax.device_get(rgba8))
    findings = []
    if np.array_equal(host, o["rgba8"]):
        findings.append(Finding("INFO", "oracle", "pixel-exact match"))
    else:
        ndiff = int((host != o["rgba8"]).any(axis=-1).sum())
        findings.append(
            Finding(
                "ERROR",
                "oracle",
                f"{ndiff} pixels differ from CPU oracle "
                f"(max |d|={int(np.abs(host.astype(int)-o['rgba8'].astype(int)).max())})",
            )
        )
    return findings
