"""Golden-frame regression: pinned hashes of oracle output catch any
unintended change to the rasterization semantics (which would silently
re-baseline every parity test, since device and oracle share the spec)."""

import hashlib

import numpy as np

from ash_renderer_tpu import (
    Camera,
    RendererSettings,
    reference_two_triangle_scene,
)
from ash_renderer_tpu.oracle import render_oracle

GOLDEN_SHA = "39b86430fefc451ba3762f44f61f7d44ed29bdd07e85e190745edbd1cee4235e"


def test_reference_scene_golden_hash():
    scene = reference_two_triangle_scene()
    st = RendererSettings(width=320, height=240)
    cam = Camera()
    out = render_oracle(
        scene.pack(),
        scene.model_matrices(),
        cam.view_matrix(),
        cam.projection_matrix(320 / 240),
        st,
    )
    rgba8 = out["rgba8"]
    assert int((out["vis_tri"] >= 0).sum()) == 23328
    assert hashlib.sha256(rgba8.tobytes()).hexdigest() == GOLDEN_SHA, (
        "rasterization semantics changed: if intentional, re-pin the golden "
        "hash AND regenerate tests/golden/reference_320x240.png"
    )
    # and the stored image matches
    from PIL import Image

    stored = np.asarray(Image.open("tests/golden/reference_320x240.png"))
    np.testing.assert_array_equal(stored, rgba8)
