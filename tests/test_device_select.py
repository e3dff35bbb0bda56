"""Device selection mirrors the reference's preference+scoring semantics."""

import types

import jax
import pytest

from ash_renderer_tpu import RendererSettings
from ash_renderer_tpu.renderer import select_device


def test_explicit_preference_honored():
    devices = jax.devices()
    st = RendererSettings(preferred_device_index=len(devices) - 1)
    assert select_device(st) is devices[len(devices) - 1]


def test_score_order(monkeypatch):
    fake = [
        types.SimpleNamespace(platform="cpu", id=0),
        types.SimpleNamespace(platform="tpu", id=1),
        types.SimpleNamespace(platform="gpu", id=2),
    ]
    monkeypatch.setattr(jax, "devices", lambda: fake)
    assert select_device(RendererSettings()).platform == "tpu"
    assert (
        select_device(RendererSettings(preferred_device_index=0)).platform
        == "cpu"
    )


def test_update_settings_reselects_device():
    import dataclasses

    import jax

    from ash_renderer_tpu import reference_two_triangle_scene
    from ash_renderer_tpu.renderer import Renderer

    devices = jax.devices()
    r = Renderer(
        reference_two_triangle_scene(),
        dataclasses.replace(
            __import__("ash_renderer_tpu").RendererSettings(
                width=64, height=48, clip_budget=32
            ),
            preferred_device_index=0,
        ),
    )
    assert r.device is devices[0]
    new = dataclasses.replace(
        r.settings, preferred_device_index=len(devices) - 1
    )
    r.update_settings(new)
    assert r.device is devices[len(devices) - 1]
    # renders on the new device
    from ash_renderer_tpu import Camera
    import numpy as np

    rgba8, aux = r.render_frame(Camera())
    assert np.asarray(rgba8).shape == (48, 64, 4)
