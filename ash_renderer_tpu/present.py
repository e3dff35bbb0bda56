"""Present layer: framebuffer ring + async device->host readback + image sinks.

The reference presents via a Vulkan swapchain with acquire/present semaphores
(``src/renderer/resize_dependent_components/swapchain_components.rs``,
``renderer.rs:570-585``).  The TPU equivalent: rendering is async-dispatched,
frames are held as device arrays in a small ring (image-count analogue,
min+1 per swapchain_components.rs:35-41), and "present" is a device->host
copy of the RGBA8 framebuffer that only blocks ``frames_in_flight`` frames
later — the fence-wait analogue (renderer.rs:395-404) — so readback overlaps
the next frames' compute.

Sinks: PNG/PPM file writers (PIL when available, pure-Python PPM otherwise)
and an in-memory collector for video/benchmarks.
"""

from __future__ import annotations

import collections
from typing import Callable, Optional

import jax
import numpy as np


class FrameRing:
    """Ring of in-flight frames with deferred blocking readback."""

    def __init__(self, frames_in_flight: int = 2):
        self.frames_in_flight = max(1, frames_in_flight)
        self._ring = collections.deque()

    def push(self, device_frame, on_ready: Optional[Callable] = None):
        """Submit a rendered device frame; returns the oldest frame's host
        array if the ring is full (the blocking 'fence wait'), else None."""
        self._ring.append((device_frame, on_ready))
        if len(self._ring) > self.frames_in_flight:
            return self._pop_ready()
        return None

    def _pop_ready(self):
        frame, cb = self._ring.popleft()
        host = np.asarray(jax.device_get(frame))
        if cb is not None:
            cb(host)
        return host

    def drain(self):
        """Flush all in-flight frames (teardown: the device_wait_idle
        analogue, renderer.rs:602)."""
        out = []
        while self._ring:
            out.append(self._pop_ready())
        return out


def write_ppm(path: str, rgba8: np.ndarray) -> None:
    """Dependency-free PPM (P6) writer; drops alpha."""
    h, w = rgba8.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(rgba8[..., :3]).tobytes())


def write_png(path: str, rgba8: np.ndarray) -> None:
    """PNG via PIL; falls back to PPM (path gets .ppm suffix) without it."""
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        write_ppm(path.rsplit(".", 1)[0] + ".ppm", rgba8)
        return
    Image.fromarray(rgba8, mode="RGBA").save(path)


class FrameCollector:
    """Collects presented frames in memory (tests, video assembly)."""

    def __init__(self):
        self.frames: list[np.ndarray] = []

    def __call__(self, frame: np.ndarray) -> None:
        self.frames.append(frame)
