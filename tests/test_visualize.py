"""Rendering scripts: static panels + convergence animation.

The reference ships demo GIFs and exposes get_last_transform for a live
visualizer (/root/reference/fgoicp/fgoicp.hpp:32-43, imgs/*.gif); these
tests drive the offline equivalents on tiny clouds.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

matplotlib = pytest.importorskip("matplotlib")

from scripts import visualize as viz  # noqa: E402


@pytest.fixture()
def tiny_clouds():
    rng = np.random.default_rng(0)
    pct = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    pcs = pct[:40] @ np.eye(3, dtype=np.float32)
    return pct, pcs


def test_render_static(tiny_clouds, tmp_path):
    pct, pcs = tiny_clouds
    out = tmp_path / "panel.png"
    viz.render(pct, pcs, np.eye(3, dtype=np.float32),
               np.zeros(3, np.float32), str(out), title="test")
    assert out.exists() and out.stat().st_size > 1000


def test_render_animation(tiny_clouds, tmp_path):
    pct, pcs = tiny_clouds
    ang = 0.6
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    frames = [
        ("initial", np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
        ("t=0.5s sse=1.2", R, np.array([0.1, 0, 0], np.float32)),
        ("t=1.0s sse=0.01", R, np.array([0.2, -0.1, 0], np.float32)),
    ]
    out = tmp_path / "conv.gif"
    viz.render_animation(pct, pcs, frames, str(out), fps=4)
    data = out.read_bytes()
    assert data[:6] in (b"GIF87a", b"GIF89a")
    assert len(data) > 2000
