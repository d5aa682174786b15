"""Viewer/video path coverage (round-2 VERDICT weak-6).

The TPU hosts are headless (no GLFW display, no EGL/OSMesa GL libs), so
these tests exercise the full control/mirror/encode loops of viz/live.py
and viz/replay.render_video against injected viewer/renderer doubles; the
real-GL rasterization test runs only where a GL backend exists.
"""

import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from humanoid_mppi_rl_tpu.viz import live, replay

ASSETS = os.path.join(os.path.dirname(__file__), "..",
                      "humanoid_mppi_rl_tpu", "assets")
CARTPOLE = os.path.join(ASSETS, "cartpole.xml")


class MockHandle:
    """Stands in for mujoco.viewer.launch_passive's handle."""

    def __init__(self, live_steps=None):
        self.syncs = 0
        self.closed = False
        self.live_steps = live_steps   # None = stays open forever

    def is_running(self):
        return self.live_steps is None or self.syncs < self.live_steps

    def sync(self):
        self.syncs += 1

    def close(self):
        self.closed = True


def _mock_launcher(handle):
    def launch(asset_path):
        m = mujoco.MjModel.from_xml_path(asset_path)
        d = mujoco.MjData(m)
        return mujoco, m, d, handle
    return launch


def test_mirror_trajectory_mock_viewer(monkeypatch):
    """mirror_trajectory pushes every strided row through mj_forward+sync."""
    handle = MockHandle()
    monkeypatch.setattr(live, "_launch_viewer", _mock_launcher(handle))
    states = np.zeros((12, 4), np.float64)
    states[:, 0] = np.linspace(-0.5, 0.5, 12)   # slider sweep
    live.mirror_trajectory(CARTPOLE, states, fps=1e6, stride=2)
    assert handle.syncs == 6
    assert handle.closed


def test_mirror_trajectory_stops_when_viewer_closes(monkeypatch):
    handle = MockHandle(live_steps=3)
    monkeypatch.setattr(live, "_launch_viewer", _mock_launcher(handle))
    live.mirror_trajectory(CARTPOLE, np.zeros((10, 4)), fps=1e6, loop=True)
    assert handle.syncs == 3      # stopped by is_running, not by the data
    assert handle.closed


def test_live_run_mirrors_every_step(monkeypatch):
    """live_run = full closed-loop control with a per-step viewer mirror."""
    handle = MockHandle()
    monkeypatch.setattr(live, "_launch_viewer", _mock_launcher(handle))
    res = live.live_run("cartpole", n_steps=3, use_kernel=False,
                        realtime=False,
                        mppi_override={"n_samples": 8, "horizon": 5})
    assert res.steps == 3
    assert handle.syncs == 3      # chunk=1: one sync per executed step
    assert handle.closed
    assert np.isfinite(np.asarray(res.final_qpos)).all()


def test_live_run_headless_raises(monkeypatch):
    """No display -> the documented RuntimeError, not a hang."""
    def boom(asset_path):
        raise RuntimeError("cannot open a viewer window (mock headless)")
    monkeypatch.setattr(live, "_launch_viewer", boom)
    with pytest.raises(RuntimeError, match="viewer window"):
        live.live_run("cartpole", n_steps=1, use_kernel=False)


class MockRenderer:
    """Stands in for mujoco.Renderer on GL-less hosts."""

    def __init__(self, m, height=64, width=64):
        self.h, self.w = height, width
        self.frame = np.zeros((height, width, 3), np.uint8)

    def update_scene(self, d):
        # encode qpos[0] into the frame so the video depends on the states
        self.frame[:] = np.uint8(min(255, abs(d.qpos[0]) * 255))

    def render(self):
        return self.frame


def test_render_video_mock_gl(monkeypatch, tmp_path):
    """Full render_video loop (scene update per row + imageio encode)."""
    monkeypatch.setattr(mujoco, "Renderer", MockRenderer)
    states = np.zeros((5, 4))
    states[:, 0] = np.linspace(0, 0.9, 5)
    out = replay.render_video(CARTPOLE, states,
                              str(tmp_path / "clip.gif"), fps=10)
    assert out is not None and os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_render_video_headless_returns_none(monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("no GL")
    monkeypatch.setattr(mujoco, "Renderer", boom)
    assert replay.render_video(CARTPOLE, np.zeros((2, 4)), "/tmp/x.mp4") is None


def _gl_available():
    try:
        m = mujoco.MjModel.from_xml_string(
            "<mujoco><worldbody><geom type='sphere' size='0.1'/>"
            "</worldbody></mujoco>")
        mujoco.Renderer(m, height=32, width=32)
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _gl_available(), reason="no GL backend on this host")
def test_render_video_real_gl(tmp_path):
    states = np.zeros((3, 4))
    out = replay.render_video(CARTPOLE, states, str(tmp_path / "clip.mp4"),
                              fps=10, width=64, height=48)
    assert out is not None and os.path.getsize(out) > 0
