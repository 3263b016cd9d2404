"""Robustness across awkward real-world inputs: odd resolutions, portrait
orientation, low/odd frame rates (step=1 boundary), very short clips —
each checked for parity against the cv2 oracle."""

import numpy as np
import pytest

from avd_tpu.ingest import probe, video_reader
from avd_tpu.oracle import video_ref
from avd_tpu.ops import video_features
from tests import fixtures


def _mk(tmp_path, name, n, h, w, fps):
    rng = np.random.default_rng(hash(name) % 2**32)
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.int64) \
        .astype(np.uint8)
    return fixtures.write_video(tmp_path / f"{name}.mp4", frames, fps=fps)


@pytest.mark.parametrize("h,w,fps,n", [
    (101, 77, 30.0, 40),    # odd dimensions
    (128, 72, 24.0, 30),    # 24 fps → step 12
    (96, 160, 30.0, 45),    # landscape
    (160, 96, 30.0, 45),    # portrait
])
def test_parity_odd_shapes(tmp_path, h, w, fps, n):
    path = _mk(tmp_path, f"odd{h}x{w}", n, h, w, fps)
    meta = probe.probe_basic_meta(path)
    fb = video_reader.read_sampled(path, meta)
    assert fb is not None and fb.sampled > 0

    ours = video_features.analyze_frames(fb.frames, fb.width, fb.height,
                                         fb.fps, fb.duration)
    ref = video_ref.analyze_frames(fb.frames, fb.width, fb.height,
                                   fb.fps, fb.duration)
    assert ours["summary"]["dup_density"] == ref["summary"]["dup_density"]
    assert abs(ours["summary"]["texture_var"]
               - ref["summary"]["texture_var"]) <= \
        1e-3 * max(1.0, ref["summary"]["texture_var"])
    np.testing.assert_allclose(ours["timeline"], ref["timeline"], atol=0.03)


def test_step_one_low_fps(tmp_path):
    """fps=2 → step=1: every frame sampled, maximal pair count."""
    path = _mk(tmp_path, "lowfps", 10, 64, 64, 2.0)
    meta = probe.probe_basic_meta(path)
    assert video_reader.sampling_step(meta["fps"]) == 1
    fb = video_reader.read_sampled(path, meta)
    assert fb.sampled == 10
    ours = video_features.analyze_frames(fb.frames, 64, 64, 2.0,
                                         fb.duration)
    ref = video_ref.analyze_frames(fb.frames, 64, 64, 2.0, fb.duration)
    assert ours["summary"]["dup_density"] == ref["summary"]["dup_density"]
    assert len(ours["timeline"]) == len(ref["timeline"])


@pytest.mark.parametrize("n", [1, 2, 3])
def test_tiny_clips(tmp_path, n):
    path = _mk(tmp_path, f"tiny{n}", n, 64, 64, 30.0)
    meta = probe.probe_basic_meta(path)
    fb = video_reader.read_sampled(path, meta)
    ours = video_features.analyze_frames(fb.frames, 64, 64, 30.0,
                                         fb.duration)
    ref = video_ref.analyze_frames(fb.frames, 64, 64, 30.0, fb.duration)
    assert len(ours["timeline"]) == len(ref["timeline"])
    np.testing.assert_allclose(ours["timeline"], ref["timeline"], atol=0.03)
