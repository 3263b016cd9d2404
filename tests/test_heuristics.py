"""Heuristics hints parity: differential against the reference module."""

import importlib.util
import os

import numpy as np
import pytest

from avd_tpu.analyzers import heuristics_v2
from tests.conftest import REFERENCE_DIR, reference_available


def _load_reference():
    spec = importlib.util.spec_from_file_location(
        "_ref_hx",
        os.path.join(REFERENCE_DIR, "app/analyzers/heuristics_v2.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_differential_vs_reference():
    ref = _load_reference()
    rng = np.random.default_rng(1)
    for _ in range(200):
        meta = {
            "width": int(rng.choice([0, 320, 1280, 1920, 3840])),
            "height": int(rng.choice([0, 240, 720, 1080, 2160])),
            "fps": float(rng.choice([0.0, 23.976, 25.0, 30.0, 60.0])),
            "bit_rate": int(rng.integers(0, 50_000_000)),
        }
        assert heuristics_v2.compute_hints(meta, "x") == \
            ref.compute_hints(meta, "x")


def test_dup_avg_stays_dead():
    """dup_avg is hard-coded 0.0 in the reference snapshot
    (heuristics_v2.py:18) — preserved, so fusion's dup penalty never fires."""
    hints = heuristics_v2.compute_hints(
        {"width": 1920, "height": 1080, "fps": 30.0,
         "bit_rate": 4_000_000}, "p")
    assert hints["dup_avg"] == 0.0


def test_compression_buckets():
    assert heuristics_v2.classify_compression(0.04) == "very_heavy"
    assert heuristics_v2.classify_compression(0.0401) == "heavy"
    assert heuristics_v2.classify_compression(0.08) == "heavy"
    assert heuristics_v2.classify_compression(0.15) == "normal"
    assert heuristics_v2.classify_compression(0.151) == "light"
