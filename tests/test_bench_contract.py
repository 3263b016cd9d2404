"""bench.py driver contract: one JSON line with the required fields."""

import json
import os
import subprocess
import sys

import pytest


def test_bench_emits_single_json_line():
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "AVD_BENCH_FRAMES": "4",
        "AVD_BENCH_CPU_FRAMES": "2",
        "AVD_BENCH_REPS": "1",
        "AVD_VIDEO_CHUNK": "4",
    })
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    out = json.loads(lines[0])
    # required driver fields; extras (cpu_fps — absolute CPU baseline,
    # VERDICT r1 item 9) are allowed
    assert {"metric", "value", "unit", "vs_baseline"} <= set(out.keys())
    assert out["value"] > 0
    assert out["unit"] == "frames/sec/chip"
