#!/usr/bin/env python
"""One-command resolution/content benchmark matrix (VERDICT r4 #8).

Runs ``bench.py`` once per (resolution, content) cell — each a fresh
subprocess so programs load cleanly — and prints a merged JSON document
plus a human table.  Every cell carries bench.py's per-rep list, median,
and spread, so the recorded matrix is one session's data with noise
bars instead of a mix of bands remembered from different rounds.

Cells (BASELINE.json configs #1/#2/#3):
    1080p × {pan, static, noise},  4k × {pan, noise},  latency p50.

Usage:
    python tools/bench_matrix.py [--reps 5] [--skip-latency] [--out F]

Keep the host idle while this runs — one shared vCPU; concurrent host
work contaminates the CPU-oracle denominator (CLAUDE.md).
"""

import argparse
import json
import os
import subprocess
import sys

CELLS = (
    ("1080p", "pan"),
    ("1080p", "static"),
    ("1080p", "noise"),
    ("4k", "pan"),
    ("4k", "noise"),
)


def run_cell(res: str, content: str, reps: int, timeout: int) -> dict:
    env = dict(os.environ)
    env.update({"AVD_BENCH_RES": res, "AVD_BENCH_CONTENT": content,
                "AVD_BENCH_REPS": str(reps)})
    proc = subprocess.run([sys.executable, "bench.py"], env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py {res}/{content} failed: "
                           f"{proc.stderr[-2000:]}")
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()][-1]
    return json.loads(line)


def run_latency(timeout: int) -> dict:
    env = dict(os.environ, AVD_BENCH_MODE="latency")
    proc = subprocess.run([sys.executable, "bench.py"], env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"latency bench failed: {proc.stderr[-2000:]}")
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-latency", action="store_true")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-cell subprocess timeout (s); first cold "
                         "cell can pay the remote program load")
    ap.add_argument("--out", help="also write the JSON document here")
    args = ap.parse_args()

    doc = {"cells": []}
    for res, content in CELLS:
        cell = run_cell(res, content, args.reps, args.timeout)
        cell["res"], cell["content"] = res, content
        doc["cells"].append(cell)
        print(f"  {res:6s} {content:7s} best {cell['value']:7.1f} "
              f"median {cell['tpu_fps_median']:7.1f} "
              f"spread {cell['tpu_fps_spread']:6.1f} "
              f"device {cell.get('device_stage_fps', 0):7.1f} "
              f"vs_cpu {cell['vs_baseline']:5.1f}x", file=sys.stderr)
    if not args.skip_latency:
        lat = run_latency(args.timeout)
        doc["latency"] = lat
        print(f"  latency p50 {lat['value']} s", file=sys.stderr)
    print(json.dumps(doc))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
