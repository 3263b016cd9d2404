#!/usr/bin/env python
"""Noise-robust paired A/B benchmark protocol (VERDICT r4 #2).

The shared host carries 2-5× timing noise and the TPU's effective rate
moves with tenant load on a timescale of minutes — adjacent identical
runs have swung 72→135 fps (docs/PERFORMANCE.md round 4), so single
before/after comparisons cannot settle small deltas and "revisit on
quiet hardware" never terminates.  This runner extracts a decision from
exactly that noise:

* runs config A and config B INTERLEAVED in pairs (order alternates
  A,B / B,A per pair so slow drift cancels instead of biasing one arm),
* each run is a fresh ``bench.py`` subprocess (short reps — the pair is
  the replication unit, not the in-process best-of-N),
* reports the per-pair ratio list, their median, and a two-sided sign
  test on sign(ratio−1): tenant noise is strongly time-correlated
  WITHIN a pair (seconds apart) and uncorrelated across pairs
  (minutes apart), so pair signs are the honest iid-ish unit.

Configs differ by env (e.g. ``--b-env AVD_FLOW_BF16=1``) and/or by
checkout (``--b-cwd /tmp/r3`` — a ``git worktree`` of an older tag), so
the same protocol settles both "is HEAD slower than round 3?" and
"does this flag pay at 4K?".

Usage:
    python tools/paired_ab.py --pairs 6 \
        --b-env AVD_FLOW_BF16=1 --env AVD_BENCH_RES=4k
    python tools/paired_ab.py --pairs 6 --b-cwd /tmp/r3_worktree \
        --a-label head --b-label r3

One JSON line on stdout (plus a human table on stderr).
"""

import argparse
import json
import math
import os
import statistics
import subprocess
import sys


def _parse_env(items):
    out = {}
    for it in items or []:
        for kv in it.split(","):
            if not kv.strip():
                continue
            k, _, v = kv.partition("=")
            out[k.strip()] = v.strip()
    return out


def run_bench(cwd: str, env_over: dict, reps: int, timeout: int) -> dict:
    env = dict(os.environ)
    env["AVD_BENCH_REPS"] = str(reps)
    # the paired protocol replicates ACROSS subprocesses; skip the
    # device-resident side-measure per run (it costs chip seconds and
    # is invariant to most A/B knobs — ask bench.py for it separately)
    env.setdefault("AVD_BENCH_DEVICE_STAGE", "0")
    env.update(env_over)
    proc = subprocess.run([sys.executable, "bench.py"], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py failed in {cwd}: "
                           f"{proc.stderr[-2000:]}")
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()][-1]
    return json.loads(line)


def sign_test_p(ratios) -> float:
    """Two-sided exact binomial sign test on sign(ratio − 1), ties
    dropped."""
    wins = sum(1 for r in ratios if r > 1.0)
    losses = sum(1 for r in ratios if r < 1.0)
    n = wins + losses
    if n == 0:
        return 1.0
    k = min(wins, losses)
    p = sum(math.comb(n, i) for i in range(k + 1)) / 2.0 ** n
    return min(1.0, 2.0 * p)


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Interleaved paired A/B benchmark with a sign test")
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--reps", type=int, default=2,
                    help="in-process bench.py reps per run (pairs are "
                         "the replication unit)")
    ap.add_argument("--env", action="append", default=[],
                    help="common env K=V[,K=V] for both arms "
                         "(e.g. AVD_BENCH_RES=4k)")
    ap.add_argument("--a-env", action="append", default=[])
    ap.add_argument("--b-env", action="append", default=[])
    ap.add_argument("--a-cwd", default=".")
    ap.add_argument("--b-cwd", default=".")
    ap.add_argument("--a-label", default="A")
    ap.add_argument("--b-label", default="B")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-run timeout (first runs pay program loads)")
    args = ap.parse_args()

    common = _parse_env(args.env)
    a_env = {**common, **_parse_env(args.a_env)}
    b_env = {**common, **_parse_env(args.b_env)}

    # warm both arms once, unrecorded (first run per process per checkout
    # pays the remote program load — minutes on a cold cache)
    print("warming both arms (unrecorded)...", file=sys.stderr, flush=True)
    run_bench(args.a_cwd, a_env, 1, args.timeout)
    run_bench(args.b_cwd, b_env, 1, args.timeout)

    pairs = []
    for i in range(args.pairs):
        order = ("a", "b") if i % 2 == 0 else ("b", "a")
        vals = {}
        for arm in order:
            cwd, env = (args.a_cwd, a_env) if arm == "a" \
                else (args.b_cwd, b_env)
            vals[arm] = run_bench(cwd, env, args.reps, args.timeout)
        ratio = vals["a"]["value"] / vals["b"]["value"]
        pairs.append({"a": vals["a"]["value"], "b": vals["b"]["value"],
                      "ratio": round(ratio, 4), "order": "".join(order)})
        print(f"pair {i + 1}/{args.pairs} [{pairs[-1]['order']}]: "
              f"{args.a_label}={vals['a']['value']:.1f} "
              f"{args.b_label}={vals['b']['value']:.1f} "
              f"ratio={ratio:.3f}", file=sys.stderr, flush=True)

    ratios = [p["ratio"] for p in pairs]
    med = statistics.median(ratios)
    p = sign_test_p(ratios)
    if p < 0.05:
        verdict = (f"{args.a_label} FASTER" if med > 1
                   else f"{args.b_label} FASTER")
    else:
        verdict = "NO SIGNIFICANT DIFFERENCE"
    out = {
        "protocol": "interleaved_paired_ab",
        "a": {"label": args.a_label, "cwd": args.a_cwd, "env": a_env},
        "b": {"label": args.b_label, "cwd": args.b_cwd, "env": b_env},
        "pairs": pairs,
        "median_ratio_a_over_b": round(med, 4),
        "ratio_range": [round(min(ratios), 4), round(max(ratios), 4)],
        "sign_test_p": round(p, 5),
        "verdict": verdict,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
