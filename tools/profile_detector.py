#!/usr/bin/env python
"""Per-op time table for the flagship detector serving step (VERDICT r4 #3).

Round 4 asserted "26.2% MFU because patch-embed/head/LN/GELU are
bandwidth-bound" without profiler evidence.  This tool captures a
`jax.profiler.trace` of the exact serving program (vit-224, batch 64,
bf16 — the bench_detector.py configuration), parses the perfetto trace
JSON, and prints a per-op table (fusion names aggregated into
attention / MLP / LN / patch-embed / head / other buckets plus the raw
top-k), so the MFU ceiling claim is grounded in measured device time.

Usage: python tools/profile_detector.py [arch] [--batch 64] [--chain 16]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = (
    # (bucket, regexes over the scope-qualified op name — the forward
    # pass carries jax.named_scope annotations (models/detector.py
    # block_forward_aux: attn_ln/attn_qkv/attn_core/attn_proj/mlp_ln/
    # mlp/moe_mlp, plus patch_embed/head), which XLA propagates into
    # the trace metadata, so classification keys on intent, not on
    # guessing what a fusion contains)
    ("attn_core", (r"attn_core",)),
    ("attn_qkv/proj", (r"attn_qkv|attn_proj",)),
    ("layernorm", (r"attn_ln|mlp_ln|norm|rsqrt|variance",)),
    ("mlp", (r"\bmlp\b|mlp/|moe_mlp",)),
    ("patch_embed", (r"patch_embed|conv",)),
    ("head", (r"\bhead\b|head/",)),
    ("copy/transpose", (r"copy|transpose|bitcast",)),
    ("other-dot", (r"dot_general|dot\b",)),
    ("elementwise", (r"add|mul|sub|div|tanh|exp|gelu|erf|select|fusion",)),
)


def classify(name: str) -> str:
    low = name.lower()
    for bucket, pats in BUCKETS:
        for p in pats:
            if re.search(p, low):
                return bucket
    return "other"


def capture(arch: str, batch: int, chain: int, logdir: str) -> float:
    import time

    import jax
    import jax.numpy as jnp

    from avd_tpu import models
    from avd_tpu.utils import jaxtools
    jaxtools.setup()

    fam = models.family(arch)
    cfg = fam.make_config("full")
    params = fam.init_params(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda p, x: jax.nn.sigmoid(
        fam.forward(p, x, cfg)[:, 0].astype(jnp.float32)))
    x = jnp.asarray(np.random.default_rng(0).random(
        (batch, cfg.image_size, cfg.image_size, 3), np.float32))
    float(np.asarray(fwd(params, x))[0])  # compile + warm

    t = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(chain):
            out = fwd(params, x)
        float(np.asarray(out)[0])
    return (time.perf_counter() - t) / chain


def parse_trace(logdir: str) -> dict:
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace json under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-side events live on TPU pid/tid tracks; keep complete
    # events with a duration and an HLO-ish name
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        # prefer the scope-qualified metadata name (tf_op / long_name
        # carry the jax.named_scope path, e.g. "attn_core/dot_general");
        # the bare event name is often an opaque "fusion.123"
        args = e.get("args") or {}
        name = args.get("tf_op") or args.get("long_name") or e["name"]
        per_op[name] += float(e["dur"])  # µs
    return dict(per_op)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("arch", nargs="?", default="vit")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/avd_prof_detector")
    args = ap.parse_args()

    step_s = capture(args.arch, args.batch, args.chain, args.logdir)
    per_op = parse_trace(args.logdir)
    total = sum(per_op.values())
    print(f"\n{args.arch}-224 batch {args.batch}: {step_s * 1e3:.2f} ms/step "
          f"wall; {total / args.chain / 1e3:.2f} ms/step device time "
          f"({len(per_op)} distinct ops)\n")
    buckets = defaultdict(float)
    for name, dur in per_op.items():
        buckets[classify(name)] += dur
    print("bucket                      device-ms/step    share")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{b:28s} {d / args.chain / 1e3:10.3f}    {d / total:6.1%}")
    print("\ntop ops:")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {dur / args.chain / 1e3:8.3f} ms  {dur / total:6.1%}  "
              f"{name[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
