"""CLI entry point: ``python -m avd_tpu.analyze clip.mp4`` → response JSON.

The PR1 end-to-end slice from SURVEY.md §7: ingest → jitted kernels →
fusion → the reference's full JSON schema on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from avd_tpu import pipeline


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="TPU-native AI-video analysis (reference-compatible JSON)")
    ap.add_argument("path", help="video/audio file to analyze")
    ap.add_argument("--backend", choices=["jax", "oracle"], default=None,
                    help="compute backend override (env AVD_BACKEND)")
    ap.add_argument("--indent", type=int, default=None)
    args = ap.parse_args(argv)

    import os
    if args.backend:
        os.environ["AVD_BACKEND"] = args.backend

    if os.getenv("AVD_BACKEND", "jax") == "jax":
        # Load the device programs BEFORE the timed analyzers: the first
        # execution per process pays the remote program load (minutes on
        # a cold remote compile cache) even on a persistent-cache hit,
        # which would otherwise burn the analyzer timeout into a silent
        # neutral result.
        try:
            import jax
            if jax.devices()[0].platform in ("tpu", "axon"):
                from avd_tpu.ops import video_features
                video_features.warm_device(
                    log=lambda m: print(m, file=sys.stderr, flush=True))
        except Exception:
            pass  # warm-up is best-effort; analysis proceeds regardless

    result = pipeline.analyze_path(args.path)
    json.dump(result, sys.stdout, indent=args.indent)
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
