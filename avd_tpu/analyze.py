"""CLI entry point: ``python -m avd_tpu.analyze clip.mp4`` → response JSON.

The PR1 end-to-end slice from SURVEY.md §7: ingest → jitted kernels →
fusion → the reference's full JSON schema on stdout.

Batch mode (beyond-reference, for offline fleets): pass several paths
and/or directories plus ``--jsonl`` to stream one envelope per line —
the device programs compile once and every clip reuses them, so batch
throughput matches the serving path's steady state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from avd_tpu import pipeline

_VIDEO_EXTS = (".mp4", ".mov", ".mkv", ".avi", ".webm", ".m4v", ".wav")


def _expand(paths):
    """Yield analyzable files: given paths verbatim, directories scanned
    one level for known media extensions (sorted, deterministic)."""
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                full = os.path.join(p, name)
                if os.path.isfile(full) and \
                        name.lower().endswith(_VIDEO_EXTS):
                    yield full
        else:
            yield p


def emit_jsonl(pairs, out=None) -> int:
    """Write one ``{"path", "response"|"error"}`` JSON object per line
    for an iterable of ``(path, response_dict | Exception)`` and return
    the failure count — the batch-mode contract shared by
    ``avd-analyze --jsonl`` and ``avd-client analyze --jsonl``."""
    out = out or sys.stdout
    failed = 0
    for path, res in pairs:
        if isinstance(res, BaseException):
            failed += 1
            line = {"path": path,
                    "error": f"{res.__class__.__name__}: {res}"}
        else:
            line = {"path": path, "response": res}
        json.dump(line, out)
        out.write("\n")
        out.flush()
    return failed


def _warm(log) -> None:
    """Load the device programs BEFORE the timed analyzers: the first
    execution per process pays the remote program load (minutes on a
    cold remote compile cache) even on a persistent-cache hit, which
    would otherwise burn the analyzer timeout into a silent neutral
    result."""
    try:
        import jax
        if jax.devices()[0].platform in ("tpu", "axon"):
            from avd_tpu.ops import video_features
            video_features.warm_device(log=log)
    except Exception:
        pass  # warm-up is best-effort; analysis proceeds regardless


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="TPU-native AI-video analysis (reference-compatible JSON)")
    ap.add_argument("paths", nargs="+", metavar="path",
                    help="video/audio files (or directories) to analyze")
    ap.add_argument("--backend", choices=["jax", "oracle"], default=None,
                    help="compute backend override (env AVD_BACKEND)")
    ap.add_argument("--indent", type=int, default=None,
                    help="pretty-print the single-input envelope "
                         "(incompatible with --jsonl, which is always "
                         "compact one-object-per-line)")
    ap.add_argument("--jsonl", action="store_true",
                    help="batch mode: one {\"path\", \"response\"} JSON "
                         "object per line; analysis errors become "
                         "{\"path\", \"error\"} lines instead of aborting")
    args = ap.parse_args(argv)

    if args.backend:
        os.environ["AVD_BACKEND"] = args.backend

    files = list(_expand(args.paths))
    if not files:
        print("no analyzable files found", file=sys.stderr)
        return 2
    if len(files) > 1 and not args.jsonl:
        ap.error("multiple inputs need --jsonl")
    if args.jsonl and args.indent is not None:
        ap.error("--indent does not apply to --jsonl "
                 "(output is compact one-object-per-line)")

    if os.getenv("AVD_BACKEND", "jax") == "jax":
        _warm(lambda m: print(m, file=sys.stderr, flush=True))

    if not args.jsonl:
        result = pipeline.analyze_path(files[0])
        json.dump(result, sys.stdout, indent=args.indent)
        sys.stdout.write("\n")
        return 0

    def pairs():
        for path in files:
            try:
                yield path, pipeline.analyze_path(path)
            except Exception as e:  # batch keeps going; record it
                yield path, e

    return 0 if emit_jsonl(pairs()) == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
