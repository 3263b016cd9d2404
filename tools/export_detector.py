"""Export a detector checkpoint to a self-contained AOT serving artifact.

    python tools/export_detector.py --out /path/artifact \
        [--arch vit|cnn|temporal] [--preset NAME] [--ckpt DIR|auto|none] \
        [--batch 64] [--window 32] [--platforms cpu,tpu]

Writes ``program.jaxexport`` (serialized StableHLO with weights and
calibration embedded) plus ``manifest.json`` to --out; serve it with
``AVD_DETECTOR_EXPORTED=<out> AVD_DETECTOR=1`` (models/export.py).
Runs fine on a CPU-only host — artifacts are multi-platform.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--arch", default="vit",
                    choices=("vit", "cnn", "temporal"))
    ap.add_argument("--preset", default=None,
                    help="family preset (default: serving default)")
    ap.add_argument("--ckpt", default="auto",
                    help="checkpoint dir, 'auto' (shipped default), or "
                         "'none' for random init")
    ap.add_argument("--batch", type=int, default=64,
                    help="lowered batch shape (per-frame families)")
    ap.add_argument("--window", type=int, default=32,
                    help="lowered scoring window (temporal family)")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    args = ap.parse_args()

    from avd_tpu.models import export as export_mod

    ckpt = None if args.ckpt == "none" else args.ckpt
    manifest = export_mod.export_detector(
        args.out, arch=args.arch, preset=args.preset, ckpt=ckpt,
        batch=args.batch, window=args.window,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p))
    print(json.dumps(manifest, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
