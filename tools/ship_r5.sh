#!/bin/bash
# Round-5 checkpoint shipping (VERDICT r4 #1, second half).
#
# For each retrained seed-0 checkpoint under $R5_DIR (tools/retrain_r5.sh):
#   1. full eval (per-family acc/AUC incl. unseen `texture`, H.264 CRF
#      sweep, JPEG sweep, ECE) with --write-calibration, eval tables
#      saved to docs/studies/r5_eval_<name>.md;
#   2. copy the orbax tree + train_meta.json + calibration.json into
#      avd_tpu/models/weights/<shipped-name> (the .train optimizer
#      sidecar is NOT shipped — weights only, same as rounds 3-4);
# then quick unseen-only evals of flagship seeds 1-2 for the 3-seed
# grid (docs/studies/r5_flagship_seeds.md).
#
# Run AFTER the retrain grid completes and with the TPU otherwise idle.
# Floors: python -m pytest tests/test_train.py -q -k shipped (CPU mesh).
set -euo pipefail
cd "$(dirname "$0")/.."
R5=${R5_DIR:-/tmp/r5}
W=avd_tpu/models/weights
mkdir -p docs/studies

ship() { # ship <grid-name> <arch> <preset> <shipped-name> [extra eval args]
  local name=$1 arch=$2 preset=$3 dest=$4; shift 4
  echo "=== $(date -u +%H:%M:%S) eval $name ($arch/$preset)"
  python tools/eval_detector.py --arch "$arch" --preset "$preset" \
      --ckpt "$R5/$name" --write-calibration "$@" \
      | tee "docs/studies/r5_eval_${name}.md"
  rm -rf "$W/$dest"
  cp -r "$R5/$name" "$W/$dest"
  echo "shipped $R5/$name -> $W/$dest"
}

ship flagship224_s0 vit full detector_full
ship small_s0 vit small detector_small
ship cnn_s0 cnn small cnn_small
ship moe_s0 vit moe_small moe_small
ship temporal_s0 temporal small temporal_small

# 3-seed flagship grid (VERDICT r4 #1: "at shipped scale, not proxy")
for s in 1 2; do
  echo "=== $(date -u +%H:%M:%S) eval flagship seed $s"
  python tools/eval_detector.py --arch vit --preset full \
      --ckpt "$R5/flagship224_s$s" --n 256 \
      | tee "docs/studies/r5_eval_flagship224_s$s.md"
done

echo "=== ship complete; now run: python -m pytest tests/test_train.py -q"
