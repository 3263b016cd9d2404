#!/bin/bash
# Round-5 checkpoint retrain grid (VERDICT r4 #1).
#
# The pass-6 cross-seed study (docs/studies/threshold_p6_confirm.json)
# proved the shipped constant-LR recipe lands in an inverted-transfer
# basin on some seeds (seed-2 unseen AUC 0.40, below chance) while
# cosine(warmup 300) never collapses.  This script retrains ALL FIVE
# shipped checkpoints with the collapse-proof schedule — identical to
# the round-4 recipes otherwise — plus a 3-seed grid at FLAGSHIP scale
# (not the detector_small proxy the study used).
#
# Runs serialize on the single TPU chip; each run is skipped if its
# .done marker exists, so the script is resumable after interruption.
# Outputs land under $R5_DIR (default /tmp/r5); shipping into
# avd_tpu/models/weights/ happens manually after the eval floors pass
# (tools/eval_detector.py + tests/test_train.py transfer floors).
set -euo pipefail
cd "$(dirname "$0")/.."
R5=${R5_DIR:-/tmp/r5}
mkdir -p "$R5"

# the round-4 recipe (BASELINE.md round 4) + the pass-6 schedule fix
COMMON="--families blobs,geometric,cellular --aug-codec 0.5 \
  --logit-l2 2e-2 --batch 64 --schedule cosine --warmup 300"

run() { # run <name> <train.py args...>
  local name=$1; shift
  if [ -f "$R5/.done_$name" ]; then echo "skip $name (done)"; return; fi
  echo "=== $(date -u +%H:%M:%S) train $name"
  # shellcheck disable=SC2086
  python -m avd_tpu.models.train --out "$R5/$name" $COMMON "$@"
  touch "$R5/.done_$name"
}

# flagship two-stage recipe (BASELINE.md round 3 "flagship", round-4
# retrain flags): 128px pretrain -> pos-emb-interpolated 224px finetune.
# Seed 0 (the shippable candidate) runs FIRST, then the four other
# families, then seeds 1-2 close the flagship-scale 3-seed grid.
flagship() { # flagship <seed>
  run "flagship128_s$1" --image-size 128 --width 384 --depth 6 --heads 6 \
      --scan --remat --steps 3000 --lr 3e-4 --seed "$1"
  run "flagship224_s$1" --image-size 224 --width 384 --depth 6 --heads 6 \
      --scan --remat --steps 2500 --lr 1e-4 --seed "$1" \
      --init-from "$R5/flagship128_s$1"
}

flagship 0

run small_s0 --image-size 64 --steps 6000 --lr 3e-4 --seed 0
run cnn_s0 --arch cnn --image-size 64 --steps 6000 --lr 3e-4 --seed 0
run moe_s0 --image-size 64 --steps 6000 --lr 3e-4 --seed 0 --experts 4

# temporal: T=4->32 curriculum phases via --resume (round-4 recipe);
# sinusoidal time encoding keeps params T-independent, and --resume
# runs to the TOTAL step count, so the final meta records steps=10000.
# --schedule-horizon 10000 pins ONE global cosine across all four
# phases — without it each phase would rebuild the schedule with its
# own horizon and the LR would sawtooth at every curriculum boundary.
if [ ! -f "$R5/.done_temporal_s0" ]; then
  echo "=== $(date -u +%H:%M:%S) train temporal_s0 (phases T=4/8/16/32)"
  python -m avd_tpu.models.train --out "$R5/temporal_s0" $COMMON \
      --arch temporal --image-size 64 --steps 2500 --lr 3e-4 --seed 0 \
      --seq-len 4 --schedule-horizon 10000
  for ph in "8 5000" "16 7500" "32 10000"; do
    set -- $ph
    python -m avd_tpu.models.train --out "$R5/temporal_s0" $COMMON \
        --arch temporal --image-size 64 --steps "$2" --lr 3e-4 --seed 0 \
        --seq-len "$1" --resume --schedule-horizon 10000
  done
  touch "$R5/.done_temporal_s0"
fi

flagship 1
flagship 2

echo "=== retrain grid complete: $(ls "$R5")"
