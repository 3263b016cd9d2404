"""CPU oracle: reference-faithful numpy/OpenCV implementations.

These mirror the reference's per-frame/per-window formulas
(/root/reference/app/analyzers/video.py, audio.py) exactly, operating on the
same ingested arrays as the TPU path.  They serve two purposes:

* golden parity suite — TPU results must satisfy |Δai_score| ≤ 1e-3 against
  this oracle (BASELINE.json north star);
* measured CPU baseline for the ≥10× frames/sec target (the reference
  publishes no numbers, BASELINE.md).
"""

from avd_tpu.oracle import audio_ref, video_ref  # noqa: F401
