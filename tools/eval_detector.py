"""Detector generalization / robustness / calibration eval.

Produces the BASELINE.md table for each shipped checkpoint:

* per-generator-family held-out accuracy + AUC — including the family
  the checkpoint was NOT trained on (``texture``, models/train.py's
  HELDOUT_FAMILY), i.e. transfer to an unseen procedural generator;
* a JPEG-quality robustness sweep (q in 95/75/50/30).  H.264 CRF is the
  natural sweep for video, but this image ships no encoder (no ffmpeg,
  cv2 built without codecs — BASELINE.md environment constraints), so
  JPEG quantization stands in as the closest available compression
  artifact model (same DCT-quantization family as intra-coded H.264);
* ECE (expected calibration error, 15 equal-width bins over the
  predicted AI probability: sum_b |mean p_b - frac positives_b| * n_b/N).

Usage:
  python tools/eval_detector.py [--arch vit|cnn|temporal]
      [--preset small|full|moe_small] [--ckpt DIR] [--n 512] [--cpu]

The reference has no trained model (its detector slot is a closed-form
heuristic, app/analyzers/video.py:54-57); this tool evaluates the
north-star slot our framework adds.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ece(p: np.ndarray, y: np.ndarray, bins: int = 15) -> float:
    """Binary reliability ECE over the predicted P(ai)."""
    edges = np.linspace(0.0, 1.0, bins + 1)
    total = len(p)
    ece = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (p >= lo) & (p < hi) if hi < 1.0 else (p >= lo) & (p <= hi)
        if not m.any():
            continue
        ece += abs(float(p[m].mean()) - float((y[m] == 1).mean())) \
            * (m.sum() / total)
    return ece


def _jpeg_roundtrip(frames: np.ndarray, quality: int) -> np.ndarray:
    """[N,H,W,3] f32 RGB in [0,1] → same, through a JPEG encode/decode."""
    import cv2
    out = np.empty_like(frames)
    for i, f in enumerate(frames):
        bgr = (np.clip(f[..., ::-1], 0, 1) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", bgr,
                               [cv2.IMWRITE_JPEG_QUALITY, quality])
        assert ok
        dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        out[i] = dec[..., ::-1].astype(np.float32) / 255.0
    return out


def eval_checkpoint(arch: str = "vit", preset: str = "small",
                    ckpt: str | None = None, n: int = 512,
                    batch: int = 64, seed: int = 999,
                    jpeg_qualities=(95, 75, 50, 30)):
    """Returns {family: (acc, auc, ece)}, {quality: (acc, auc)} for the
    given checkpoint (default: the shipped one for (arch, preset))."""
    import jax
    import jax.numpy as jnp

    from avd_tpu import models
    from avd_tpu.models import scoring, temporal
    from avd_tpu.models.train import (GENERATOR_FAMILIES, _acc_auc,
                                      synthetic_batch)

    fam_mod = models.family(arch)
    cfg = fam_mod.make_config(preset)
    params = fam_mod.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = ckpt or scoring._shipped_ckpt(arch, preset)
    if ckpt:
        params = fam_mod.load_checkpoint(ckpt, params)
    label = ckpt or "random_init"

    if arch == "temporal":
        @jax.jit
        def probs_fn(p, fb):
            return jax.nn.sigmoid(temporal.forward(
                p, fb, cfg)[..., 0].astype(jnp.float32))

        def run(families):
            rng = np.random.default_rng(seed)
            ps, ys = [], []
            for _ in range(max(1, n // (batch * 8))):
                frames, labels = temporal.synthetic_sequences(
                    rng, batch // 4, 8, cfg.image_size,
                    families=families)
                ps.append(np.asarray(probs_fn(
                    params, jnp.asarray(frames))).ravel())
                ys.append(labels.ravel())
            return np.concatenate(ps), np.concatenate(ys)

        per_family = {}
        for fam in GENERATOR_FAMILIES:
            p, y = run((fam,))
            acc, auc = _acc_auc(p, y)
            per_family[fam] = (acc, auc, _ece(p, y))
        return label, per_family, {}  # sequence JPEG sweep omitted

    @jax.jit
    def probs_fn(p, fb):
        return jax.nn.sigmoid(fam_mod.forward(
            p, fb, cfg)[:, 0].astype(jnp.float32))

    def run(families, transform=None):
        rng = np.random.default_rng(seed)
        ps, ys = [], []
        for _ in range(max(1, n // batch)):
            frames, labels = synthetic_batch(rng, batch, cfg.image_size,
                                             families)
            if transform is not None:
                frames = transform(frames)
            ps.append(np.asarray(probs_fn(params, jnp.asarray(frames))))
            ys.append(labels)
        return np.concatenate(ps), np.concatenate(ys)

    per_family = {}
    for fam in GENERATOR_FAMILIES:
        p, y = run((fam,))
        acc, auc = _acc_auc(p, y)
        per_family[fam] = (acc, auc, _ece(p, y))

    sweep = {}
    try:
        import cv2  # noqa: F401
        for q in jpeg_qualities:
            p, y = run(tuple(GENERATOR_FAMILIES),
                       transform=lambda f, q=q: _jpeg_roundtrip(f, q))
            sweep[q] = _acc_auc(p, y)
    except ImportError:
        pass
    return label, per_family, sweep


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--arch", default="vit",
                    choices=("vit", "cnn", "temporal"))
    ap.add_argument("--preset", default="small")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (leave the TPU to another job)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from avd_tpu.models.train import HELDOUT_FAMILY, TRAIN_FAMILIES
    label, fams, sweep = eval_checkpoint(args.arch, args.preset,
                                         args.ckpt, n=args.n,
                                         seed=args.seed)
    print(f"checkpoint: {label}")
    print(f"(training families: {'+'.join(TRAIN_FAMILIES)}; "
          f"unseen: {HELDOUT_FAMILY})")
    print("| family | acc | AUC | ECE |")
    print("|---|---|---|---|")
    for fam, (acc, auc, ece) in fams.items():
        tag = " (unseen)" if fam == HELDOUT_FAMILY else ""
        print(f"| {fam}{tag} | {acc:.3f} | {auc:.3f} | {ece:.3f} |")
    if sweep:
        print("| JPEG q | acc | AUC |")
        print("|---|---|---|")
        for q, (acc, auc) in sweep.items():
            print(f"| {q} | {acc:.3f} | {auc:.3f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
