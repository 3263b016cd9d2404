"""Detector training driver.

``python -m avd_tpu.models.train --steps 200 --out /path/ckpt``

Trains the per-frame ViT on synthetic supervision by default (procedurally
generated "camera-like" vs "generator-like" frames — high-frequency sensor
noise vs over-smooth textures, the same cues the reference's heuristics
key on) so the full train→checkpoint→serve loop is exercisable without a
dataset; point ``--data`` at a directory of ``real/``/``ai/`` frame
folders for actual training.

The step runs under a (data, model) mesh when more than one device is
visible — the same dp×tp shardings validated by __graft_entry__'s
multichip dry run.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _smooth(img: np.ndarray, sigma: float) -> np.ndarray:
    try:
        import cv2
        return cv2.GaussianBlur(img, (0, 0), sigma)
    except Exception:
        k = max(3, int(sigma * 4) | 1)
        kernel = np.ones(k, np.float32) / k
        for ax in (0, 1):
            img = np.apply_along_axis(
                lambda m: np.convolve(m, kernel, mode="same"), ax, img)
        return img


def _frame_blobs(rng: np.random.Generator, size: int, ai_like: bool):
    """Family A — blob scenes; AI cue = Gaussian over-smoothing + mild
    oversaturation; camera cue = crisp detail + Gaussian sensor noise +
    sharpening halo (the original round-1 generator)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.zeros((size, size, 3), np.float32)
    for _ in range(rng.integers(2, 5)):
        cx, cy = rng.random(2)
        r = 0.1 + 0.4 * rng.random()
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / r ** 2))
        base += blob[..., None] * rng.random(3)
    base += (0.3 * xx * rng.random() + 0.3 * yy * rng.random())[..., None]
    base /= max(1e-6, base.max())
    detail = rng.random((size, size, 3)).astype(np.float32)
    if ai_like:
        # generator-like: heavy smoothing, weak detail, mild
        # oversaturation, near-zero sensor noise
        sigma = 1.2 + 2.0 * rng.random()
        img = _smooth(base + 0.10 * detail, sigma)
        img = np.clip(img * (1.05 + 0.15 * rng.random()), 0, 1)
        img += rng.normal(0, 0.004, img.shape).astype(np.float32)
    else:
        # camera-like: crisp detail + per-pixel sensor noise +
        # mild sharpening halo
        img = base + (0.15 + 0.2 * rng.random()) * detail
        img = np.clip(img, 0, 1)
        blur = _smooth(img, 1.0)
        img = np.clip(img + (0.3 * rng.random()) * (img - blur), 0, 1)
        img += rng.normal(0, 0.01 + 0.02 * rng.random(),
                          img.shape).astype(np.float32)
    return img


def _frame_geometric(rng: np.random.Generator, size: int, ai_like: bool):
    """Family B — hard-edged scenes (oriented stripes + rectangles);
    AI cue = BOX-filter smoothing + contrast stretch; camera cue =
    luminance detail + per-row gain jitter (rolling-shutter-like) +
    sensor noise.  Same smooth-vs-noisy concept as family A, different
    scene statistics AND different artifact parameterizations."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.zeros((size, size, 3), np.float32)
    for _ in range(rng.integers(1, 4)):
        a, b = rng.normal(0, 6, 2)
        stripe = 0.5 + 0.5 * np.sin(a * xx + b * yy
                                    + rng.random() * 6.28)
        base += (stripe > rng.random())[..., None] * rng.random(3) * 0.6
    for _ in range(rng.integers(2, 6)):
        x0, y0 = rng.integers(0, size, 2)
        w, h = rng.integers(size // 8, size // 2, 2)
        base[y0:y0 + h, x0:x0 + w] += rng.random(3) * 0.5
    base = np.clip(base / max(1e-6, base.max()), 0, 1)
    if ai_like:
        # box blur (uniform kernel — a different smoothing operator
        # than family A's Gaussian), then a contrast stretch
        k = int(rng.integers(2, 5))
        kern = np.ones(k, np.float32) / k
        img = base
        for ax in (0, 1):
            img = np.apply_along_axis(
                lambda m: np.convolve(m, kern, mode="same"), ax, img)
        lo, hi = 0.05 * rng.random(), 1.0 - 0.05 * rng.random()
        img = np.clip((img - lo) / max(1e-6, hi - lo), 0, 1)
        img += rng.normal(0, 0.003, img.shape).astype(np.float32)
    else:
        detail = rng.random((size, size, 3)).astype(np.float32)
        img = base * (0.8 + 0.2 * detail) + 0.08 * detail
        # per-row gain jitter: CMOS readout banding
        img *= (1.0 + rng.normal(0, 0.02, (size, 1, 1))
                .astype(np.float32))
        img += rng.normal(0, 0.012 + 0.015 * rng.random(),
                          img.shape).astype(np.float32)
    return img


def _frame_texture(rng: np.random.Generator, size: int, ai_like: bool):
    """Family C (HELD OUT of default training) — multi-octave value-noise
    scenes; AI cue = half-resolution nearest-neighbor upsample (GAN
    checkerboard-like grid) + smoothing; camera cue = luminance-scaled
    shot noise (Poisson-like).  Evaluating the shipped checkpoints here
    measures transfer to an unseen generator family."""
    base = np.zeros((size, size, 3), np.float32)
    for octave in (4, 8, 16):
        g = rng.random((octave, octave, 3)).astype(np.float32)
        reps = -(-size // octave)
        up = np.repeat(np.repeat(g, reps, 0), reps, 1)[:size, :size]
        base += _smooth(up, size / (octave * 3)) / octave * 4
    base = np.clip(base / max(1e-6, base.max()), 0, 1)
    if ai_like:
        half = base[::2, ::2]
        img = np.repeat(np.repeat(half, 2, 0), 2, 1)[:size, :size]
        img = _smooth(img, 0.8 + 0.8 * rng.random())
        img = np.clip(img * (1.0 + 0.1 * rng.random()), 0, 1)
        img += rng.normal(0, 0.005, img.shape).astype(np.float32)
    else:
        detail = rng.random((size, size, 3)).astype(np.float32)
        img = np.clip(base + 0.12 * detail, 0, 1)
        # shot noise: sigma grows with sqrt(luminance)
        sigma = (0.008 + 0.02 * rng.random()) * np.sqrt(
            np.clip(img, 1e-3, 1))
        img += (rng.standard_normal(img.shape) * sigma).astype(np.float32)
    return img


def _frame_cellular(rng: np.random.Generator, size: int, ai_like: bool):
    """Family D (round 4) — Voronoi cell scenes: flat irregular regions
    with hard boundaries (nearest-seed coloring + gentle shading).
    AI cue = color POSTERIZATION (the banding common to generator
    decoders) + boundary smoothing; camera cue = luminance detail +
    Gaussian noise + rare hot pixels.  Both cue parameterizations are
    distinct from families A-C (Gaussian/box smoothing, checkerboard
    upsample; sensor/row-gain/shot noise), so a model must learn the
    smooth-vs-noisy META-cue, not one family's artifact signature —
    this is the diversity that attacks the threshold-transfer problem
    (unseen-family scores clustering at the middle, BASELINE.md round 3).

    The first round-4 design gave the camera branch a directional
    MOTION-BLUR streak (realistic camera shake).  Measured
    (tools/threshold_study.py pass 1+2): every 3-family variant's
    unseen-family AUC collapsed to 0.41-0.44 — BELOW chance — even at
    3x steps, while the 2-family control held 0.69.  Blurred camera
    frames teach "smooth = camera", the exact inverse of the meta-cue
    the held-out family (and the deployment prior: generator output is
    over-smooth) rewards, and the inversion transfers.  The streak is
    removed; the family keeps its distinct identity via posterization
    banding vs hot-pixel defects."""
    k = int(rng.integers(4, 10))
    pts = rng.random((k, 2)).astype(np.float32)
    colors = rng.random((k, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    d = ((yy[..., None] - pts[:, 0]) ** 2
         + (xx[..., None] - pts[:, 1]) ** 2)
    base = colors[np.argmin(d, axis=-1)]
    shade = 0.75 + 0.25 * (rng.random() * xx + rng.random() * yy)
    base = np.clip(base * shade[..., None], 0, 1)
    if ai_like:
        # posterize: quantize each channel to few levels (banding), then
        # smooth the cell boundaries
        levels = int(rng.integers(5, 10))
        img = np.floor(base * levels) / max(1, levels - 1)
        img = _smooth(np.clip(img, 0, 1), 0.6 + 0.8 * rng.random())
        img += rng.normal(0, 0.004, img.shape).astype(np.float32)
    else:
        detail = rng.random((size, size, 3)).astype(np.float32)
        img = base * (0.85 + 0.15 * detail) + 0.10 * detail
        img += rng.normal(0, 0.010 + 0.015 * rng.random(),
                          img.shape).astype(np.float32)
        # rare hot pixels (sensor defects)
        hot = rng.random((size, size)) < 3e-4
        img[hot] = 1.0
    return img


def _frame_waves(rng: np.random.Generator, size: int, ai_like: bool):
    """Family E (round 4, EVAL-ONLY second held-out family — never in
    TRAIN_FAMILIES).  The threshold-transfer recipe (3 families +
    codec aug + logit-L2, BASELINE.md round 4) was selected against ONE
    held-out family (texture); this family exists to measure whether
    that selection overfit the holdout.  Scenes: superposed smooth 2-D
    sinusoids + a radial ripple (interference patterns) — distinct from
    blob bumps, hard edges, value noise, and Voronoi cells.  Both cue
    parameterizations are new to the registry:

    * AI cue = SPECTRAL band-limiting (soft raised-cosine FFT low-pass —
      the band-limited output of a decoder, a different smoothing
      operator than Gaussian/box/checkerboard-NN/posterize) + near-zero
      noise;
    * camera cue = crisp detail + MULTIPLICATIVE speckle (gain noise)
      + additive HIGH-PASS noise (white minus its own smoothing) —
      no blur anywhere in the camera branch (the pass-1/2 lesson:
      blurred camera frames teach the inverse meta-cue and the
      inversion transfers; see _frame_cellular)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.zeros((size, size), np.float32)
    for _ in range(rng.integers(3, 6)):
        a, b = rng.normal(0, 8, 2)
        base += (0.5 + 0.5 * np.sin(a * xx + b * yy
                                    + rng.random() * 6.28)) \
            * (0.3 + 0.7 * rng.random())
    cx, cy = rng.random(2)
    r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    base += 0.5 + 0.5 * np.sin(r * rng.uniform(15, 40)
                               + rng.random() * 6.28)
    base /= max(1e-6, base.max())
    mix = 0.4 + 0.6 * rng.random((1, 1, 3)).astype(np.float32)
    img = np.clip(base[..., None] * mix
                  + 0.15 * rng.random(3).astype(np.float32), 0, 1)
    if ai_like:
        # band-limit: soft raised-cosine low-pass in the frequency
        # domain (rolls off between f0 and f1 of Nyquist)
        f0 = 0.12 + 0.20 * rng.random()
        f1 = f0 + 0.10 + 0.15 * rng.random()
        fy = np.fft.fftfreq(size)[:, None]
        fx = np.fft.rfftfreq(size)[None, :]
        fr = np.sqrt(fy ** 2 + fx ** 2) / 0.5  # fraction of Nyquist
        mask = np.clip((f1 - fr) / max(1e-6, f1 - f0), 0.0, 1.0)
        mask = 0.5 - 0.5 * np.cos(np.pi * mask)  # raised cosine
        for c in range(3):
            spec = np.fft.rfft2(img[..., c]) * mask
            img[..., c] = np.fft.irfft2(spec, s=(size, size))
        img = np.clip(img * (1.0 + 0.08 * rng.random()), 0, 1)
        img += rng.normal(0, 0.004, img.shape).astype(np.float32)
    else:
        detail = rng.random((size, size, 3)).astype(np.float32)
        img = np.clip(img * (0.85 + 0.15 * detail) + 0.10 * detail, 0, 1)
        # multiplicative speckle (gain noise)
        img *= (1.0 + rng.normal(0, 0.02 + 0.02 * rng.random(),
                                 img.shape).astype(np.float32))
        # additive high-pass noise: white minus its own smoothing
        w = rng.standard_normal(img.shape).astype(np.float32)
        img += (0.010 + 0.015 * rng.random()) * (w - _smooth(w, 1.5))
    return img


# Procedural generator families (labels 1 = AI-like in all of them).
# Default TRAINING uses blobs+geometric+cellular; texture stays HELD OUT
# as the unseen-family transfer eval (tools/eval_detector.py,
# BASELINE.md) — the same held-out family since round 3, so transfer
# numbers remain comparable across rounds.  waves is the EVAL-ONLY
# second holdout (never trained on by any shipped recipe): it checks
# that the transfer recipe wasn't overfit to the texture holdout.
GENERATOR_FAMILIES = {
    "blobs": _frame_blobs,
    "geometric": _frame_geometric,
    "texture": _frame_texture,
    "cellular": _frame_cellular,
    "waves": _frame_waves,
}
TRAIN_FAMILIES = ("blobs", "geometric", "cellular")
HELDOUT_FAMILY = "texture"


def synthetic_batch(rng: np.random.Generator, batch: int, size: int,
                    families=("blobs",)):
    """Procedural real-vs-AI frames (labels 1 = AI-like).

    Encodes the cues the reference's heuristics key on (video.py:51-57 —
    texture, smoothness) with enough intra-class variation that the
    classes overlap.  ``families`` picks which procedural generator
    families contribute (uniformly at random per frame); the default
    single-family call is the original round-1 behavior."""
    frames = np.empty((batch, size, size, 3), np.float32)
    labels = np.empty((batch,), np.int32)
    fams = [GENERATOR_FAMILIES[f] for f in families]
    for i in range(batch):
        ai_like = rng.random() < 0.5
        gen = fams[rng.integers(0, len(fams))]
        frames[i] = np.clip(gen(rng, size, ai_like), 0, 1)
        labels[i] = 1 if ai_like else 0
    return frames, labels


def evaluate(params, cfg, n: int = 512, batch: int = 64, seed: int = 999,
             fam=None, families=("blobs",)):
    """Held-out synthetic eval → (accuracy, auc); ``families`` selects
    the procedural generator families the eval set draws from."""
    import jax
    import jax.numpy as jnp

    from avd_tpu import models
    fam = fam or models.family("vit")

    @jax.jit
    def probs(p, fb):
        return jax.nn.sigmoid(
            fam.forward(p, fb, cfg)[:, 0].astype(jnp.float32))

    rng = np.random.default_rng(seed)
    ps, ys = [], []
    for _ in range(n // batch):
        frames, labels = synthetic_batch(rng, batch, cfg.image_size,
                                         families)
        ps.append(np.asarray(probs(params, jnp.asarray(frames))))
        ys.append(labels)
    return _acc_auc(np.concatenate(ps), np.concatenate(ys))


def _acc_auc(p: np.ndarray, y: np.ndarray):
    """Accuracy at 0.5 + AUC via the rank statistic."""
    acc = float(np.mean((p > 0.5) == (y == 1)))
    order = np.argsort(p)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(p) + 1)
    n_pos = int((y == 1).sum())
    n_neg = len(y) - n_pos
    auc = float((ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2)
                / max(1, n_pos * n_neg))
    return acc, auc


def evaluate_sequences(params, cfg, n: int = 64, t: int = 8,
                       batch: int = 16, seed: int = 999,
                       families=("blobs",)):
    """Held-out synthetic-sequence eval for the temporal family →
    per-frame (accuracy, auc)."""
    import jax
    import jax.numpy as jnp

    from avd_tpu.models import temporal

    @jax.jit
    def probs(p, fb):
        return jax.nn.sigmoid(
            temporal.forward(p, fb, cfg)[..., 0].astype(jnp.float32))

    rng = np.random.default_rng(seed)
    ps, ys = [], []
    for _ in range(max(1, n // batch)):
        frames, labels = temporal.synthetic_sequences(rng, batch, t,
                                                      cfg.image_size,
                                                      families)
        ps.append(np.asarray(probs(params, jnp.asarray(frames))).ravel())
        ys.append(labels.ravel())
    return _acc_auc(np.concatenate(ps), np.concatenate(ys))


def augment_pool_codec(frames: np.ndarray, frac: float,
                       rng: np.random.Generator,
                       sequences: bool = False,
                       crfs: tuple = (18, 23, 28)) -> np.ndarray:
    """Run a ``frac`` fraction of the sample pool through REAL codec
    round-trips (avd_tpu/ingest/codec.py) at mixed severities.

    Deployment inputs are sampled frames of compressed uploads — the
    reference's whole domain (heuristics_v2.py:9-12 classifies
    bits-per-pixel compression) — so training on pristine procedural
    frames bakes in a clean-data prior that JPEG-quality evals exposed
    (BASELINE.md round 3).  Each selected sample gets a random codec
    (H.264-weighted) and a MODERATE CRF; per-frame pools ride
    ``roundtrip_frames`` (P-frame artifacts), sequence pools
    ``roundtrip_sequences``.  One-time pool cost — the train loop's
    per-step path is untouched.

    Training CRFs default to ≤28 (near-transparent → typical web
    re-encode), NOT the eval sweep's 45: at heavy CRF the codec erases
    the camera frames' sensor-noise cue, and those samples become label
    noise that teaches "smooth = camera" — measured as a below-chance
    unseen-family AUC collapse (0.74 → 0.44 at 3x steps,
    tools/threshold_study.py pass 2) when augmentation drew from the
    full sweep.  ``crfs`` (``--aug-crfs``) overrides the set — the
    round-4 continuation study tests whether the mid band (32/35) is
    safe even though 45 is toxic (docs/studies/)."""
    from avd_tpu.ingest import codec as codec_mod
    if frac <= 0:
        return frames
    if not codec_mod.available():
        raise RuntimeError("--aug-codec: libav* encoder unavailable")
    n = frames.shape[0]
    n_aug = int(round(n * min(1.0, frac)))
    if n_aug == 0:
        return frames
    sel = rng.choice(n, n_aug, replace=False)
    codecs = np.asarray(["libx264", "libx264", "libx265", "mpeg4"])
    pick_codec = codecs[rng.integers(0, len(codecs), n_aug)]
    train_crfs = tuple(crfs)
    pick_crf = np.asarray(train_crfs)[
        rng.integers(0, len(train_crfs), n_aug)]
    out = frames.copy()
    for cname in np.unique(pick_codec):
        for crf in np.unique(pick_crf):
            m = (pick_codec == cname) & (pick_crf == crf)
            if not m.any():
                continue
            idx = sel[m]
            if sequences:
                out[idx] = codec_mod.roundtrip_sequences(
                    frames[idx], codec=str(cname), crf=int(crf))
            else:
                out[idx] = codec_mod.roundtrip_frames(
                    frames[idx], codec=str(cname), crf=int(crf), rng=rng)
    return out


_VIDEO_EXTS = (".mp4", ".mov", ".mkv", ".avi", ".webm", ".m4v")


def _dir_batches(root: str, rng, batch: int, size: int):
    """Yield (frames, labels) from a real/ai media corpus on disk.

    Corpus contract (the production-training entry point — the
    reference's whole input domain is uploaded media,
    /root/reference/render.yaml:12):

        <root>/real/   camera-captured media (label 0)
        <root>/ai/     AI-generated media  (label 1)

    Both folders take IMAGES (anything cv2.imread decodes: jpg/png/...)
    and VIDEOS (.mp4/.mov/.mkv/.avi/.webm — each draw samples one
    random frame, so a clip contributes its whole duration to the
    pool).  Frames are resized to the model input and scaled to [0,1]
    RGB.  A tiny committed corpus (tests/data/corpus_v1, built by
    tools/make_fixture_corpus.py) executes this path in CI; see
    README "Training on real data"."""
    import os

    import cv2
    pools = []
    for label, sub in ((0, "real"), (1, "ai")):
        d = os.path.join(root, sub)
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))] \
            if os.path.isdir(d) else []
        if not files:
            raise ValueError(f"--data {root}: no files in {sub}/ "
                             "(need non-empty real/ and ai/ folders)")
        pools.append((label, files))

    caps: dict = {}  # lazily-opened VideoCapture per clip path

    def _read(fname: str) -> np.ndarray:
        if fname.lower().endswith(_VIDEO_EXTS):
            cap = caps.get(fname)
            if cap is None:
                cap = caps[fname] = cv2.VideoCapture(fname)
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            if n <= 0:
                raise ValueError(f"--data: unreadable video {fname}")
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(rng.integers(0, n)))
            ok, img = cap.read()
            if not ok:  # some containers mis-report the tail count
                cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
                ok, img = cap.read()
            if not ok:
                raise ValueError(f"--data: unreadable video {fname}")
            return img
        img = cv2.imread(fname)
        if img is None:
            raise ValueError(f"--data: unreadable image {fname}")
        return img

    while True:
        frames = np.empty((batch, size, size, 3), np.float32)
        labels = np.empty((batch,), np.int32)
        for i in range(batch):
            label, files = pools[rng.integers(0, 2)]
            img = _read(files[rng.integers(0, len(files))])
            img = cv2.resize(img, (size, size))[..., ::-1]
            frames[i] = img.astype(np.float32) / 255.0
            labels[i] = label
        yield frames, labels


def train(steps: int = 100, batch: int = 16, lr: float = 3e-4,
          out: str | None = None, data: str | None = None,
          image_size: int = 64, width: int = 256, depth: int = 4,
          heads: int = 4, log_every: int = 10, seed: int = 0,
          cache_samples: int = 8192, arch: str = "vit",
          experts: int = 0, pp_stages: int = 0, pp_tp: int = 0,
          remat: bool = False, scan: bool = False, seq_len: int = 8,
          init_from: str | None = None, families=("blobs",),
          aug_codec: float = 0.0, logit_l2: float = 0.0,
          aug_crfs: tuple = (18, 23, 28),
          resume: bool = False, save_every: int = 0,
          zero1: bool = False, fsdp: bool = False,
          warmup: int = 0, schedule: str = "const",
          schedule_horizon: int = 0,
          grad_clip: float = 0.0, accum: int = 1, ema: float = 0.0):
    import os

    import jax
    import jax.numpy as jnp

    from avd_tpu import models
    from avd_tpu.parallel import mesh as mesh_mod
    from avd_tpu.utils import jaxtools
    jaxtools.setup()

    if resume and init_from:
        raise ValueError("--resume and --init-from are mutually exclusive")
    if resume and not out:
        raise ValueError("--resume continues the run saved at --out")
    state_path = f"{out}.train" if out else None

    detector = models.family(arch)
    if arch == "cnn":
        cfg = detector.make_config("small", image_size=image_size)
    elif arch == "temporal":
        if data:
            raise ValueError("--data folders are per-frame; the temporal "
                             "family trains on synthetic sequences")
        cfg = detector.make_config("small", image_size=image_size,
                                   width=width, depth=depth, heads=heads)
    else:
        cfg = detector.make_config("full", image_size=image_size, patch=16,
                                   width=width, depth=depth, heads=heads,
                                   n_experts=experts, remat=remat,
                                   scan=scan)
    params = detector.init_params(jax.random.PRNGKey(seed), cfg)
    if init_from:
        # resolution-transfer fine-tune: restore a checkpoint trained at
        # another image size into THIS config's pytree, adapting only
        # the positional-embedding grid (detector.interpolate_pos_emb).
        # The source grid is read from the checkpoint METADATA (shapes
        # only, no data): for a fixed patch size, pos_emb is the ONLY
        # resolution-dependent leaf, so its stored token count names
        # the training resolution directly — one clean restore instead
        # of try/except probing (failed orbax restores spray unhandled
        # asyncio-task dumps into the log, ~138 per probe miss).
        if arch != "vit":
            raise ValueError("--init-from supports the ViT family")
        import dataclasses

        import orbax.checkpoint as ocp

        from avd_tpu.models.detector import interpolate_pos_emb
        meta = ocp.StandardCheckpointer().metadata(
            os.path.abspath(init_from)).item_metadata
        tok = meta["pos_emb"].shape[0]
        side = int(round((tok - 1) ** 0.5))
        if side * side != tok - 1:
            raise ValueError(f"--init-from {init_from}: stored pos_emb "
                             f"has {tok} tokens — not a square patch "
                             "grid + cls")
        probe_size = side * cfg.patch
        probe_cfg = dataclasses.replace(cfg, image_size=probe_size)
        like = detector.init_params(jax.random.PRNGKey(0), probe_cfg)
        restored = detector.load_checkpoint(init_from, like)
        params = interpolate_pos_emb(restored, cfg)
        print(f"initialized from {init_from} (trained at {probe_size}px; "
              f"pos_emb -> {cfg.tokens} tokens)", flush=True)
    if resume:
        if not os.path.isdir(out) or not os.path.isdir(state_path or ""):
            raise ValueError(f"--resume: no checkpoint+train state at "
                             f"{out}[.train]")
        params = detector.load_checkpoint(out, params)
    # with accumulation the optimizer only steps every `accum` loop
    # iterations — the cosine horizon is in OPTIMIZER steps.
    # --schedule-horizon decouples the cosine horizon from this
    # invocation's --steps: curriculum phases resumed with --resume
    # (e.g. temporal T=4..32) each rebuild the optimizer, and without a
    # shared horizon every phase restarts its own cosine (LR sawtooth);
    # passing the TOTAL step count in every phase yields one global
    # warmup+cosine across the whole curriculum.
    optimizer = detector.make_optimizer(
        lr, steps=max(1, (schedule_horizon or steps) // max(1, accum)),
        warmup=warmup, schedule=schedule, grad_clip=grad_clip, accum=accum)

    n_dev = len(jax.devices())
    sharded = n_dev > 1
    mesh = None
    if pp_tp > 1 and pp_stages <= 1:
        raise ValueError("--pp-tp requires --pp (the 'model' axis rides "
                         "the pipeline mesh)")
    if pp_stages > 1:
        # pipeline-parallel training: (data, stage) mesh, GPipe forward;
        # --pp-tp M adds a 'model' axis for the 3-D dp×pp×tp composition
        # (block_forward_tp's manual Megatron psums inside each stage)
        if arch != "vit":
            raise ValueError("--pp requires the ViT family")
        tp = max(1, pp_tp)
        if n_dev % (pp_stages * tp) or cfg.depth % pp_stages:
            raise ValueError(f"{n_dev} devices / depth {cfg.depth} not "
                             f"divisible by {pp_stages} stages × {tp} tp")
        if tp > 1:
            mesh = mesh_mod.make_mesh(
                n_dev, axes=("data", "stage", "model"),
                shape=(n_dev // (pp_stages * tp), pp_stages, tp))
        else:
            mesh = mesh_mod.make_mesh(n_dev, axes=("data", "stage"),
                                      shape=(n_dev // pp_stages, pp_stages))
        if logit_l2:
            raise ValueError("--logit-l2 is not plumbed through the "
                             "pipelined loss; use the dp/tp path")
        if zero1 or fsdp:
            raise ValueError("--zero1/--fsdp ride the dp/tp step; "
                             "the GPipe path already shards the layer "
                             "stack (and its optimizer state) over "
                             "'stage'")
        sharded = True
        opt_state = optimizer.init(params)
        step_fn = jax.jit(detector.make_pp_train_step(cfg, optimizer,
                                                      mesh, tp=tp > 1))
    else:
        specs = detector.param_specs(cfg)
        if fsdp:
            # ZeRO-3/FSDP: the parameters THEMSELVES shard over the
            # data axis (parallel/zero.py::fsdp_param_specs); moments
            # and accumulation buffers follow the same specs, so the
            # whole param+grad+state trio scales with |data|
            if n_dev <= 1:
                raise ValueError("--fsdp needs >1 device")
            if arch not in ("vit", "cnn"):
                raise ValueError("--fsdp rides the dp/tp step (vit/cnn)")
            from avd_tpu.parallel import zero as zero_mod
            mesh = mesh or mesh_mod.make_mesh(n_dev,
                                              axes=("data", "model"))
            specs = zero_mod.fsdp_param_specs(params, specs,
                                              mesh.shape["data"])
            zero1 = True  # the jit/sharding wiring below is shared
        if sharded:
            mesh = mesh or mesh_mod.make_mesh(n_dev,
                                              axes=("data", "model"))
            params = mesh_mod.shard_params(mesh, params, specs)
        opt_state = optimizer.init(params)
        raw_step = detector.make_train_step(cfg, optimizer,
                                            sharded=sharded,
                                            logit_l2=logit_l2)
        if zero1:
            # ZeRO-1: AdamW moments sharded over the data axis (each
            # device holds 1/|data| of the f32 optimizer memory); the
            # step body is unchanged — XLA places the reduce-scatter /
            # all-gather (parallel/zero.py)
            if not sharded:
                raise ValueError("--zero1 needs >1 device (a data axis "
                                 "to shard the optimizer state over)")
            if arch not in ("vit", "cnn"):
                raise ValueError("--zero1 rides the dp/tp step "
                                 "(vit/cnn)")
            from avd_tpu.parallel import zero as zero_mod
            opt_state = zero_mod.shard_opt_state(opt_state, params,
                                                 specs, mesh)
            step_fn = zero_mod.zero1_jit_train_step(
                raw_step, params, opt_state, specs, mesh)
        else:
            step_fn = jax.jit(raw_step)

    start_step = 0
    _resume_ema = None
    if resume:
        # restore optimizer state + step counter on the host; the first
        # step_fn call re-places them (matching params' shardings).
        # The saved state may or may not carry an 'ema' stream (the run
        # being resumed may have used a different --ema flag) — probe
        # both template shapes instead of surfacing a raw orbax
        # tree-structure error on the mismatch.
        tmpl = {"step": 0, "opt_state": opt_state}
        try:
            st = detector.load_checkpoint(
                state_path, jax.device_get({**tmpl, "ema": params}))
        except Exception:
            st = detector.load_checkpoint(state_path, jax.device_get(tmpl))
        opt_state = st["opt_state"]
        start_step = int(st["step"])
        _resume_ema = st.get("ema")
        if ema > 0 and _resume_ema is None:
            print("warning: saved train state has no EMA stream — "
                  "re-seeding the EMA from the restored params", flush=True)
        if ema <= 0 and _resume_ema is not None:
            print("note: saved EMA stream preserved (frozen) — pass --ema "
                  "to keep updating it", flush=True)
        print(f"resumed at step {start_step} from {state_path}", flush=True)

    rng = np.random.default_rng(seed)
    batches = (_dir_batches(data, rng, batch, image_size) if data else None)

    # the single shared host core generates ~300 synthetic frames/s while
    # the chip eats thousands — pre-generate a fixed pool once and sample
    # epochs from it (fresh-seed held-out eval still measures generalization)
    pool = None
    if batches is None and cache_samples:
        if arch == "temporal":
            from avd_tpu.models import temporal
            pool = temporal.synthetic_sequences(
                rng, max(batch, cache_samples // seq_len), seq_len,
                image_size, families)
        else:
            pf, pl = [], []
            for _ in range(-(-cache_samples // batch)):
                f, lab = synthetic_batch(rng, batch, image_size, families)
                pf.append(f)
                pl.append(lab)
            pool = (np.concatenate(pf), np.concatenate(pl))

    if pool is not None and aug_codec > 0:
        t_aug = time.time()
        aug_rng = np.random.default_rng((seed, 77))
        pool = (augment_pool_codec(pool[0], aug_codec, aug_rng,
                                   sequences=(arch == "temporal"),
                                   crfs=tuple(aug_crfs)),
                pool[1])
        print(f"codec augmentation: {aug_codec:.0%} of the pool through "
              f"H.264/H.265/MPEG-4 round-trips at CRF {tuple(aug_crfs)} "
              f"({time.time() - t_aug:.1f}s)", flush=True)
    elif aug_codec > 0:
        raise ValueError("--aug-codec requires the sample-pool path "
                         "(--cache-samples > 0, no --data)")

    # Device-resident pool: on a single device behind the slow axon tunnel
    # (~35 MB/s H2D) the per-step batch put dominates wall clock at large
    # image sizes (224px x batch 64 = 38.5 MB/step).  Upload the fixed pool
    # ONCE and gather each batch on-device from a tiny int32 index vector —
    # the train loop becomes compute-bound.  Sharded meshes keep the host
    # path (a gather across a batch-sharded pool would all-gather).
    dev_pool = None
    if pool is not None and not sharded:
        dev_pool = (jax.device_put(pool[0]), jax.device_put(pool[1]))
        jax.block_until_ready(dev_pool)
        pool_n = pool[0].shape[0]
        print(f"pool resident on device "
              f"({pool[0].nbytes / 1e6:.0f} MB, {pool_n} samples)",
              flush=True)

    # parameter EMA (Polyak averaging) — shipped-quality weights for
    # noisy small-batch runs.  jnp.copy breaks buffer aliasing with
    # `params` (the ZeRO path donates the params input buffers).
    ema_params = None
    if ema > 0:
        if not 0 < ema < 1:
            raise ValueError(f"--ema decay must be in (0, 1), got {ema}")
        ema_params = jax.tree_util.tree_map(
            jnp.asarray, _resume_ema if _resume_ema is not None
            else jax.device_get(params))
        ema_fn = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda a, b: ema * a + (1.0 - ema) * b, e, p))

    def _save_state(at_step: int) -> None:
        if not out:
            return
        detector.save_checkpoint(out, jax.device_get(params))
        state = {"step": at_step, "opt_state": opt_state}
        if ema_params is not None:
            state["ema"] = ema_params
            detector.save_checkpoint(out + ".ema",
                                     jax.device_get(ema_params))
        elif _resume_ema is not None:
            # resumed a run that carried an EMA stream but --ema is off
            # this time: preserve the stream (frozen) instead of
            # silently dropping it from the saved state
            state["ema"] = _resume_ema
        detector.save_checkpoint(state_path, jax.device_get(state))
        # training provenance beside the weights: what produced this
        # checkpoint (tests and evals read `families` instead of
        # assuming the current TRAIN_FAMILIES)
        import json
        with open(os.path.join(out, "train_meta.json"), "w") as f:
            json.dump({"arch": arch, "families": list(families),
                       "steps": at_step, "batch": batch, "lr": lr,
                       "image_size": image_size, "width": width,
                       "depth": depth, "heads": heads,
                       "experts": experts, "seq_len": seq_len,
                       "seed": seed,
                       "aug_codec": aug_codec, "logit_l2": logit_l2,
                       "aug_crfs": list(aug_crfs),
                       "warmup": warmup, "schedule": schedule,
                       "schedule_horizon": schedule_horizon,
                       "grad_clip": grad_clip, "accum": accum,
                       "ema": ema, "zero1": zero1, "fsdp": fsdp,
                       "init_from": init_from}, f)

    losses = []
    import contextlib
    ctx = mesh or contextlib.nullcontext()
    with ctx:
        t0 = time.time()
        for step in range(start_step, steps):
            # per-step DERIVED rng for pool index draws: resume at step k
            # replays exactly the batches an uninterrupted run would see
            # (tests/test_train.py::test_resume_bit_compatible)
            step_rng = np.random.default_rng((seed, 1_000_003 + step))
            if dev_pool is not None:
                idx = jnp.asarray(step_rng.integers(0, pool_n, batch),
                                  jnp.int32)
                fb = jnp.take(dev_pool[0], idx, axis=0)
                lb = jnp.take(dev_pool[1], idx, axis=0)
            else:
                if batches is not None:
                    frames, labels = next(batches)
                elif pool is not None:
                    idx = step_rng.integers(0, pool[0].shape[0], batch)
                    frames, labels = pool[0][idx], pool[1][idx]
                elif arch == "temporal":
                    from avd_tpu.models import temporal
                    frames, labels = temporal.synthetic_sequences(
                        rng, batch, seq_len, image_size, families)
                else:
                    frames, labels = synthetic_batch(rng, batch, image_size,
                                                     families)
                fb = jnp.asarray(frames)
                lb = jnp.asarray(labels)
                if sharded:
                    bs = mesh_mod.batch_sharding(mesh)
                    fb = jax.device_put(fb, bs)
                    lb = jax.device_put(lb, bs)
            params, opt_state, loss = step_fn(params, opt_state, fb, lb)
            if ema_params is not None and (step + 1) % accum == 0:
                # with --accum K, optax.MultiSteps only applies the inner
                # optimizer every K loop iterations (params are frozen in
                # between) — decay the Polyak average once per ACTUAL
                # update, not K times, so --ema keeps its documented
                # per-optimizer-step semantics
                ema_params = ema_fn(ema_params, params)
            losses.append(float(loss))
            if log_every and step % log_every == 0:
                rate = (step - start_step + 1) * batch / (time.time() - t0)
                print(f"step {step:5d}  loss {losses[-1]:.4f}  "
                      f"{rate:.1f} frames/s", flush=True)
            if save_every and (step + 1) % save_every == 0 \
                    and step + 1 < steps:
                _save_state(step + 1)

    if arch == "temporal":
        acc, auc = evaluate_sequences(params, cfg, t=seq_len,
                                      families=families)
    else:
        acc, auc = evaluate(params, cfg, fam=detector, families=families)
    print(f"held-out synthetic eval: accuracy {acc:.3f}  auc {auc:.3f}",
          flush=True)
    if ema_params is not None:
        if arch == "temporal":
            eacc, eauc = evaluate_sequences(ema_params, cfg, t=seq_len,
                                            families=families)
        else:
            eacc, eauc = evaluate(ema_params, cfg, fam=detector,
                                  families=families)
        print(f"EMA({ema}) eval: accuracy {eacc:.3f}  auc {eauc:.3f} "
              f"(weights at <out>.ema)", flush=True)
    if out:
        _save_state(steps)
        print(f"checkpoint written to {out} (+ {state_path} for --resume)",
              flush=True)
    return params, losses


def main() -> int:
    ap = argparse.ArgumentParser(description="Train the per-frame detector")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default=None, help="orbax checkpoint dir")
    ap.add_argument("--data", default=None,
                    help="dataset dir with real/ and ai/ image folders")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--arch", default="vit",
                    choices=("vit", "cnn", "temporal"),
                    help="model family (models/__init__.py)")
    ap.add_argument("--seq-len", type=int, default=8, dest="seq_len",
                    help="temporal family: frames per training sequence")
    ap.add_argument("--experts", type=int, default=0,
                    help="ViT only: Switch-MoE expert count (0 = dense)")
    ap.add_argument("--pp", type=int, default=0, dest="pp_stages",
                    help="pipeline-parallel stage count (GPipe over a "
                         "(data, stage) mesh; ViT only)")
    ap.add_argument("--pp-tp", type=int, default=0, dest="pp_tp",
                    help="with --pp: 'model' axis size for the 3-D "
                         "dp×pp×tp mesh (Megatron TP inside each stage)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize blocks under autodiff "
                         "(activation memory O(1) in depth; ViT only)")
    ap.add_argument("--scan", action="store_true",
                    help="roll the layer stack into one lax.scan "
                         "(depth-fold smaller train program; ViT only)")
    ap.add_argument("--init-from", default=None, dest="init_from",
                    help="warm-start from an orbax checkpoint, bilinearly "
                         "interpolating pos_emb across resolutions "
                         "(ViT only)")
    ap.add_argument("--cache-samples", type=int, default=8192,
                    dest="cache_samples",
                    help="pre-generated sample pool size (the single "
                         "shared host core is the data bottleneck)")
    ap.add_argument("--aug-codec", type=float, default=0.0,
                    dest="aug_codec", metavar="FRAC",
                    help="fraction of the sample pool run through real "
                         "H.264/H.265/MPEG-4 round-trips at mixed CRFs "
                         "(ingest/codec.py; deployment inputs are "
                         "compressed uploads)")
    ap.add_argument("--aug-crfs", default="18,23,28", dest="aug_crfs",
                    metavar="CRF,CRF,...",
                    help="CRF set --aug-codec draws from (default "
                         "18,23,28; the full eval sweep's 45 is toxic — "
                         "augment_pool_codec docstring)")
    ap.add_argument("--logit-l2", type=float, default=0.0,
                    dest="logit_l2", metavar="COEF",
                    help="score-distribution regularizer: COEF*mean(z^2) "
                         "on the raw logits (bounds training-family "
                         "margins so unseen-family scores separate at "
                         "the 0.5 threshold)")
    ap.add_argument("--warmup", type=int, default=0, metavar="K",
                    help="linear LR warmup over K steps (then hold, or "
                         "cosine-decay with --schedule cosine)")
    ap.add_argument("--schedule", default="const",
                    choices=("const", "cosine"),
                    help="LR schedule; cosine decays to 1%% of --lr by "
                         "the final optimizer step")
    ap.add_argument("--schedule-horizon", type=int, default=0,
                    dest="schedule_horizon", metavar="N",
                    help="cosine decay horizon in TOTAL steps (default: "
                         "this invocation's --steps). Pass the full-"
                         "curriculum step count in every --resume phase "
                         "so the LR follows ONE global warmup+cosine "
                         "instead of warm-restarting per phase")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    dest="grad_clip", metavar="NORM",
                    help="global-norm gradient clipping (0 = off), "
                         "applied before the Adam moments")
    ap.add_argument("--accum", type=int, default=1, metavar="K",
                    help="gradient accumulation: average K micro-batch "
                         "grads per optimizer step (steps exactly like "
                         "batch K*--batch; composes with --zero1)")
    ap.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                    help="parameter EMA (Polyak) with this decay; EMA "
                         "weights saved to <out>.ema and evaluated at "
                         "the end")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-3/FSDP: shard the PARAMETERS (and their "
                         "moments) over the data axis via pinned GSPMD "
                         "shardings — XLA all-gathers weights "
                         "just-in-time (parallel/zero.py; needs >1 "
                         "device, dp/tp path only)")
    ap.add_argument("--zero1", action="store_true",
                    help="ZeRO-1: shard the AdamW moments over the data "
                         "axis (each device keeps 1/|data| of the f32 "
                         "optimizer memory; parallel/zero.py — needs >1 "
                         "device, dp/tp path only)")
    ap.add_argument("--resume", action="store_true",
                    help="continue the run saved at --out (params from "
                         "<out>, optimizer state + step from <out>.train; "
                         "bit-compatible on the sample-pool path)")
    ap.add_argument("--save-every", type=int, default=0,
                    dest="save_every", metavar="K",
                    help="checkpoint params + train state every K steps "
                         "(besides the final save)")
    ap.add_argument("--seed", type=int, default=0,
                    help="param init + data-pool RNG seed (the pass-6 "
                         "cross-seed study trains the same recipe at "
                         "seeds 0..2 — docs/studies/threshold_p6_confirm)")
    ap.add_argument("--families", default="blobs",
                    help="comma-separated procedural generator families "
                         f"for train+eval data (available: "
                         f"{','.join(sorted(GENERATOR_FAMILIES))}; "
                         "'texture' is the held-out transfer-eval family "
                         "— tools/eval_detector.py)")
    args = ap.parse_args()
    if args.arch == "cnn":
        ignored = [f for f, d in (("--width", 256), ("--depth", 4),
                                  ("--heads", 4), ("--experts", 0))
                   if getattr(args, f.lstrip("-")) != d]
        if args.remat:
            ignored.append("--remat")
        if ignored:
            ap.error(f"{', '.join(ignored)} only apply to --arch vit")
    if args.arch == "temporal" and (args.experts or args.remat
                                    or args.pp_stages):
        ap.error("--experts/--remat/--pp only apply to --arch vit")
    _, losses = train(steps=args.steps, batch=args.batch, lr=args.lr,
                      out=args.out, data=args.data, seed=args.seed,
                      image_size=args.image_size, width=args.width,
                      depth=args.depth, heads=args.heads, arch=args.arch,
                      experts=args.experts, pp_stages=args.pp_stages,
                      pp_tp=args.pp_tp, remat=args.remat, scan=args.scan,
                      seq_len=args.seq_len, init_from=args.init_from,
                      cache_samples=args.cache_samples,
                      families=tuple(args.families.split(",")),
                      aug_codec=args.aug_codec, logit_l2=args.logit_l2,
                      aug_crfs=tuple(int(c) for c in
                                     args.aug_crfs.split(",")),
                      resume=args.resume, save_every=args.save_every,
                      zero1=args.zero1, fsdp=args.fsdp,
                      warmup=args.warmup, schedule=args.schedule,
                      schedule_horizon=args.schedule_horizon,
                      grad_clip=args.grad_clip, accum=args.accum,
                      ema=args.ema)
    if losses:
        print(f"final loss {losses[-1]:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
