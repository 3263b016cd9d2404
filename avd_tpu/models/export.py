"""AOT detector export — self-contained serving artifacts via jax.export.

The reference deploys Python source and rebuilds its world at import
time (`/root/reference/api.py` is executed at boot; render.yaml just
points Gunicorn at it).  A TPU production fleet wants the opposite: a
version-pinned, weight-embedded, ahead-of-time lowered program the
serving tier loads WITHOUT model code — no param init at boot, no drift
between the code that trained a checkpoint and the code that serves it,
and a single artifact file to promote through environments.

``export_detector`` lowers the exact serving computation
(``scoring._bundle``'s probs fn: family forward → calibrated sigmoid)
through ``jax.export`` into a serialized StableHLO program with the
checkpoint weights and calibration temperature embedded as constants,
plus a JSON manifest (architecture, preset, shapes, provenance,
sha256).  ``load_bundle`` deserializes it and serves it behind the same
contract, selected at runtime with ``AVD_DETECTOR_EXPORTED=<dir>``.

Artifacts are multi-platform by default (cpu + tpu): export once on any
host — a CPU CI box — and serve on TPU.  Per-frame families export one
fixed batch shape (the loader chunks and pads, numerics unchanged
because scores are per-frame); the temporal family exports its fixed
masked scoring window (``AVD_TEMPORAL_WINDOW`` semantics, scoring.py).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional, Sequence

PROGRAM_FILE = "program.jaxexport"
MANIFEST_FILE = "manifest.json"
FORMAT_VERSION = 1


@dataclasses.dataclass(frozen=True)
class _ExportedConfig:
    """Minimal config shim for the scoring contract (input_size())."""
    image_size: int


def _ckpt_temperature(ckpt: Optional[str]) -> float:
    """Checkpoint-owned calibration temperature, env-independent.

    Exports must bake the checkpoint's ``calibration.json`` — NOT
    ``scoring._temperature``'s ``AVD_DETECTOR_TEMP`` env override: a
    serve-time knob left set in the exporting shell would otherwise be
    permanently frozen into the artifact with nothing in the manifest
    flagging the divergence."""
    if ckpt:
        try:
            with open(os.path.join(ckpt, "calibration.json")) as f:
                t = float(json.load(f)["temperature"])
            if t > 0:
                return t
        except (OSError, ValueError, KeyError):
            pass
    return 1.0


def _build(arch: str, preset: Optional[str], ckpt: Optional[str],
           config_overrides: Optional[dict] = None):
    """Replicate scoring._bundle's model construction without env state.

    ``ckpt="auto"`` resolves the shipped checkpoint for (arch, preset)
    like serving does; ``None`` exports random-init (wiring tests)."""
    import jax

    from avd_tpu.models import scoring
    from avd_tpu import models

    detector = models.family(arch)
    preset = preset or scoring._default_preset(arch)
    cfg = detector.make_config(preset, **(config_overrides or {}))
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    if ckpt == "auto":
        ckpt = scoring._shipped_ckpt(arch, preset)
    source = "random_init"
    if ckpt:
        params = detector.load_checkpoint(ckpt, params)
        source = ckpt
    temp = _ckpt_temperature(ckpt)
    if os.getenv("AVD_DETECTOR_TEMP"):
        import warnings
        warnings.warn(
            f"AVD_DETECTOR_TEMP={os.environ['AVD_DETECTOR_TEMP']!r} is set "
            f"but IGNORED by export — artifacts bake the checkpoint's own "
            f"calibration (T={temp}); set it on the serving side instead",
            stacklevel=2)
    return detector, cfg, preset, params, temp, source


def export_detector(out_dir: str,
                    arch: str = "vit",
                    preset: Optional[str] = None,
                    ckpt: Optional[str] = "auto",
                    batch: int = 64,
                    window: int = 32,
                    platforms: Sequence[str] = ("cpu", "tpu"),
                    config_overrides: Optional[dict] = None) -> dict:
    """Export the serving computation for (arch, preset, ckpt) to
    ``out_dir`` and return the manifest.

    Per-frame families (vit/cnn) export
    ``probs: f32[batch, S, S, 3] → f32[batch]``; the temporal family
    exports ``probs: (f32[window, S, S, 3], i32[]) → f32[window]`` with
    the validity mask derived from the scalar exactly like serving.
    Weights and the calibration temperature are embedded as program
    constants — the artifact is self-contained.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    detector, cfg, preset, params, temp, source = _build(
        arch, preset, ckpt, config_overrides)
    clip_based = hasattr(detector, "forward_clip")
    size = cfg.image_size

    if clip_based:
        def fn(frames_f32, n_valid):
            mask = jnp.arange(frames_f32.shape[0]) < n_valid
            logits = detector.forward_clip(params, frames_f32, cfg,
                                           mask=mask)[:, 0]
            return jax.nn.sigmoid(logits.astype(jnp.float32) / temp)

        args = (jax.ShapeDtypeStruct((window, size, size, 3), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32))
        shape = {"window": window}
    else:
        def fn(frames_f32):
            logits = detector.forward(params, frames_f32, cfg)[:, 0]
            return jax.nn.sigmoid(logits.astype(jnp.float32) / temp)

        args = (jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32),)
        shape = {"batch": batch}

    exported = jexport.export(jax.jit(fn),
                              platforms=tuple(platforms))(*args)
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PROGRAM_FILE), "wb") as f:
        f.write(blob)
    manifest = {
        "format_version": FORMAT_VERSION,
        "arch": arch,
        "preset": preset,
        "image_size": size,
        **shape,
        "temperature": temp,
        "source": source,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "program_sha256": hashlib.sha256(blob).hexdigest(),
        "program_bytes": len(blob),
    }
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_bundle(out_dir: str):
    """Load an exported artifact and adapt it to the scoring contract.

    Returns ``(cfg, params, probs, source, min_batch)`` exactly like
    ``scoring._bundle`` — ``params`` is None (weights are embedded) and
    ``probs`` ignores its params argument.  Per-frame programs carry
    ``probs.fixed_batch`` (the loader's chunk size); temporal programs
    carry ``probs.clip_window``.  The manifest's sha256 is verified so a
    corrupted or mismatched artifact fails loudly at load, not with
    silently wrong scores.
    """
    import jax
    from jax import export as jexport

    with open(os.path.join(out_dir, MANIFEST_FILE)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"exported-detector format {manifest.get('format_version')!r} "
            f"!= supported {FORMAT_VERSION} ({out_dir})")
    with open(os.path.join(out_dir, PROGRAM_FILE), "rb") as f:
        blob = f.read()
    digest = hashlib.sha256(blob).hexdigest()
    if digest != manifest["program_sha256"]:
        raise ValueError(f"exported program sha256 mismatch in {out_dir}: "
                         f"manifest {manifest['program_sha256'][:12]}… != "
                         f"file {digest[:12]}…")
    call = jax.jit(jexport.deserialize(blob).call)

    cfg = _ExportedConfig(image_size=int(manifest["image_size"]))
    source = f"exported:{manifest['source']}"
    if manifest["temperature"] != 1.0:
        source += f"+T{manifest['temperature']:.2f}"

    if "window" in manifest:
        def probs(params, frames_f32, n_valid):
            del params
            return call(frames_f32, n_valid)

        probs.clip_window = int(manifest["window"])
    else:
        def probs(params, frames_f32):
            del params
            return call(frames_f32)

        probs.fixed_batch = int(manifest["batch"])

    return cfg, None, probs, source, 1


def main(argv=None) -> int:
    """CLI: export a checkpoint to an AOT serving artifact
    (``avd-export`` console script / ``python -m avd_tpu.models.export``).
    Runs fine on a CPU-only host — artifacts are multi-platform; serve
    with ``AVD_DETECTOR_EXPORTED=<out> AVD_DETECTOR=1``."""
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a detector checkpoint to a self-contained "
                    "AOT serving artifact (jax.export)")
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
    args = ap.parse_args(argv)

    manifest = export_detector(
        args.out, arch=args.arch, preset=args.preset,
        ckpt=None if args.ckpt == "none" else args.ckpt,
        batch=args.batch, window=args.window,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p))
    print(json.dumps(manifest, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
