"""Per-frame AI-content detector — ConvNeXt-style CNN family, TPU-first.

Second detector architecture next to the ViT (models/detector.py), same
functional API (Config / init_params / forward / param_specs /
make_train_step), selectable via ``AVD_DETECTOR_ARCH=cnn``
(models/scoring.py) or ``--arch cnn`` (models/train.py).

Why this shape of CNN on TPU:

* every dense projection is a **matmul** — the stem and the stage
  downsamples are non-overlapping patch merges (reshape + matmul, the
  same trick as ViT patchify) and the block's expand/project are 1x1
  convs written as channel matmuls, so all the FLOPs land on the MXU;
  the only true convolution is the cheap depthwise k×k;
* **LayerNorm, not BatchNorm** — serving batches are whatever the
  sampler produced; LN keeps inference batch-size-independent and
  avoids cross-device batch stats;
* **same mixed-precision recipe** as the ViT: bf16 activations,
  f32 params/optimizer/norms/loss;
* **same Megatron-style TP plan**: the block expand is column-sharded
  and the project row-sharded over the 'model' mesh axis (identical to
  the ViT MLP), batch over 'data'; GSPMD inserts the psum.  The
  depthwise conv runs on channel-replicated activations, so no halo
  exchange is needed for TP.

The reference has no model (app/analyzers/video.py:54-57 is a
closed-form heuristic); this fills the BASELINE.json north-star
detector slot with an architecture family choice.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from avd_tpu.models.detector import (  # generic helpers shared across families
    _constrain,
    _ln,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
)

__all__ = [
    "CNNConfig", "Config", "PRESETS", "make_config", "init_params",
    "forward", "loss_fn", "make_train_step", "param_specs",
    "make_optimizer", "save_checkpoint", "load_checkpoint",
]


@dataclasses.dataclass(frozen=True)
class CNNConfig:
    image_size: int = 64
    stem_patch: int = 4
    widths: Tuple[int, ...] = (64, 128, 256)
    depths: Tuple[int, ...] = (1, 2, 2)
    expand: int = 4
    kernel: int = 7
    n_classes: int = 1

    @property
    def stages(self) -> int:
        return len(self.widths)


Config = CNNConfig

PRESETS = {
    "small": {},  # the defaults above: 64px, widths (64,128,256)
    # 224px serving-size variant; widths stay 128-multiples for MXU tiling
    "full": dict(image_size=224, widths=(128, 256, 512), depths=(2, 2, 4)),
}


def make_config(preset: str = "small", **over) -> CNNConfig:
    if preset not in PRESETS:
        raise ValueError(f"unknown CNN preset {preset!r}; "
                         f"choose from {sorted(PRESETS)}")
    kw = dict(PRESETS[preset])
    kw.update(over)
    return CNNConfig(**kw)


def param_specs(cfg: CNNConfig) -> Dict[str, Any]:
    """Declarative TP plan: block expand col-sharded / project row-sharded
    over 'model' (the ViT MLP plan, detector.py:60-75); merges, depthwise
    kernels and norms replicate."""
    def block():
        return {
            "dw_w": P(), "dw_b": P(),
            "ln_scale": P(), "ln_bias": P(),
            "exp_w": P(None, "model"), "exp_b": P("model"),
            "proj_w": P("model", None), "proj_b": P(),
            "gamma": P(),
        }

    stages = []
    for si, depth in enumerate(cfg.depths):
        st: Dict[str, Any] = {"blocks": [block() for _ in range(depth)]}
        if si > 0:
            st.update({"down_ln_scale": P(), "down_ln_bias": P(),
                       "down_w": P(), "down_b": P()})
        stages.append(st)
    return {
        "stem_w": P(), "stem_b": P(),
        "stem_ln_scale": P(), "stem_ln_bias": P(),
        "stages": stages,
        "ln_f_scale": P(), "ln_f_bias": P(),
        "head_w": P(), "head_b": P(),
    }


def init_params(key: jax.Array, cfg: CNNConfig) -> Dict[str, Any]:
    """f32 parameter pytree."""
    n_blocks = sum(cfg.depths)
    keys = iter(jax.random.split(key, 2 + cfg.stages + 3 * n_blocks))

    def dense(fan_in, shape):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * (1.0 / np.sqrt(fan_in)))

    c0 = cfg.widths[0]
    stem_dim = cfg.stem_patch * cfg.stem_patch * 3
    params: Dict[str, Any] = {
        "stem_w": dense(stem_dim, (stem_dim, c0)),
        "stem_b": jnp.zeros((c0,), jnp.float32),
        "stem_ln_scale": jnp.ones((c0,), jnp.float32),
        "stem_ln_bias": jnp.zeros((c0,), jnp.float32),
        "stages": [],
        "ln_f_scale": jnp.ones((cfg.widths[-1],), jnp.float32),
        "ln_f_bias": jnp.zeros((cfg.widths[-1],), jnp.float32),
        "head_w": dense(cfg.widths[-1], (cfg.widths[-1], cfg.n_classes)),
        "head_b": jnp.zeros((cfg.n_classes,), jnp.float32),
    }
    for si, depth in enumerate(cfg.depths):
        c = cfg.widths[si]
        e = c * cfg.expand
        st: Dict[str, Any] = {"blocks": []}
        if si > 0:
            cin = cfg.widths[si - 1]
            st["down_ln_scale"] = jnp.ones((cin,), jnp.float32)
            st["down_ln_bias"] = jnp.zeros((cin,), jnp.float32)
            st["down_w"] = dense(4 * cin, (4 * cin, c))
            st["down_b"] = jnp.zeros((c,), jnp.float32)
        for _ in range(depth):
            st["blocks"].append({
                "dw_w": (jax.random.normal(
                    next(keys), (cfg.kernel, cfg.kernel, 1, c), jnp.float32)
                    * (1.0 / cfg.kernel)),
                "dw_b": jnp.zeros((c,), jnp.float32),
                "ln_scale": jnp.ones((c,), jnp.float32),
                "ln_bias": jnp.zeros((c,), jnp.float32),
                "exp_w": dense(c, (c, e)),
                "exp_b": jnp.zeros((e,), jnp.float32),
                "proj_w": dense(e, (e, c)),
                "proj_b": jnp.zeros((c,), jnp.float32),
                # layer scale (ConvNeXt): residual branch starts tiny
                "gamma": jnp.full((c,), 1e-2, jnp.float32),
            })
        params["stages"].append(st)
    return params


def _patch_merge(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/p, W/p, p·p·C] (non-overlapping; the stem and
    downsample convs become plain matmuls on this layout)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // patch, w // patch, patch * patch * c)


def _dwconv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SAME-padded depthwise k×k over NHWC."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return y + b.astype(x.dtype)


def forward(params: Dict[str, Any], frames: jnp.ndarray, cfg: CNNConfig,
            sharded: bool = False) -> jnp.ndarray:
    """[B, H, W, 3] float in [0,1] → [B, n_classes] f32 logits."""
    ap = functools.partial(_constrain) if sharded else (lambda x, s: x)
    bf = jnp.bfloat16

    x = _patch_merge(frames.astype(bf), cfg.stem_patch)
    x = x @ params["stem_w"].astype(bf) + params["stem_b"].astype(bf)
    x = _ln(x.astype(jnp.float32), params["stem_ln_scale"],
            params["stem_ln_bias"]).astype(bf)
    x = ap(x, P("data", None, None, None))

    for si, st in enumerate(params["stages"]):
        if si > 0:
            x = _ln(x.astype(jnp.float32), st["down_ln_scale"],
                    st["down_ln_bias"]).astype(bf)
            x = _patch_merge(x, 2)
            x = x @ st["down_w"].astype(bf) + st["down_b"].astype(bf)
        for blk in st["blocks"]:
            h = _dwconv(x, blk["dw_w"], blk["dw_b"])
            h = _ln(h.astype(jnp.float32), blk["ln_scale"],
                    blk["ln_bias"]).astype(bf)
            h = h @ blk["exp_w"].astype(bf) + blk["exp_b"].astype(bf)
            h = ap(h, P("data", None, None, "model"))
            h = jax.nn.gelu(h)
            h = h @ blk["proj_w"].astype(bf) + blk["proj_b"].astype(bf)
            x = x + ap(blk["gamma"].astype(bf) * h,
                       P("data", None, None, None))

    # global average pool (f32) → final LN → head
    g = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    g = _ln(g, params["ln_f_scale"], params["ln_f_bias"])
    return g @ params["head_w"] + params["head_b"]


def loss_fn(params, frames, labels, cfg: CNNConfig,
            sharded: bool = False, logit_l2: float = 0.0) -> jnp.ndarray:
    """Sigmoid BCE in f32 (labels: [B] in {0,1}) + optional logit-scale
    regularizer (detector._logit_l2)."""
    from avd_tpu.models.detector import _bce, _logit_l2
    z = forward(params, frames, cfg, sharded=sharded)[:, 0]
    loss = _bce(z, labels)
    if logit_l2:
        loss = loss + _logit_l2(z, logit_l2)
    return loss


def make_train_step(cfg: CNNConfig, optimizer, sharded: bool = False,
                    logit_l2: float = 0.0):
    """(params, opt_state, frames, labels) → (params, opt_state, loss) —
    the shared optimizer-step body with this family's loss."""
    from avd_tpu.models import detector
    return detector.make_train_step(cfg, optimizer, sharded, loss=loss_fn,
                                    logit_l2=logit_l2)
