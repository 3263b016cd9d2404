"""Int8 post-training quantization for the detector families (W8A8).

TPU-native serving mode: the MXU executes int8×int8→int32 matmuls at
twice the bf16 rate, and int8 weights halve the HBM bytes every matmul
streams (4× vs f32).  The scheme is the standard production recipe and
needs no calibration data:

* **weights** — symmetric per-output-channel int8
  (``scale = max|w| / 127`` per column), quantized once at load time;
* **activations** — dynamic symmetric per-token int8, the scale taken
  from each row's running max inside the forward (data-dependent
  *values* are fine under jit; shapes stay static);
* **accumulation** — int32 (``preferred_element_type``), dequantized by
  the rank-1 product of the two scales straight into f32; biases add in
  f32.

Precision-sensitive, FLOP-cheap work stays in f32/bf16: LayerNorm,
softmax, GELU, the attention einsums (activation×activation), the CNN's
depthwise conv, and the tiny classifier head.

The reference has no counterpart (it ships no model at all —
``/root/reference/app/analyzers/video.py:54-57`` is a closed-form
heuristic); this extends the BASELINE.json north-star detector slot with
the standard int8 serving mode.  Enable in serving with
``AVD_DETECTOR_QUANT=1`` (models/scoring.py); programmatic use is
``qparams = quantize_params(params)`` + ``forward(qparams, frames, cfg)``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from avd_tpu.models.detector import _ln, patchify

# weight leaves that become int8 {w_i8, scale}; everything else stays f32
_VIT_LAYER_KEYS = ("qkv_w", "proj_w", "mlp_in_w", "mlp_out_w")
_CNN_BLOCK_KEYS = ("exp_w", "proj_w")


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[d_in, d_out] f32 → symmetric per-output-channel int8.

    ``w ≈ w_i8 * scale[None, :]`` with ``|w_i8| ≤ 127``.
    """
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
    w_i8 = jnp.round(w / scale).astype(jnp.int8)
    return {"w_i8": w_i8, "scale": scale.astype(jnp.float32)}


def qdense(x: jnp.ndarray, qw: Dict[str, jnp.ndarray],
           b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Int8 dense: dynamic per-token activation quant → int8×int8→int32
    MXU matmul → f32 dequant (+ f32 bias).  ``x``: [..., d_in] float."""
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                      1e-12)
    x_i8 = jnp.round(xf / s_x).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, qw["w_i8"],
        dimension_numbers=(((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * qw["scale"]
    return y if b is None else y + b.astype(jnp.float32)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """f32 parameter pytree → mixed int8/f32 pytree for ``forward``.

    Family is inferred from the tree shape ('layers' = ViT, 'stages' =
    CNN).  MoE configs are rejected: the expert einsums route through
    dispatch tensors whose per-expert token groups would each need their
    own activation scale — run MoE in bf16.
    """
    if "layers" in params:
        if any("router_w" in lp for lp in params["layers"]):
            raise ValueError("int8 PTQ supports dense configs only; "
                             "MoE (n_experts>0) runs in bf16")
        qp: Dict[str, Any] = {k: v for k, v in params.items()
                              if k not in ("patch_w", "layers")}
        qp["patch_w"] = quantize_weight(params["patch_w"])
        qp["layers"] = []
        for lp in params["layers"]:
            qlp = {k: v for k, v in lp.items() if k not in _VIT_LAYER_KEYS}
            for k in _VIT_LAYER_KEYS:
                qlp[k] = quantize_weight(lp[k])
            qp["layers"].append(qlp)
        return qp
    if "stages" in params:
        qp = {k: v for k, v in params.items()
              if k not in ("stem_w", "stages")}
        qp["stem_w"] = quantize_weight(params["stem_w"])
        qp["stages"] = []
        for st in params["stages"]:
            qst = {k: v for k, v in st.items()
                   if k not in ("down_w", "blocks")}
            if "down_w" in st:
                qst["down_w"] = quantize_weight(st["down_w"])
            qst["blocks"] = []
            for blk in st["blocks"]:
                qblk = {k: v for k, v in blk.items()
                        if k not in _CNN_BLOCK_KEYS}
                for k in _CNN_BLOCK_KEYS:
                    qblk[k] = quantize_weight(blk[k])
                qst["blocks"].append(qblk)
            qp["stages"].append(qst)
        return qp
    raise ValueError("unrecognized parameter tree (expected a ViT "
                     "'layers' or CNN 'stages' pytree)")


def _vit_forward(qp: Dict[str, Any], frames: jnp.ndarray,
                 cfg) -> jnp.ndarray:
    """Int8 ViT forward mirroring detector.block_forward's math with the
    weight matmuls on the int8 path; residual stream kept f32."""
    x = patchify(frames.astype(jnp.float32), cfg.patch)
    x = qdense(x, qp["patch_w"], qp["patch_b"])
    cls = jnp.broadcast_to(qp["cls_tok"].astype(jnp.float32),
                           (x.shape[0], 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + \
        qp["pos_emb"].astype(jnp.float32)[None]

    for lp in qp["layers"]:
        h = _ln(x, lp["ln1_scale"], lp["ln1_bias"])
        qkv = qdense(h, lp["qkv_w"], lp["qkv_b"])
        b, t, _ = qkv.shape
        qkv = qkv.reshape(b, t, 3, cfg.heads, cfg.head_dim) \
                 .astype(jnp.bfloat16)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bthd,bshd->bhts", q, k,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att / np.sqrt(cfg.head_dim), axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", att.astype(jnp.bfloat16), v,
                       preferred_element_type=jnp.float32)
        o = o.reshape(b, t, cfg.width)
        x = x + qdense(o, lp["proj_w"], lp["proj_b"])

        h = _ln(x, lp["ln2_scale"], lp["ln2_bias"])
        h = jax.nn.gelu(qdense(h, lp["mlp_in_w"], lp["mlp_in_b"]))
        x = x + qdense(h, lp["mlp_out_w"], lp["mlp_out_b"])

    x = _ln(x, qp["ln_f_scale"], qp["ln_f_bias"])
    return x[:, 0] @ qp["head_w"] + qp["head_b"]


def _cnn_forward(qp: Dict[str, Any], frames: jnp.ndarray,
                 cfg) -> jnp.ndarray:
    """Int8 CNN forward mirroring cnn.forward; the depthwise conv (the
    only non-matmul op) stays bf16."""
    from avd_tpu.models.cnn import _dwconv, _patch_merge

    x = _patch_merge(frames.astype(jnp.float32), cfg.stem_patch)
    x = qdense(x, qp["stem_w"], qp["stem_b"])
    x = _ln(x, qp["stem_ln_scale"], qp["stem_ln_bias"])

    for si, st in enumerate(qp["stages"]):
        if si > 0:
            x = _ln(x, st["down_ln_scale"], st["down_ln_bias"])
            x = _patch_merge(x, 2)
            x = qdense(x, st["down_w"], st["down_b"])
        for blk in st["blocks"]:
            h = _dwconv(x.astype(jnp.bfloat16), blk["dw_w"], blk["dw_b"])
            h = _ln(h.astype(jnp.float32), blk["ln_scale"], blk["ln_bias"])
            h = jax.nn.gelu(qdense(h, blk["exp_w"], blk["exp_b"]))
            h = qdense(h, blk["proj_w"], blk["proj_b"])
            x = x + blk["gamma"].astype(jnp.float32) * h

    g = jnp.mean(x, axis=(1, 2))
    g = _ln(g, qp["ln_f_scale"], qp["ln_f_bias"])
    return g @ qp["head_w"] + qp["head_b"]


def forward(qparams: Dict[str, Any], frames: jnp.ndarray,
            cfg) -> jnp.ndarray:
    """[B, H, W, 3] float in [0,1] → [B, n_classes] f32 logits on the
    int8 path; family inferred from the quantized tree."""
    if "layers" in qparams:
        return _vit_forward(qparams, frames, cfg)
    return _cnn_forward(qparams, frames, cfg)
