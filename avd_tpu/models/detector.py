"""Per-frame AI-content detector — a compact ViT, TPU-first.

Pure-JAX functional implementation (explicit param pytree, no framework
state) so sharding annotations, mixed precision and the training step stay
fully visible:

* bf16 activations / f32 params & optimizer state / f32 softmax+loss —
  the standard TPU mixed-precision recipe (MXU eats bf16);
* shapes chosen for MXU tiling: width 384 (3×128), mlp 1536 (12×128),
  heads 6×64, 196+1 tokens padded to 256;
* Megatron-style tensor parallelism expressed declaratively: qkv/mlp-in
  weights are column-sharded, proj/mlp-out row-sharded over the 'model'
  mesh axis; the batch is sharded over 'data'.  XLA/GSPMD inserts the
  collectives (psum over ICI) from the annotations — no hand-written
  communication (SURVEY.md §2.2).

The reference has no model to compare against (app/analyzers/* is
heuristic); this is the BASELINE.json north-star detector slot.  Parity
mode bypasses it; enable via AVD_DETECTOR=1 (models/scoring.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch: int = 16
    width: int = 384
    depth: int = 6
    heads: int = 6
    mlp_ratio: int = 4
    n_classes: int = 1          # binary: AI-generated?
    dropout: float = 0.0        # inference default
    # Fused Pallas attention (ops/pallas/attention.py): scores stay
    # VMEM-resident instead of materializing [B, H, T, T] in HBM.
    # Inference-only (no VJP) and single-device/replicated programs only
    # — the sharded/TP paths keep the einsums.  Serving opts in via
    # AVD_ATTN_FUSED=1 (models/scoring.py).
    fused_attn: bool = False
    # Mixture-of-experts MLP (0 = dense).  Experts shard over the mesh's
    # 'model' axis (expert parallelism); Switch-style top-1 routing with
    # per-example token groups and capacity dropping.
    n_experts: int = 0
    capacity_factor: float = 1.25
    # Rematerialize each block under autodiff (jax.checkpoint): training
    # activation memory drops from O(depth) residual streams to O(1) at
    # the cost of recomputing each block's forward in the backward pass —
    # the standard TPU HBM-for-FLOPs trade for deep/big-batch configs.
    remat: bool = False
    # Roll the layer stack into ONE lax.scan over stacked parameters:
    # the program contains a single compiled block instead of `depth`
    # unrolled copies, shrinking HLO size and compile time ~depth-fold.
    # Numerically identical (same blocks, same order); composes with
    # remat (scan-of-checkpointed-block = the standard big-model train
    # recipe).  This is what lets the 224px full-preset TRAIN program
    # fit through this environment's remote compile helper, which dies
    # on the unrolled 224px train step (BASELINE.md round-2 blocker).
    scan: bool = False

    @property
    def tokens(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1  # +cls

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def expert_capacity(self) -> int:
        """Per-example token capacity of one expert (Switch C)."""
        import math
        return max(1, math.ceil(self.tokens / self.n_experts
                                * self.capacity_factor))

    @property
    def mlp_width(self) -> int:
        return self.width * self.mlp_ratio


Config = ViTConfig  # uniform family API (models/__init__.py::family)

PRESETS = {
    # matches models/train.py defaults — train small, serve small
    "small": dict(image_size=64, patch=16, width=256, depth=4, heads=4),
    "full": {},  # the dataclass defaults: 224px, width 384, depth 6
    # Switch-MoE variant of 'small' (4 experts, top-1) — the expert-
    # parallel serving preset; ships trained (AVD_DETECTOR_PRESET=moe_small)
    "moe_small": dict(image_size=64, patch=16, width=256, depth=4,
                      heads=4, n_experts=4),
}


def make_config(preset: str = "full", **over) -> "ViTConfig":
    if preset not in PRESETS:
        raise ValueError(f"unknown ViT preset {preset!r}; "
                         f"choose from {sorted(PRESETS)}")
    kw = dict(PRESETS[preset])
    kw.update(over)
    return ViTConfig(**kw)


# Partition specs per parameter path — the declarative TP plan.
# 'model' shards attention heads / mlp hidden; everything else replicates.
def param_specs(cfg: ViTConfig) -> Dict[str, Any]:
    layer = {
        "ln1_scale": P(), "ln1_bias": P(),
        "qkv_w": P(None, "model"), "qkv_b": P("model"),
        "proj_w": P("model", None), "proj_b": P(),
        "ln2_scale": P(), "ln2_bias": P(),
    }
    if cfg.n_experts:
        # expert parallelism: the leading expert axis shards over 'model'
        # (router replicates); the combine einsum contracts the sharded
        # axis, so GSPMD inserts the psum/all-to-alls
        layer.update({
            "router_w": P(),
            "moe_in_w": P("model", None, None), "moe_in_b": P("model", None),
            "moe_out_w": P("model", None, None),
            "moe_out_b": P("model", None),
        })
    else:
        layer.update({
            "mlp_in_w": P(None, "model"), "mlp_in_b": P("model"),
            "mlp_out_w": P("model", None), "mlp_out_b": P(),
        })
    return {
        "patch_w": P(), "patch_b": P(),
        "pos_emb": P(), "cls_tok": P(),
        "layers": [dict(layer) for _ in range(cfg.depth)],
        "ln_f_scale": P(), "ln_f_bias": P(),
        "head_w": P(), "head_b": P(),
    }


def init_params(key: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    """f32 parameter pytree."""
    k = jax.random.split(key, 4 + cfg.depth)
    d = cfg.width
    patch_dim = cfg.patch * cfg.patch * 3

    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                * (1.0 / np.sqrt(fan_in)))

    params: Dict[str, Any] = {
        "patch_w": dense(k[0], patch_dim, (patch_dim, d)),
        "patch_b": jnp.zeros((d,), jnp.float32),
        "pos_emb": jax.random.normal(k[1], (cfg.tokens, d),
                                     jnp.float32) * 0.02,
        "cls_tok": jax.random.normal(k[2], (d,), jnp.float32) * 0.02,
        "layers": [],
        "ln_f_scale": jnp.ones((d,), jnp.float32),
        "ln_f_bias": jnp.zeros((d,), jnp.float32),
        "head_w": dense(k[3], d, (d, cfg.n_classes)),
        "head_b": jnp.zeros((cfg.n_classes,), jnp.float32),
    }
    for i in range(cfg.depth):
        lk = jax.random.split(k[4 + i], 5)
        lp = {
            "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
            "qkv_w": dense(lk[0], d, (d, 3 * d)),
            "qkv_b": jnp.zeros((3 * d,)),
            "proj_w": dense(lk[1], d, (d, d)),
            "proj_b": jnp.zeros((d,)),
            "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
        }
        if cfg.n_experts:
            e, hd = cfg.n_experts, cfg.mlp_width
            lp.update({
                "router_w": dense(lk[4], d, (d, e)),
                "moe_in_w": (jax.random.normal(lk[2], (e, d, hd),
                                               jnp.float32)
                             * (1.0 / np.sqrt(d))),
                "moe_in_b": jnp.zeros((e, hd,), jnp.float32),
                "moe_out_w": (jax.random.normal(lk[3], (e, hd, d),
                                                jnp.float32)
                              * (1.0 / np.sqrt(hd))),
                "moe_out_b": jnp.zeros((e, d), jnp.float32),
            })
        else:
            lp.update({
                "mlp_in_w": dense(lk[2], d, (d, cfg.mlp_width)),
                "mlp_in_b": jnp.zeros((cfg.mlp_width,)),
                "mlp_out_w": dense(lk[3], cfg.mlp_width,
                                   (cfg.mlp_width, d)),
                "mlp_out_b": jnp.zeros((d,)),
            })
        params["layers"].append(lp)
    return params


def _ln(x, scale, bias, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + eps)) * scale + bias


def _constrain(x, spec: Optional[P]):
    if spec is None:
        return x
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except ValueError:
        return x  # no mesh in context (single-chip path)


def patchify(frames: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] → [B, T, patch*patch*3]."""
    b, h, w, c = frames.shape
    x = frames.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // patch) * (w // patch), patch * patch * c)


def embed(params: Dict[str, Any], frames: jnp.ndarray,
          cfg: ViTConfig) -> jnp.ndarray:
    """[B, H, W, 3] → [B, T, width] bf16 token stream (patchify + cls +
    positional)."""
    x = patchify(frames.astype(jnp.bfloat16), cfg.patch)
    x = x @ params["patch_w"].astype(jnp.bfloat16) + \
        params["patch_b"].astype(jnp.bfloat16)
    cls = jnp.broadcast_to(params["cls_tok"].astype(jnp.bfloat16),
                           (x.shape[0], 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["pos_emb"].astype(jnp.bfloat16)[None]


# Snap-to-grid routing granularity (bins of 1/_ROUTER_GRID in logit
# space) — see the comment in _moe_mlp.  Coarser bins are MORE stable
# across layouts (fewer edge-band logits) at the cost of coarser
# decisions for sub-delta gaps, which softmax barely distinguishes anyway.
_ROUTER_GRID = 4.0


def _router_features(params: Dict[str, Any], frames: jnp.ndarray,
                     cfg: ViTConfig) -> jnp.ndarray:
    """Layout-stable pre-gating features for MoE routing: the embedding
    recomputed in f32 END-TO-END (same parameters), through a
    parameter-free LN.

    The serving embedding is bf16 (MXU path), and a bf16 matmul's
    accumulation order varies between compiled programs/layouts — ~5e-3
    logit noise, enough to flip a discrete top-1 decision on near-tie
    tokens.  In f32 the reduction-order noise is ~1e-7, six orders of
    magnitude below the routing grid (1/_ROUTER_GRID), so the snapped
    argmax in ``_moe_mlp`` is layout- and program-stable in practice
    (asserted exactly by tests/test_moe.py::test_moe_routing_is_layout_
    stable).  Cost: one extra small f32 matmul per forward.
    """
    x = patchify(frames.astype(jnp.float32), cfg.patch)
    x = x @ params["patch_w"] + params["patch_b"]
    cls = jnp.broadcast_to(params["cls_tok"], (x.shape[0], 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"][None]
    return _ln(x, jnp.float32(1.0), jnp.float32(0.0))


def _moe_mlp(h: jnp.ndarray, lp: Dict[str, Any], cfg: ViTConfig, ap,
             router_x: Optional[jnp.ndarray] = None):
    """Switch-style top-1 MoE MLP over per-example token groups.

    ``h``: [B, T, d] bf16 (post-LN).  Returns ([B, T, d] bf16, aux)
    where ``aux`` is the Switch load-balancing loss (≈1 when balanced).
    Tokens beyond an expert's capacity are dropped (their MLP delta is
    zero; the residual connection passes them through) — standard
    Switch semantics keeping every shape static for XLA.  The expert
    axis of the weights is sharded over 'model' (param_specs); the
    dispatch/combine einsums contract it, so GSPMD places the experts'
    FLOPs on their owners and inserts the collectives.

    ``router_x`` is the PRE-GATING input: layout-stable f32 routing
    features computed once per forward (``_router_features`` — the
    embedding recomputed in f32).  Routing from the post-attention ``h``
    instead (the ``None`` fallback, used by direct unit-test calls) is
    classic per-layer Switch routing, but h carries ~1e-2 bf16
    reduction-order noise between layouts, and a discrete top-1 decision
    turns that epsilon into an O(1) output delta on near-tie tokens.
    Pre-gating makes EP/TP parity exact on the routing decision;
    per-layer router weights keep layers' assignments independent.
    """
    E, C = cfg.n_experts, cfg.expert_capacity
    rx = h.astype(jnp.float32) if router_x is None else router_x
    logits = rx @ lp["router_w"]                       # [B, T, E] f32
    gate = jax.nn.softmax(logits, axis=-1)
    # Second line of defense: snap the f32 logits to a coarse grid before
    # the argmax, so residual cross-layout noise (if any platform breaks
    # the embedding's bitwise stability) collapses near-ties into EXACT
    # ties, which argmax breaks deterministically (lowest expert index)
    # on every layout.  The gradient path (gate softmax) uses the
    # unquantized logits — training numerics are untouched.
    eidx = jnp.argmax(jnp.round(logits * _ROUTER_GRID), axis=-1)  # [B, T]
    onehot = jax.nn.one_hot(eidx, E, dtype=jnp.float32)
    gateval = jnp.sum(gate * onehot, axis=-1)          # [B, T]
    # position of each token within its expert's per-example queue
    pos = jnp.cumsum(onehot, axis=1) * onehot          # 1-based
    keep = (pos > 0) & (pos <= C)
    slot = jnp.clip(pos - 1, 0, C - 1).astype(jnp.int32)
    slot1h = jax.nn.one_hot(jnp.sum(slot * onehot.astype(jnp.int32),
                                    axis=-1), C, dtype=jnp.float32)
    disp = (onehot * keep.astype(jnp.float32))[..., None] * slot1h[:, :, None, :]
    # disp: [B, T, E, C] 0/1 dispatch tensor; combine adds the gate value
    comb = disp * gateval[..., None, None]

    xin = jnp.einsum("btec,btd->becd", disp.astype(jnp.bfloat16), h)
    xin = ap(xin, P("data", "model", None, None))
    z = jnp.einsum("becd,edh->bech", xin,
                   lp["moe_in_w"].astype(jnp.bfloat16))
    z = jax.nn.gelu(z + lp["moe_in_b"].astype(jnp.bfloat16)[None, :, None])
    z = jnp.einsum("bech,ehd->becd", z,
                   lp["moe_out_w"].astype(jnp.bfloat16))
    z = z + lp["moe_out_b"].astype(jnp.bfloat16)[None, :, None]
    y = jnp.einsum("btec,becd->btd", comb.astype(jnp.bfloat16), z)

    # Switch aux loss: E · Σ_e frac_tokens_e · mean_gate_e
    frac = jnp.mean(onehot, axis=1)                    # [B, E]
    mean_gate = jnp.mean(gate, axis=1)                 # [B, E]
    aux = E * jnp.mean(jnp.sum(frac * mean_gate, axis=-1))
    return y, aux


def block_forward_aux(x: jnp.ndarray, lp: Dict[str, Any], cfg: ViTConfig,
                      ap=lambda x, s: x,
                      res_spec: P = P("data", None, None),
                      router_x: Optional[jnp.ndarray] = None):
    """One transformer block on the bf16 residual stream ``x``
    ([B, T, width]) → ``(x', aux)`` where ``aux`` is the MoE
    load-balancing loss (0.0 for dense layers); ``ap`` injects GSPMD
    activation constraints.  ``router_x`` is the layout-stable
    pre-gating input for MoE layers (see ``_moe_mlp``).

    ``res_spec`` is the residual stream's layout between the TP regions:
    the default replicates tokens (classic Megatron TP, all-reduce on
    exit); ``P("data", "model", None)`` gives Megatron-style sequence
    parallelism — the LN/residual work shards over tokens and GSPMD
    lowers the exits to reduce-scatter + the entries to all-gather,
    cutting both the replicated-activation memory and the collective
    volume (rs+ag moves the same bytes as one all-reduce but each half
    overlaps with its adjacent matmul).
    """
    # --- attention ---
    # named_scope: annotates the HLO op metadata only (zero runtime
    # cost) so jax.profiler traces bucket cleanly in
    # tools/profile_detector.py (VERDICT r4 #3)
    with jax.named_scope("attn_ln"):
        h = _ln(x.astype(jnp.float32), lp["ln1_scale"],
                lp["ln1_bias"]).astype(jnp.bfloat16)
    with jax.named_scope("attn_qkv"):
        qkv = h @ lp["qkv_w"].astype(jnp.bfloat16) + \
            lp["qkv_b"].astype(jnp.bfloat16)
    qkv = ap(qkv, P("data", None, "model"))
    b, t, _ = qkv.shape
    qkv = qkv.reshape(b, t, 3, cfg.heads, cfg.head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if cfg.fused_attn:
        from avd_tpu.ops.pallas import attention as pattn
        with jax.named_scope("attn_core_fused"):
            o = pattn.attention(q, k, v)            # [b, t, width] bf16
    else:
        with jax.named_scope("attn_core"):
            att = jnp.einsum("bthd,bshd->bhts", q, k,
                             preferred_element_type=jnp.float32)
            att = jax.nn.softmax(att / np.sqrt(cfg.head_dim), axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", att.astype(jnp.bfloat16), v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(b, t, cfg.width).astype(jnp.bfloat16)
    with jax.named_scope("attn_proj"):
        o = o @ lp["proj_w"].astype(jnp.bfloat16) + \
            lp["proj_b"].astype(jnp.bfloat16)
    x = x + ap(o, res_spec)

    # --- mlp (dense or mixture-of-experts) ---
    with jax.named_scope("mlp_ln"):
        h = _ln(x.astype(jnp.float32), lp["ln2_scale"],
                lp["ln2_bias"]).astype(jnp.bfloat16)
    if "router_w" in lp:
        with jax.named_scope("moe_mlp"):
            y, aux = _moe_mlp(h, lp, cfg, ap, router_x)
        return x + ap(y, res_spec), aux
    with jax.named_scope("mlp"):
        h = h @ lp["mlp_in_w"].astype(jnp.bfloat16) + \
            lp["mlp_in_b"].astype(jnp.bfloat16)
        h = ap(h, P("data", None, "model"))
        h = jax.nn.gelu(h)
        h = h @ lp["mlp_out_w"].astype(jnp.bfloat16) + \
            lp["mlp_out_b"].astype(jnp.bfloat16)
    return x + ap(h, res_spec), jnp.float32(0.0)


def block_forward(x: jnp.ndarray, lp: Dict[str, Any], cfg: ViTConfig,
                  ap=lambda x, s: x,
                  res_spec: P = P("data", None, None),
                  router_x: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """block_forward_aux without the aux output (dense/serving callers)."""
    return block_forward_aux(x, lp, cfg, ap, res_spec, router_x)[0]


def block_forward_tp(x: jnp.ndarray, lp: Dict[str, Any], cfg: ViTConfig,
                     axis: str = "model") -> jnp.ndarray:
    """One transformer block with MANUAL Megatron-TP collectives, for use
    inside ``shard_map`` where GSPMD constraints don't apply — e.g.
    composed with the GPipe pipeline (forward_pipelined(tp=True), the
    dp×pp×tp 3-D configuration).

    The caller hands in this device's weight shards (qkv/mlp-in
    column-sliced over ``axis`` → local heads / local hidden; proj/mlp-out
    row-sliced); the residual stream ``x`` is replicated over ``axis``.
    Each TP region exits through one ``psum`` over ``axis`` — the same
    collective GSPMD inserts on the annotated path (block_forward), so the
    two are numerically equivalent for dense configs.

    IMPORTANT: the stock qkv_w column layout is ``(3, heads, head_dim)``
    (q/k/v outermost), so a contiguous column slice cuts ACROSS the
    q/k/v boundary.  This function expects qkv_w/qkv_b columns permuted
    to ``(heads, 3, head_dim)`` — each shard then holds whole heads —
    which ``_tp_shuffle_qkv`` (used by forward_pipelined) performs.
    """
    # local head count from the shard's static shape: qkv_w is [d, 3·d/m]
    local_width = lp["qkv_w"].shape[1] // 3
    local_heads = local_width // cfg.head_dim

    h = _ln(x.astype(jnp.float32), lp["ln1_scale"],
            lp["ln1_bias"]).astype(jnp.bfloat16)
    qkv = h @ lp["qkv_w"].astype(jnp.bfloat16) + \
        lp["qkv_b"].astype(jnp.bfloat16)
    b, t, _ = qkv.shape
    # columns arrive head-major (see docstring): (local_heads, 3, head_dim)
    qkv = qkv.reshape(b, t, local_heads, 3, cfg.head_dim)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    att = jnp.einsum("bthd,bshd->bhts", q, k,
                     preferred_element_type=jnp.float32)
    att = jax.nn.softmax(att / np.sqrt(cfg.head_dim), axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", att.astype(jnp.bfloat16), v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(b, t, local_width).astype(jnp.bfloat16)
    o = jax.lax.psum(o @ lp["proj_w"].astype(jnp.bfloat16), axis)
    x = x + o + lp["proj_b"].astype(jnp.bfloat16)

    h = _ln(x.astype(jnp.float32), lp["ln2_scale"],
            lp["ln2_bias"]).astype(jnp.bfloat16)
    h = h @ lp["mlp_in_w"].astype(jnp.bfloat16) + \
        lp["mlp_in_b"].astype(jnp.bfloat16)
    h = jax.nn.gelu(h)
    h = jax.lax.psum(h @ lp["mlp_out_w"].astype(jnp.bfloat16), axis)
    return x + h + lp["mlp_out_b"].astype(jnp.bfloat16)


def _tp_shuffle_qkv(layers, cfg: ViTConfig):
    """Permute each layer's qkv_w/qkv_b columns from ``(3, heads,
    head_dim)`` to ``(heads, 3, head_dim)`` so a contiguous column shard
    over 'model' holds whole heads — the layout block_forward_tp expects.
    (GSPMD's sharded block_forward never needs this: it shards the
    logical array, not contiguous slices.)"""
    idx = np.arange(3 * cfg.width).reshape(3, cfg.heads, cfg.head_dim)
    idx = idx.transpose(1, 0, 2).reshape(-1)
    return [dict(lp, qkv_w=lp["qkv_w"][:, idx], qkv_b=lp["qkv_b"][idx])
            for lp in layers]


def head(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """Final LN on the cls token → f32 logits."""
    x = _ln(x.astype(jnp.float32), params["ln_f_scale"], params["ln_f_bias"])
    return x[:, 0] @ params["head_w"] + params["head_b"]


def forward(params: Dict[str, Any], frames: jnp.ndarray, cfg: ViTConfig,
            sharded: bool = False, seq_sharded: bool = False,
            with_aux: bool = False):
    """ViT forward: [B, H, W, 3] float in [0,1] → [B, n_classes] f32 logits.

    ``sharded`` adds GSPMD activation constraints (dp over batch, tp over
    hidden) for the multi-chip path; ``seq_sharded`` additionally shards
    the residual stream's token axis over 'model' between the TP regions
    (Megatron sequence parallelism — see block_forward's ``res_spec``);
    ``with_aux`` returns ``(logits, moe_aux_loss)`` for MoE training.
    """
    ap = functools.partial(_constrain) if sharded else (lambda x, s: x)
    res_spec = (P("data", "model", None) if seq_sharded
                else P("data", None, None))
    with jax.named_scope("patch_embed"):
        x = embed(params, frames, cfg)
    x = ap(x, res_spec)

    # Pre-gating features for MoE routing, computed ONCE in f32 so every
    # layer's top-1 routing decision is layout-stable (see
    # _router_features / _moe_mlp).
    router_x = (ap(_router_features(params, frames, cfg), res_spec)
                if cfg.n_experts else None)

    def body(x, lp):
        return block_forward_aux(x, lp, cfg, ap, res_spec, router_x)

    if cfg.remat:
        body = jax.checkpoint(body)
    if cfg.scan:
        from avd_tpu.parallel import pipeline as pl
        stacked = pl.stack_layers(params["layers"])
        x, auxs = jax.lax.scan(body, x, stacked)
        aux_total = jnp.sum(auxs)
    else:
        aux_total = jnp.float32(0.0)
        for lp in params["layers"]:
            x, aux = body(x, lp)
            aux_total = aux_total + aux
    with jax.named_scope("head"):
        logits = head(params, x)
    return (logits, aux_total) if with_aux else logits


def forward_pipelined(params: Dict[str, Any], frames: jnp.ndarray,
                      cfg: ViTConfig, mesh, n_micro: int = 0,
                      tp: bool = False) -> jnp.ndarray:
    """Pipeline-parallel ViT forward over the mesh's ``stage`` axis
    (optionally × ``data``): the layer stack is sharded per stage and
    microbatches stream through a GPipe ppermute ring
    (parallel/pipeline.py).  Numerically equivalent to ``forward``
    (same blocks, same bf16 stream); embed/head run replicated outside
    the pipeline.

    ``n_micro`` defaults to the stage count (caller raises it to shrink
    the (S-1)/(n_micro+S-1) bubble); the batch must divide by it, and
    each microbatch by the mesh's ``data`` axis when present.

    ``tp=True`` additionally tensor-shards every stage's blocks over the
    mesh's ``model`` axis (the dp×pp×tp 3-D configuration): each layer's
    qkv/mlp-in weights are column-sliced and proj/mlp-out row-sliced by
    shard_map's in_specs, and the stage body runs ``block_forward_tp`` —
    manual Megatron collectives (one psum over 'model' per TP region),
    since GSPMD annotations don't apply inside shard_map.  Dense configs
    only; heads and mlp width must divide by the 'model' axis size.
    """
    from jax import shard_map

    from avd_tpu.parallel import pipeline as pl

    n_stages = mesh.shape["stage"]
    if cfg.depth % n_stages:
        raise ValueError(f"depth {cfg.depth} not divisible by "
                         f"{n_stages} stages")
    n_micro = n_micro or n_stages
    B = frames.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")

    x = embed(params, frames, cfg)
    xs = x.reshape(n_micro, B // n_micro, cfg.tokens, cfg.width)
    layers = params["layers"]

    if cfg.n_experts and not tp:
        # MoE stages pre-gate on the same layout-stable f32 features as
        # `forward` (see _router_features); the features ride the GPipe
        # ring as a second pytree leaf alongside each microbatch, so
        # every stage's routers read them without recomputation
        rx = _router_features(params, frames, cfg)
        rxs = rx.reshape(n_micro, B // n_micro, cfg.tokens, cfg.width)
        pspec = P("stage")
        xspec = P(None, "data") if "data" in mesh.axis_names else P(None)

        def moe_stage_fn(sp, xm):
            h, r = xm

            def body(hc, lp):
                return block_forward(hc, lp, cfg, router_x=r), None

            y, _ = jax.lax.scan(body, h, sp)
            return (y, r)

        stacked = pl.stack_layers(layers)
        run = shard_map(
            lambda sp, x: pl.gpipe(moe_stage_fn, sp, x, n_stages),
            mesh=mesh, in_specs=(pspec, (xspec, xspec)),
            out_specs=(xspec, xspec))
        ys, _ = run(stacked, (xs, rxs))
        return head(params, ys.reshape(B, cfg.tokens, cfg.width))

    if tp:
        if "model" not in mesh.axis_names:
            raise ValueError("tp=True needs a 'model' mesh axis")
        if cfg.n_experts:
            raise ValueError("tp=True composes dense blocks only "
                             "(block_forward_tp); MoE uses the GSPMD path")
        m = mesh.shape["model"]
        if cfg.heads % m or cfg.mlp_width % m:
            raise ValueError(f"heads {cfg.heads} / mlp {cfg.mlp_width} "
                             f"not divisible by model axis {m}")
        # per-leaf stacked specs: prepend the stage axis to each layer
        # leaf's TP spec (P(None,'model') → P('stage',None,'model'), …)
        pspec = jax.tree_util.tree_map(
            lambda s: P("stage", *s), param_specs(cfg)["layers"][0],
            is_leaf=lambda s: isinstance(s, P))
        layers = _tp_shuffle_qkv(layers, cfg)

        def stage_fn(sp, xm):
            return pl.scan_layers(
                lambda h, lp: block_forward_tp(h, lp, cfg), sp, xm)
    else:
        pspec = P("stage")

        def stage_fn(sp, xm):
            return pl.scan_layers(
                lambda h, lp: block_forward(h, lp, cfg), sp, xm)

    stacked = pl.stack_layers(layers)
    xspec = P(None, "data") if "data" in mesh.axis_names else P(None)
    run = shard_map(
        lambda sp, x: pl.gpipe(stage_fn, sp, x, n_stages),
        mesh=mesh, in_specs=(pspec, xspec), out_specs=xspec)
    ys = run(stacked, xs)
    return head(params, ys.reshape(B, cfg.tokens, cfg.width))


def _bce(z: jnp.ndarray, labels) -> jnp.ndarray:
    """Numerically stable sigmoid BCE-with-logits, mean over the batch."""
    z = z.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return jnp.mean(per)


def _logit_l2(z: jnp.ndarray, coef: float) -> jnp.ndarray:
    """Score-distribution regularizer: coef * mean(z^2) on the raw
    logits.  BCE alone pushes separable training families to unbounded
    margins, so an UNSEEN family's logits land wherever the features
    extrapolate — typically clustered mid-scale, where the 0.5 threshold
    misclassifies even at high AUC (BASELINE.md round 3: flagship
    unseen acc 0.592 at AUC 0.981).  Bounding the training-family logit
    scale keeps decision margins comparable across families, the same
    mechanism as logit normalization (Wei et al. 2022) adapted to a
    single-logit binary head."""
    return coef * jnp.mean(jnp.square(z.astype(jnp.float32)))


def loss_fn(params, frames, labels, cfg: ViTConfig,
            sharded: bool = False, logit_l2: float = 0.0) -> jnp.ndarray:
    """Sigmoid BCE in f32 (labels: [B] in {0,1}); MoE configs add the
    Switch load-balancing aux loss (coefficient 0.01); ``logit_l2``
    adds the score-scale regularizer (_logit_l2)."""
    out, aux = forward(params, frames, cfg, sharded=sharded, with_aux=True)
    z = out[:, 0]
    loss = _bce(z, labels)
    if cfg.n_experts:
        loss = loss + 0.01 * aux
    if logit_l2:
        loss = loss + _logit_l2(z, logit_l2)
    return loss


def make_train_step(cfg, optimizer, sharded: bool = False, loss=None,
                    logit_l2: float = 0.0):
    """(params, opt_state, frames, labels) → (params, opt_state, loss).

    ``loss`` defaults to this module's ``loss_fn``; the CNN family passes
    its own (same signature) so both share one optimizer-step body."""
    loss = loss or loss_fn

    def step(params, opt_state, frames, labels):
        lval, grads = jax.value_and_grad(loss)(params, frames, labels,
                                               cfg, sharded, logit_l2)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    return step


def make_pp_train_step(cfg: ViTConfig, optimizer, mesh, n_micro: int = 0,
                       tp: bool = False):
    """Training step whose forward runs pipeline-parallel over the
    mesh's 'stage' axis (forward_pipelined); gradients flow back through
    the GPipe scan (ppermute transposes to the reverse ring).  MoE aux
    loss is not collected on the pipelined path (dense configs).
    ``tp=True`` additionally tensor-shards each stage's blocks over the
    'model' axis (dp×pp×tp — forward_pipelined's manual-TP path)."""

    def pp_loss(params, frames, labels):
        logits = forward_pipelined(params, frames, cfg, mesh, n_micro,
                                   tp=tp)
        return _bce(logits[:, 0], labels)

    def step(params, opt_state, frames, labels):
        loss, grads = jax.value_and_grad(pp_loss)(params, frames, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_optimizer(lr: float = 3e-4, steps: int = 0, warmup: int = 0,
                   schedule: str = "const", grad_clip: float = 0.0,
                   accum: int = 1):
    """AdamW with the standard production-trainer controls, all
    default-off so existing recipes/checkpoints are unchanged:

    * ``schedule='cosine'`` — linear warmup over ``warmup`` steps then
      cosine decay to 1% of ``lr`` at ``steps`` (requires ``steps``);
      ``'const'`` with ``warmup`` > 0 warms up linearly then holds.
    * ``grad_clip`` — global-norm clipping BEFORE the Adam statistics
      (the conventional order: a spike shouldn't poison the moments).
    * ``accum`` — gradient accumulation via optax.MultiSteps: ``accum``
      micro-batch grads are averaged before one optimizer step, so
      accum=K at batch B steps exactly like batch K*B (test_train.py).
      Composes with ZeRO-1 (parallel/zero.py): the accumulator pytree
      mirrors the parameters, so its leaves inherit the data-sharded
      moment specs and the accumulation buffers shard too (ZeRO-2-style
      gradient-memory scaling for free).
    """
    import optax
    if schedule not in ("const", "cosine"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if schedule == "cosine":
        if steps <= 0:
            raise ValueError("schedule='cosine' needs total steps")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=steps, end_value=lr * 0.01)
    elif warmup > 0:
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.constant_schedule(lr)], [warmup])
    tx = optax.adamw(lr, weight_decay=1e-4)
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def interpolate_pos_emb(params: Dict[str, Any],
                        cfg_new: ViTConfig) -> Dict[str, Any]:
    """Adapt a checkpoint trained at one resolution to ``cfg_new``'s
    token grid by bilinearly resizing the positional-embedding table
    (the standard ViT resolution-transfer recipe — DeiT/ViT fine-tune
    at higher res this way).  The cls token's embedding is kept; the
    patch grid part is reshaped to [g, g, d], resized to the new grid,
    and flattened back.  All other parameters are resolution-independent
    (patchify keeps the same patch size), so this is the ONLY change
    needed to serve/fine-tune a 128px-trained model at 224px."""
    pos = np.asarray(params["pos_emb"], np.float32)
    t_old = pos.shape[0] - 1
    g_old = int(round(t_old ** 0.5))
    g_new = cfg_new.image_size // cfg_new.patch
    if g_old * g_old != t_old:
        raise ValueError(f"pos_emb grid {t_old} is not square")
    if g_new * g_new + 1 == pos.shape[0]:
        return params  # already at the target grid
    grid = pos[1:].reshape(g_old, g_old, pos.shape[1])
    resized = jax.image.resize(jnp.asarray(grid),
                               (g_new, g_new, pos.shape[1]),
                               method="bilinear")
    new_pos = jnp.concatenate(
        [jnp.asarray(pos[:1]),
         jnp.asarray(resized).reshape(g_new * g_new, pos.shape[1])])
    out = dict(params)
    out["pos_emb"] = new_pos
    return out


# ---------------------------------------------------------------------------
# checkpointing (orbax; SURVEY.md §5 — weight loading only, the service is
# stateless)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, params) -> None:
    import os
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    # orbax/tensorstore requires absolute paths
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, like) -> Any:
    import os
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), like)


def load_checkpoint_sharded(path: str, like, mesh, specs) -> Any:
    """Restore a checkpoint directly into mesh-sharded device arrays.

    ``like`` is a parameter pytree (or matching ShapeDtypeStructs) and
    ``specs`` the PartitionSpec pytree (``param_specs``).  Each leaf is
    restored straight to its shards' owners — no replicated host copy,
    so resume works for models larger than one host/chip.  Works for
    any family/config whose specs match the saved tree (TP, EP, PP
    stacks alike).
    """
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding

    flat_like, tree = jax.tree_util.tree_flatten(like)
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    # read shape/dtype attributes directly: leaves may be numpy arrays,
    # jax arrays, or ShapeDtypeStructs, and jnp.asarray would both
    # reject the latter and device-transfer concrete hosts leaves
    abstract = tree.unflatten([
        jax.ShapeDtypeStruct(x.shape, x.dtype,
                             sharding=NamedSharding(mesh, s))
        for x, s in zip(flat_like, flat_specs)])
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, abstract)
