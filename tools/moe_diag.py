"""MoE routing diagnostic (VERDICT round-3 #6).

``moe_small`` ships as the weakest transfer artifact (unseen-family AUC
0.820 vs cnn_small 0.985 / detector_full 0.981, BASELINE.md round 3).
Two hypotheses:

* **routing-inherent** — Switch top-1 routing degrades on OOD tokens:
  unseen-family tokens concentrate on few experts, blow per-expert
  capacity, and get DROPPED (their MLP delta zeroed, residual
  pass-through), so the effective network is shallower exactly on the
  inputs that need it;
* **undertraining / curriculum** — the router behaves the same in- and
  out-of-family and the gap is just the 2-family curriculum (fixable by
  the round-4 retrain).

Because routing is PRE-GATED on layout-stable f32 embedding features
(detector._router_features — the same ``router_x`` feeds every layer),
the full routing decision per layer is ``argmax(router_x @ router_w_l)``
— computable without running attention.  This tool loads a shipped MoE
checkpoint and reports, per layer and per family draw:

* per-expert token fractions (utilization skew),
* capacity-drop rate (tokens beyond Switch capacity C → zeroed delta),
* mean top-1 gate value (router confidence),

for the checkpoint's TRAINING families vs the held-out transfer family,
side by side — then runs the CAUSAL test: re-evaluating the same
weights at higher ``capacity_factor`` (weights are capacity-independent;
cf=4 makes C=T, so nothing can be dropped).  If unseen AUC does not
recover with drops removed, the drops are a symptom, not the cause, and
the gap is what the experts LEARNED (curriculum) — fixable by retrain,
not by a routing change.

Measured on the round-3 ``moe_small`` (2026-08-19): unseen tokens DO
skew (layer-2 frac 0.94 on one expert) and drop more (0.36 vs 0.22
mean) — but cf 1.25→2.0→4.0 moves unseen AUC only 0.817→0.828→0.802,
i.e. restoring the dropped tokens' compute does NOT close the gap.
Verdict: curriculum, not Switch routing.

Usage: python tools/moe_diag.py [--ckpt DIR] [--n 512] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def routing_stats(params, cfg, frames: np.ndarray):
    """Per-layer routing statistics for a frame batch.

    Returns a list (one dict per MoE layer) of expert fractions,
    capacity-drop rate and mean kept top-1 gate value, plus the final
    per-frame probabilities from the full forward (for the AUC line).
    """
    import jax
    import jax.numpy as jnp

    from avd_tpu.models import detector

    @jax.jit
    def _route(p, fb):
        rx = detector._router_features(p, fb, cfg)      # [B, T, d] f32
        E, C = cfg.n_experts, cfg.expert_capacity
        out = []
        for lp in p["layers"]:
            logits = rx @ lp["router_w"]                # [B, T, E]
            gate = jax.nn.softmax(logits, axis=-1)
            eidx = jnp.argmax(jnp.round(logits * detector._ROUTER_GRID),
                              axis=-1)
            onehot = jax.nn.one_hot(eidx, E, dtype=jnp.float32)
            pos = jnp.cumsum(onehot, axis=1) * onehot   # 1-based queue pos
            kept = (pos > 0) & (pos <= C)
            gateval = jnp.sum(gate * onehot, axis=-1)   # [B, T]
            out.append({
                "frac": jnp.mean(onehot, axis=(0, 1)),          # [E]
                "drop": 1.0 - jnp.sum(kept) / (onehot.shape[0]
                                               * onehot.shape[1]),
                "gate_top1": jnp.mean(gateval),
            })
        probs = jax.nn.sigmoid(
            detector.forward(p, fb, cfg)[:, 0].astype(jnp.float32))
        return out, probs

    stats, probs = _route(params, jnp.asarray(frames))
    return ([{k: np.asarray(v).tolist() for k, v in s.items()}
             for s in stats], np.asarray(probs))


def family_report(params, cfg, families, n: int, seed: int):
    from avd_tpu.models.train import _acc_auc, synthetic_batch
    rng = np.random.default_rng(seed)
    agg, probs_all, y_all = None, [], []
    for _ in range(max(1, n // 64)):
        frames, labels = synthetic_batch(rng, 64, cfg.image_size, families)
        stats, probs = routing_stats(params, cfg, frames)
        probs_all.append(probs)
        y_all.append(labels)
        if agg is None:
            agg = stats
        else:
            for a, s in zip(agg, stats):
                a["frac"] = [x + y for x, y in zip(a["frac"], s["frac"])]
                a["drop"] += s["drop"]
                a["gate_top1"] += s["gate_top1"]
    k = max(1, n // 64)
    for a in agg:
        a["frac"] = [x / k for x in a["frac"]]
        a["drop"] /= k
        a["gate_top1"] /= k
        # utilization skew: max/mean expert fraction (1.0 = perfectly even)
        a["skew"] = max(a["frac"]) * cfg.n_experts
    acc, auc = _acc_auc(np.concatenate(probs_all), np.concatenate(y_all))
    return {"layers": agg, "acc": acc, "auc": auc}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt", default=None,
                    help="MoE checkpoint dir (default: shipped moe_small)")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--out", default=None, help="JSON results file")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (leave the TPU to another job; the "
                         "axon plugin ignores JAX_PLATFORMS, so this must "
                         "be a config update)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from avd_tpu.models import detector
    from avd_tpu.models.train import HELDOUT_FAMILY

    ckpt = args.ckpt or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "avd_tpu", "models", "weights", "moe_small")
    ckpt = os.path.abspath(ckpt)
    cfg = detector.make_config("moe_small")
    params = detector.load_checkpoint(
        ckpt, detector.init_params(jax.random.PRNGKey(0), cfg))
    meta_path = os.path.join(ckpt, "train_meta.json")
    train_fams = ("blobs", "geometric")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            train_fams = tuple(json.load(f).get("families", train_fams))
    print(f"checkpoint {ckpt}  trained on {train_fams}  "
          f"E={cfg.n_experts} C={cfg.expert_capacity} "
          f"T={cfg.tokens}", flush=True)

    rows = {}
    for tag, fams in (("seen", train_fams), ("unseen", (HELDOUT_FAMILY,))):
        rows[tag] = family_report(params, cfg, fams, args.n, args.seed)
        print(f"{tag} ({','.join(fams)}): acc {rows[tag]['acc']:.3f} "
              f"auc {rows[tag]['auc']:.3f}", flush=True)

    # causal test: same weights, capacity drops progressively removed
    import dataclasses
    sweep = []
    for cf in (2.0, 4.0):
        c = dataclasses.replace(cfg, capacity_factor=cf)
        r = family_report(params, c, (HELDOUT_FAMILY,), args.n, args.seed)
        sweep.append({"capacity_factor": cf, "C": c.expert_capacity,
                      "unseen_acc": r["acc"], "unseen_auc": r["auc"],
                      "mean_drop": float(np.mean([u["drop"]
                                                  for u in r["layers"]]))})
        print(f"capacity_factor {cf} (C={c.expert_capacity}): unseen acc "
              f"{r['acc']:.3f} auc {r['auc']:.3f} "
              f"drop {sweep[-1]['mean_drop']:.3f}", flush=True)

    print("\n| layer | seen frac (per expert) | seen drop | seen gate "
          "| unseen frac | unseen drop | unseen gate |")
    print("|---|---|---|---|---|---|---|")
    for li, (s, u) in enumerate(zip(rows["seen"]["layers"],
                                    rows["unseen"]["layers"])):
        sf = "/".join(f"{x:.2f}" for x in s["frac"])
        uf = "/".join(f"{x:.2f}" for x in u["frac"])
        print(f"| {li} | {sf} | {s['drop']:.3f} | {s['gate_top1']:.2f} "
              f"| {uf} | {u['drop']:.3f} | {u['gate_top1']:.2f} |")

    seen_drop = float(np.mean([s["drop"] for s in rows["seen"]["layers"]]))
    uns_drop = float(np.mean([u["drop"] for u in rows["unseen"]["layers"]]))
    seen_skew = float(np.mean([s["skew"] for s in rows["seen"]["layers"]]))
    uns_skew = float(np.mean([u["skew"] for u in rows["unseen"]["layers"]]))
    skews = uns_drop > seen_drop * 1.5 + 0.02 or uns_skew > seen_skew * 1.25
    # drops are CAUSAL only if removing them recovers AUC materially
    best_nodrop = max(s["unseen_auc"] for s in sweep)
    causal = best_nodrop > rows["unseen"]["auc"] + 0.03
    if skews and causal:
        verdict = ("routing-inherent: OOD tokens skew/drop AND restoring "
                   "capacity recovers AUC — fix routing (capacity factor "
                   "or balance loss)")
    elif skews:
        verdict = ("OOD tokens skew and drop more, but removing drops "
                   f"(cf sweep, best AUC {best_nodrop:.3f}) does not "
                   "close the gap — the experts' learned features are the "
                   "limit: curriculum, not Switch routing")
    else:
        verdict = ("routing stable OOD: the transfer gap is curriculum, "
                   "not Switch routing")
    summary = {"ckpt": ckpt, "train_families": list(train_fams),
               "seen": rows["seen"], "unseen": rows["unseen"],
               "capacity_sweep": sweep,
               "mean_drop": {"seen": seen_drop, "unseen": uns_drop},
               "mean_skew": {"seen": seen_skew, "unseen": uns_skew},
               "verdict": verdict}
    print(f"\nmean drop seen {seen_drop:.3f} vs unseen {uns_drop:.3f}; "
          f"mean skew seen {seen_skew:.2f} vs unseen {uns_skew:.2f}")
    print(f"=> {verdict}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
