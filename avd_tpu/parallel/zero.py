"""ZeRO-1 optimizer-state sharding (Rajbhandari et al. 2019) — the
GSPMD/pjit way.

AdamW keeps two f32 moments per parameter: for a replicated (or only
TP-sharded) parameter tree the optimizer state costs 2× the parameter
memory on EVERY data-parallel device.  ZeRO stage 1 shards those moments
over the data axis: each device stores 1/|data| of every moment tensor,
updates its slice, and the parameter update is re-assembled.

On TPU we do NOT hand-roll the reduce-scatter/all-gather the way the
reference stack's DeepSpeed/NCCL implementations do (the reference
itself has no training at all — this subsystem is TPU-native framework
completeness, SURVEY §2.2/§5): we give the optimizer-state pytree
explicit ``NamedSharding``s whose free dimensions are sharded over
``data`` and jit the unchanged train step with those as in/out
shardings.  XLA then inserts the collectives — gradients arrive
reduce-scattered to each moment shard, the Adam update runs on 1/|data|
of the elements per device, and the parameter delta is all-gathered —
which is exactly the ZeRO-1 dataflow, chosen by the compiler and
overlapped with compute where profitable (scaling-book recipe: pick a
mesh, annotate shardings, let XLA place the collectives).

Matching is generic over the optimizer: the state pytree is walked by
path and any leaf whose path *suffix* equals a parameter's path (optax
moment trees mirror the parameter tree — e.g. ScaleByAdamState.mu) gets
that parameter's ZeRO spec; everything else (step counters, schedule
state) stays replicated.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def zero_spec(spec: P, shape: Tuple[int, ...], data_size: int,
              axis: str = "data") -> P:
    """Extend a parameter's (possibly TP-) PartitionSpec by sharding its
    largest still-free dimension over the data axis.

    A dimension is free when the spec names no mesh axis for it; the
    largest free dim divisible by ``data_size`` is sharded (ties break
    toward the leading dim).  If no free dim divides evenly the spec is
    returned unchanged — that moment stays replicated rather than padded
    (uneven shards would force XLA into masked updates)."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    if axis in entries:
        return spec  # already ZeRO'd (e.g. FSDP specs fed back in)
    best, best_dim = -1, -1
    for i, (e, n) in enumerate(zip(entries, shape)):
        if e is None and n % data_size == 0 and n > best:
            best, best_dim = n, i
    if best_dim < 0:
        return spec
    entries[best_dim] = axis
    return P(*entries)


def zero1_param_specs(params, specs, data_size: int,
                      axis: str = "data") -> Dict[Tuple, P]:
    """{flattened param path: ZeRO-extended spec} for every parameter."""
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    out = {}
    for (path, leaf), spec in zip(flat_p, flat_s):
        out[tuple(path)] = zero_spec(spec, leaf.shape, data_size, axis)
    return out


def zero1_state_shardings(opt_state, params, specs, mesh: Mesh,
                          axis: str = "data"):
    """A pytree of NamedShardings matching ``opt_state``: moment leaves
    (path suffix == a parameter path) get the parameter's ZeRO spec,
    everything else replicates."""
    by_path = zero1_param_specs(params, specs, mesh.shape[axis], axis)
    max_len = max((len(k) for k in by_path), default=0)

    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    shardings = []
    for path, leaf in flat:
        spec = P()
        t = tuple(path)
        for k in range(1, min(len(t), max_len) + 1):
            hit = by_path.get(t[-k:])
            if hit is not None and len(hit) <= getattr(leaf, "ndim", 0):
                spec = hit
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def fsdp_param_specs(params, specs, data_size: int, axis: str = "data"):
    """ZeRO-3/FSDP the GSPMD way: a specs pytree (same structure as
    ``params``) where every parameter's largest still-free dimension is
    sharded over the data axis on top of its TP spec.

    Jitting the UNCHANGED train step with these as the params' in/out
    shardings makes XLA all-gather each layer's weights just-in-time for
    its matmuls and reduce-scatter its gradients — the FSDP dataflow,
    scheduled by the compiler (prefetch/overlap where profitable)
    instead of hand-rolled hooks the way torch-FSDP does it.  Moments
    follow automatically: zero1_state_shardings maps each moment to its
    parameter's spec, so passing these specs shards the full ZeRO-3
    trio (params + grads-in-flight + optimizer state)."""
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    return jax.tree_util.tree_unflatten(
        treedef, [zero_spec(s, p.shape, data_size, axis)
                  for p, s in zip(flat_p, flat_s)])


def param_shardings(params, specs, mesh: Mesh):
    """NamedShardings for the parameter tree itself (TP specs as-is)."""
    return jax.tree_util.tree_map(
        lambda _, s: NamedSharding(mesh, s), params, specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_opt_state(opt_state, params, specs, mesh: Mesh,
                    axis: str = "data"):
    """Place an optimizer state on the mesh with ZeRO-1 shardings."""
    sh = zero1_state_shardings(opt_state, params, specs, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, opt_state, sh)


def zero1_jit_train_step(step_fn, params, opt_state, specs, mesh: Mesh,
                         axis: str = "data", batch_axis: str = "data"):
    """jit ``step_fn(params, opt_state, frames, labels) -> (params,
    opt_state, loss)`` with ZeRO-1 shardings pinned on the optimizer
    state (in AND out, so the moments never silently re-replicate across
    steps) and donation of the old params/state buffers."""
    p_sh = param_shardings(params, specs, mesh)
    s_sh = zero1_state_shardings(opt_state, params, specs, mesh, axis)
    b_sh = NamedSharding(mesh, P(batch_axis))
    return jax.jit(
        step_fn,
        in_shardings=(p_sh, s_sh, b_sh, b_sh),
        out_shardings=(p_sh, s_sh, None),
        donate_argnums=(0, 1))
