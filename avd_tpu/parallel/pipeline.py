"""Pipeline parallelism (GPipe schedule) over a ``stage`` mesh axis.

TPU-native design: the layer stack is sharded over the mesh's ``stage``
axis (each device holds ``depth/S`` layers of the stacked parameter
pytree), microbatches flow stage-to-stage over the ICI ring via
``jax.lax.ppermute`` inside a single ``lax.scan`` — one compiled
program, no host round trips, XLA overlaps the permute with the next
tick's compute.  The reference has no model at all (SURVEY §2.2 lists
every parallelism strategy as "absent → to be created"); this is the
framework's PP component for serving detector configurations whose
parameters (or activation footprint) outgrow one chip.

Schedule: plain GPipe over ``n_micro`` microbatches — tick ``t`` has
stage ``k`` processing microbatch ``t - k``; the pipeline drains after
``n_micro + S - 1`` ticks.  Bubble fraction ``(S-1)/(n_micro + S - 1)``;
callers pick ``n_micro >= S`` to amortize.  Backward works through the
same scan (ppermute's transpose is the reverse permute), so
``jax.grad`` of a pipelined forward is 1F1B-equivalent in cost.

Composes with data parallelism: run under ``shard_map`` on a
``(data, stage)`` mesh with the microbatch batch dim sharded over
``data`` — see ``models/detector.py::forward_pipelined``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def gpipe(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
          stage_params: Any, xs: jnp.ndarray, n_stages: int,
          axis: str = "stage") -> jnp.ndarray:
    """Run ``xs`` microbatches through the stage pipeline.

    Must be called inside ``shard_map`` over a mesh with axis ``axis`` of
    size ``n_stages``.

    Args:
        stage_fn: ``(stage_params, x) -> y`` — this device's slice of the
            network (e.g. a scan over its layers).  Shape-preserving.
        stage_params: this device's parameter shard (leading layer axis
            already sliced by shard_map's in_spec ``P('stage', ...)``).
        xs: ``[n_micro, ...]`` stacked microbatches, replicated across
            the stage axis.  May be a PYTREE of such arrays — every leaf
            rides the ICI ring alongside the activations (e.g. the MoE
            pre-gating features, which each stage's routers read but no
            stage rewrites).
        n_stages: static stage count (== mesh axis size).
        axis: mesh axis name.

    Returns:
        ``[n_micro, ...]`` outputs (same pytree structure as ``xs``),
        replicated across the stage axis (masked psum of the last
        stage's buffer).
    """
    tmap = jax.tree_util.tree_map
    n_micro = jax.tree_util.tree_leaves(xs)[0].shape[0]
    sid = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        state, out = carry
        # stage 0 ingests microbatch t (clamped gather; masked below)
        fresh = tmap(lambda a: jax.lax.dynamic_index_in_dim(
            a, jnp.minimum(t, n_micro - 1), 0, keepdims=False), xs)
        cur = tmap(lambda f, s: jnp.where(sid == 0, f, s), fresh, state)
        y = stage_fn(stage_params, cur)
        # the last stage finished microbatch t-(S-1); write it
        oidx = t - (n_stages - 1)
        ci = jnp.clip(oidx, 0, n_micro - 1)
        valid = jnp.logical_and(sid == n_stages - 1, oidx >= 0)

        def write(buf, row):
            prev = jax.lax.dynamic_index_in_dim(buf, ci, 0, keepdims=False)
            return jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, row, prev), ci, 0)

        out = tmap(write, out, y)
        # hand this tick's activation to the next stage over the ICI ring
        state = tmap(lambda a: jax.lax.ppermute(a, axis, perm), y)
        return (state, out), None

    # the carry becomes device-varying over the stage axis on the first
    # tick (axis_index + ppermute); mark the zero-init accordingly so the
    # scan carry types match under shard_map's varying-axes checker
    state0 = tmap(lambda a: jax.lax.pcast(
        jnp.zeros_like(a[0]), (axis,), to="varying"), xs)
    out0 = tmap(lambda a: jax.lax.pcast(
        jnp.zeros_like(a), (axis,), to="varying"), xs)
    (_, out), _ = jax.lax.scan(tick, (state0, out0),
                               jnp.arange(n_micro + n_stages - 1))
    # replicate the last stage's buffer to every stage (single collective)
    out = tmap(lambda a: jnp.where(sid == n_stages - 1, a,
                                   jnp.zeros_like(a)), out)
    return tmap(lambda a: jax.lax.psum(a, axis), out)


def stack_layers(layers: list) -> Any:
    """List-of-pytrees → pytree with a stacked leading layer axis, the
    layout ``shard_map`` slices over 'stage' with ``P('stage', ...)``."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def scan_layers(layer_fn: Callable[[jnp.ndarray, Any], jnp.ndarray],
                stacked: Any, x: jnp.ndarray) -> jnp.ndarray:
    """Apply ``layer_fn`` over a stacked layer pytree (compiled once)."""
    def body(h, lp):
        return layer_fn(h, lp), None

    y, _ = jax.lax.scan(body, x, stacked)
    return y
