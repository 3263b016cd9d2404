"""Device mesh construction and sharding helpers.

Axes:
    data   — batch/data parallelism (frames, clips, train batches)
    model  — tensor parallelism (attention heads, MLP hidden)
    time   — context parallelism over a clip's frame sequence

On a real slice the mesh maps onto ICI neighbors (jax orders devices by
coords); across slices ``jax.distributed.initialize`` extends the same code
over DCN — no NCCL/MPI-style backend is hand-rolled (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def factor2(n: int) -> Tuple[int, int]:
    """Largest p ≤ √n dividing n → (n//p, p); used for (data, model)."""
    p = int(np.sqrt(n))
    while p > 1 and n % p:
        p -= 1
    return n // p, p


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data", "model"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Without ``shape``, a 2-axis mesh gets a balanced factorization and any
    other arity puts all devices on the first axis.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} visible")
    devs = devs[:n]
    if shape is None:
        if len(axes) == 2:
            shape = factor2(n)
        else:
            shape = (n,) + (1,) * (len(axes) - 1)
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def shard_params(mesh: Mesh, params, specs):
    """Place a parameter pytree according to a matching pytree of
    PartitionSpecs."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding for input arrays (frames/labels)."""
    return NamedSharding(mesh, P(axis))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
