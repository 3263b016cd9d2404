"""Multi-host / multi-slice initialization.

The reference has no distributed communication of any kind (SURVEY.md
§2.2); here scaling beyond one host uses JAX's built-in runtime — no
NCCL/MPI-style hand-rolled transport.  Intra-slice collectives ride ICI;
across slices ``jax.distributed.initialize`` brings every host's devices
into one global namespace and the same mesh/sharding code spans DCN.

On a single host this module is a no-op, so the code path is identical
from laptop CPU tests to a multi-slice pod deployment.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the global JAX runtime when configured; returns True if a
    multi-process runtime was initialized.

    Configuration via args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, also
    auto-detected on Cloud TPU pods).  Single-process → no-op.
    """
    import jax

    coordinator = coordinator or os.getenv("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        n = os.getenv("JAX_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.getenv("JAX_PROCESS_ID")
        process_id = int(p) if p else None

    if coordinator is None and num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axes=("data", "model"), shape=None):
    """Mesh over ALL processes' devices (jax.devices() is global after
    initialize()); mesh-major ordering keeps the 'model' axis within a
    slice so TP collectives ride ICI and only 'data' crosses DCN."""
    from avd_tpu.parallel import mesh as mesh_mod
    return mesh_mod.make_mesh(None, axes=axes, shape=shape)


def cp_mesh():
    """The serving pipeline's time-axis mesh, or None on a single device.

    When more than one device is visible (a real slice, or the virtual
    CPU mesh in tests/dryrun) and ``AVD_CP`` isn't 0, the video feature
    pipeline shards each clip's frame sequence over this mesh with a
    one-frame halo (parallel/halo.cp_video_pair_features) instead of
    looping windows through one chip."""
    import jax
    if os.getenv("AVD_CP", "1") == "0":
        return None
    if len(jax.devices()) < 2:
        return None
    from avd_tpu.parallel import mesh as mesh_mod
    return mesh_mod.make_mesh(None, axes=("time",))
