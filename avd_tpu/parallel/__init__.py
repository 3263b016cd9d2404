"""Mesh construction, sharding rules, and the time-axis halo exchange.

The reference has no distributed layer at all (single process, one worker —
SURVEY.md §2.2); scaling here is mesh-native JAX: data parallelism over
frames/clips, tensor parallelism over the detector's hidden dims, and
context parallelism over the time axis with a one-frame halo for the
neighbor-dependent features (optical flow and duplicate hashes compare
against the *previous* frame, reference video.py:37-49).
"""

from avd_tpu.parallel.mesh import (batch_sharding, make_mesh,  # noqa: F401
                                   shard_params)
