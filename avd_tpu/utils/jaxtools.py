"""JAX runtime configuration shared by all compute modules.

Centralizes:
* the persistent compilation cache — first-compile of the video feature
  program is tens of seconds on TPU; caching it on disk makes every later
  process (serving workers, bench runs, CLI invocations) start hot;
* device selection helpers.
"""

from __future__ import annotations

import os
import threading

_SETUP_LOCK = threading.Lock()
_DONE = False


def setup() -> None:
    """Idempotent process-wide JAX configuration."""
    global _DONE
    with _SETUP_LOCK:
        if _DONE:
            return
        import jax

        cache_dir = os.getenv(
            "AVD_XLA_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "avd_tpu_xla"))
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # cache is an optimization; never fail setup
        _DONE = True


def device_kind() -> str:
    import jax
    return jax.devices()[0].device_kind
