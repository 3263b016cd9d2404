"""Shared atomic-build helper for the ctypes-loaded C++ libraries.

Two review-found failure modes are handled here so both loaders
(avd_tpu/native/__init__.py and avd_tpu/native/decode.py) get them:

* g++ writes its output non-atomically — a compile killed by the 120 s
  timeout (one shared vCPU, 2-5x contention) or a concurrent worker left
  a truncated .so whose mtime passed the cache check, silently disabling
  the native path forever.  We compile to a per-pid temp file and
  ``os.replace`` it into place; a failed CDLL triggers one forced
  rebuild (see the loaders).
* a prebuilt .so without its source (trimmed/packaged deployments) was
  rejected because the mtime comparison touched the missing source
  first; a loadable artifact on disk is now accepted as a candidate.
"""

from __future__ import annotations

import os
import subprocess
from typing import Callable, List


def ensure_so(src: str, so: str, cmd_for: Callable[[str], List[str]],
              timeout: float, force: bool = False) -> bool:
    """True when ``so`` is a plausible load candidate.

    ``cmd_for(out_path)`` must return the full compiler argv writing to
    ``out_path``.  With ``force=True`` the cached artifact is ignored and
    a fresh compile is attempted (used after a CDLL load failure, which
    indicates a truncated/corrupt artifact).
    """
    try:
        src_mtime = os.path.getmtime(src) if os.path.exists(src) else None
        if not force and os.path.exists(so) and (
                src_mtime is None or os.path.getmtime(so) >= src_mtime):
            return True
        if src_mtime is None:
            return False
        tmp = f"{so}.tmp.{os.getpid()}"
        try:
            proc = subprocess.run(cmd_for(tmp), capture_output=True,
                                  text=True, timeout=timeout)
            if proc.returncode != 0:
                return False
            os.replace(tmp, so)
            return True
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    except Exception:
        return False
