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

SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")


def so_site(name: str) -> str:
    """Where the built .so for ``name`` lives.

    Dev checkout: next to the sources (shared by every process, warm
    across test runs).  Installed package (read-only site-packages): a
    fresh prebuilt artifact beside the sources is still honored,
    otherwise builds land in a per-user cache dir
    (``AVD_NATIVE_CACHE``, default ``~/.cache/avd_tpu_native``)."""
    beside = os.path.join(SRC_DIR, name)
    src = os.path.join(SRC_DIR, name.replace("lib", "", 1)
                       .replace(".so", ".cc"))
    try:
        if os.access(SRC_DIR, os.W_OK):
            return beside
        if os.path.exists(beside) and (
                not os.path.exists(src)
                or os.path.getmtime(beside) >= os.path.getmtime(src)):
            return beside
    except OSError:
        pass
    d = os.getenv("AVD_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "avd_tpu_native")
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return beside  # last resort; ensure_so will fail cleanly
    # cache key = SOURCE CONTENT hash, not mtime: wheel-extracted sources
    # carry the build machine's archive mtimes, which are OLDER than any
    # previously cached artifact — a pip upgrade would otherwise keep
    # loading the old binary (or crash on a missing new export) forever
    try:
        import hashlib
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
        name = name.replace(".so", f"-{tag}.so")
    except OSError:
        pass  # no source beside the install: fall back to the plain name
    return os.path.join(d, name)


def _prune_stale_siblings(so: str) -> None:
    """Drop cached artifacts from previous source versions.

    Content-hash cache keys (``<stem>-<sha12>.so``) mean every source
    change adds one binary to the per-user cache dir forever; after a
    successful build, unlink siblings sharing the stem but carrying a
    different tag.  Best-effort — a concurrently running process that
    already dlopened an old artifact keeps its mapping (POSIX unlink
    semantics), so this never breaks a live loader."""
    import glob
    import re
    d, base = os.path.split(so)
    m = re.match(r"^(.*)-[0-9a-f]{12}\.so$", base)
    if not m:
        return
    for sib in glob.glob(os.path.join(d, m.group(1) + "-*.so")):
        if os.path.basename(sib) != base and re.match(
                r"^(.*)-[0-9a-f]{12}\.so$", os.path.basename(sib)):
            try:
                os.unlink(sib)
            except OSError:
                pass


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
            _prune_stale_siblings(so)
            return True
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    except Exception:
        return False
