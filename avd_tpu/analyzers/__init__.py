"""Analyzer package.

Mirrors the public surface of the reference's ``app.analyzers`` package
(/root/reference/app/analyzers/__init__.py:2-8): six modules re-exported
eagerly.  ``forensic`` is dead code on the reference's API path (only
``meta.forensic_summary`` is called from api.py:164) — we keep it importable
and behavior-compatible without wiring it into the pipeline, reproducing the
reference as-is.
"""

from avd_tpu.analyzers import audio
from avd_tpu.analyzers import forensic
from avd_tpu.analyzers import fusion
from avd_tpu.analyzers import heuristics_v2
from avd_tpu.analyzers import meta
from avd_tpu.analyzers import video

__all__ = ["video", "audio", "fusion", "meta", "forensic", "heuristics_v2"]
