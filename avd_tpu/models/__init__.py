"""Neural models.

The reference ships no ML model — its "detector" is pure heuristics
(SURVEY.md §2).  This package is the north-star upgrade slot named in
BASELINE.json: batched per-frame CNN/ViT detector forwards on TPU, bypassed
in parity mode.  ``detector`` is the flagship per-frame ViT; ``scoring``
adapts its outputs to the analyzer timeline contract.
"""
