"""Neural models.

The reference ships no ML model — its "detector" is pure heuristics
(SURVEY.md §2).  This package is the north-star upgrade slot named in
BASELINE.json: batched per-frame detector forwards on TPU, bypassed in
parity mode.  Two architecture families share one functional API
(Config / make_config / init_params / forward / loss_fn /
make_train_step / param_specs / checkpoint helpers):

* ``detector`` — the flagship per-frame ViT (default);
* ``cnn``      — ConvNeXt-style CNN (matmul-lowered convs, same TP plan);
* ``temporal`` — transformer over the FRAME SEQUENCE (per-frame scores
  with temporal context; sequence-parallel over time via ring
  attention / Ulysses — the clip-level family).

``scoring`` adapts any family's outputs to the analyzer timeline
contract; select with ``AVD_DETECTOR_ARCH={vit,cnn,temporal}`` or
``python -m avd_tpu.models.train --arch cnn``.
"""

FAMILIES = ("vit", "cnn", "temporal")


def family(name: str):
    """Return the model-family module for ``name``."""
    if name == "cnn":
        from avd_tpu.models import cnn
        return cnn
    if name == "vit":
        from avd_tpu.models import detector
        return detector
    if name == "temporal":
        from avd_tpu.models import temporal
        return temporal
    raise ValueError(f"unknown model family {name!r}; "
                     f"choose from {list(FAMILIES)}")
