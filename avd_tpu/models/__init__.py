"""Neural models.

The reference ships no ML model — its "detector" is pure heuristics
(SURVEY.md §2).  This package is the north-star upgrade slot named in
BASELINE.json: batched per-frame detector forwards on TPU, bypassed in
parity mode.  Two architecture families share one functional API
(Config / make_config / init_params / forward / loss_fn /
make_train_step / param_specs / checkpoint helpers):

* ``detector`` — the flagship per-frame ViT (default);
* ``cnn``      — ConvNeXt-style CNN (matmul-lowered convs, same TP plan).

``scoring`` adapts either family's outputs to the analyzer timeline
contract; select with ``AVD_DETECTOR_ARCH={vit,cnn}`` or
``python -m avd_tpu.models.train --arch cnn``.
"""

FAMILIES = ("vit", "cnn")


def family(name: str):
    """Return the model-family module for ``name``."""
    if name == "cnn":
        from avd_tpu.models import cnn
        return cnn
    if name == "vit":
        from avd_tpu.models import detector
        return detector
    raise ValueError(f"unknown model family {name!r}; "
                     f"choose from {list(FAMILIES)}")
