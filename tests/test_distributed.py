"""Multi-slice initialization module: single-process no-op contract and
global mesh construction."""

import os

import pytest

from avd_tpu.parallel import distributed, mesh as mesh_mod


def test_single_process_is_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize() is False


def test_explicit_single_process_noop():
    assert distributed.initialize(num_processes=1) is False


def test_global_mesh_spans_devices():
    m = distributed.global_mesh(axes=("data", "model"))
    import jax
    assert m.size == len(jax.devices())
    assert set(m.axis_names) == {"data", "model"}


def test_global_mesh_custom_shape():
    m = distributed.global_mesh(axes=("data", "model"), shape=(8, 1))
    assert m.shape == {"data": 8, "model": 1}
