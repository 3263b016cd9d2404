"""Sequence-parallel attention (parallel/attention.py): ring attention
and Ulysses vs plain attention, token axis sharded on the virtual mesh.

SURVEY §2.2 lists ring-attention/Ulysses among the strategies absent
from the reference and to be created TPU-native; with these, every
named strategy (DP/TP/SP/PP/CP/EP/ring/Ulysses) is implemented and
parity-tested.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _qkv(dtype=jnp.float32, B=2, H=4, T=32, D=16):
    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    return mk(0), mk(1), mk(2)


def _mesh(n):
    from avd_tpu.parallel import mesh as mesh_mod
    return mesh_mod.make_mesh(n, axes=("seq",))


needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the virtual 8-device mesh")


@needs_mesh
def test_ring_attention_matches_full():
    from avd_tpu.parallel import attention as att
    q, k, v = _qkv()
    ref = np.asarray(att.full_attention(q, k, v))
    S = 4
    mesh = _mesh(S)
    spec = P(None, None, "seq", None)
    run = jax.shard_map(
        lambda a, b, c: att.ring_attention(a, b, c, "seq", S),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    with mesh:
        out = np.asarray(jax.jit(run)(q, k, v))
    np.testing.assert_allclose(ref, out, atol=1e-5, rtol=1e-5)


@needs_mesh
def test_ring_attention_bf16():
    """bf16 q/k/v with f32 online-softmax accumulation (the serving
    dtype recipe) stays within the bf16 budget."""
    from avd_tpu.parallel import attention as att
    q, k, v = _qkv(jnp.bfloat16)
    ref = np.asarray(att.full_attention(q, k, v), np.float32)
    S = 8
    mesh = _mesh(S)
    spec = P(None, None, "seq", None)
    run = jax.shard_map(
        lambda a, b, c: att.ring_attention(a, b, c, "seq", S),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    with mesh:
        out = np.asarray(jax.jit(run)(q, k, v), np.float32)
    np.testing.assert_allclose(ref, out, atol=2e-2)


@needs_mesh
def test_ulysses_attention_matches_full():
    from avd_tpu.parallel import attention as att
    q, k, v = _qkv()  # H=4 divides S=4
    ref = np.asarray(att.full_attention(q, k, v))
    mesh = _mesh(4)
    spec = P(None, None, "seq", None)
    run = jax.shard_map(
        lambda a, b, c: att.ulysses_attention(a, b, c, "seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    with mesh:
        out = np.asarray(jax.jit(run)(q, k, v))
    np.testing.assert_allclose(ref, out, atol=1e-5, rtol=1e-5)


def test_full_attention_reference_sanity():
    """full_attention == explicit numpy softmax (the oracle the sharded
    variants are held to)."""
    from avd_tpu.parallel import attention as att
    q, k, v = _qkv(T=8, D=4)
    out = np.asarray(att.full_attention(q, k, v))
    qn, kn, vn = (np.asarray(x, np.float64) for x in (q, k, v))
    s = np.einsum("bhtd,bhsd->bhts", qn, kn) / np.sqrt(qn.shape[-1])
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhts,bhsd->bhtd", p, vn)
    np.testing.assert_allclose(out, ref, atol=1e-5)
