"""Pallas canonical+murmur tail vs the XLA byte-rebuild formulation."""

import numpy as np
import pytest


@pytest.mark.parametrize("k", [3, 16, 21, 32])
@pytest.mark.parametrize("noncanonical", [False, True])
def test_pallas_tail_matches_xla(k, noncanonical):
    import functools

    import jax.numpy as jnp

    import fpmash_tpu.ops.kmers_pallas as kp
    from fpmash_tpu.ops.kmers import _kmer_hashes_acgt

    orig = kp.kmer_hashes_fused_pallas
    kp.kmer_hashes_fused_pallas = functools.partial(orig, interpret=True)
    try:
        rng = np.random.default_rng(k)
        chars = np.frombuffer(b"ACGTacgtN", np.uint8)
        seq = chars[rng.integers(0, len(chars), 500)]
        kw = dict(k=k, noncanonical=noncanonical, preserve_case=False, seed=42)
        h0, v0 = _kmer_hashes_acgt(jnp.asarray(seq), jnp.int32(488), pallas=False, **kw)
        h1, v1 = _kmer_hashes_acgt(jnp.asarray(seq), jnp.int32(488), pallas=True, **kw)
        v = np.asarray(v0)
        assert np.array_equal(v, np.asarray(v1))
        assert np.array_equal(np.asarray(h0)[v], np.asarray(h1)[v])
    finally:
        kp.kmer_hashes_fused_pallas = orig


def test_pallas_tail_under_vmap():
    """hash_rows vmaps kmer_hashes — the Pallas tail must trace under
    vmap (batched pallas_call) for the production classic path."""
    import functools

    import jax
    import jax.numpy as jnp

    import fpmash_tpu.ops.kmers_pallas as kp
    from fpmash_tpu.ops.kmers import _kmer_hashes_acgt

    orig = kp.kmer_hashes_fused_pallas
    kp.kmer_hashes_fused_pallas = functools.partial(orig, interpret=True)
    try:
        rng = np.random.default_rng(1)
        lut = np.frombuffer(b"ACGT", np.uint8)
        bufs = lut[rng.integers(0, 4, size=(3, 300))]
        lens = np.array([300, 250, 100], np.int32)
        kw = dict(k=21, noncanonical=False, preserve_case=False, seed=42)
        f = jax.vmap(lambda b, l: _kmer_hashes_acgt(b, l, pallas=True, **kw))
        g = jax.vmap(lambda b, l: _kmer_hashes_acgt(b, l, pallas=False, **kw))
        h1, v1 = f(jnp.asarray(bufs), jnp.asarray(lens))
        h0, v0 = g(jnp.asarray(bufs), jnp.asarray(lens))
        v = np.asarray(v0)
        assert np.array_equal(v, np.asarray(v1))
        assert np.array_equal(np.asarray(h0)[v], np.asarray(h1)[v])
    finally:
        kp.kmer_hashes_fused_pallas = orig
