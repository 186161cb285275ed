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

    orig = kp.kmer_hashes_slab_pallas
    kp.kmer_hashes_slab_pallas = functools.partial(orig, interpret=True)
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
        kp.kmer_hashes_slab_pallas = orig


def test_pallas_tail_under_vmap():
    """hash_rows vmaps kmer_hashes — the Pallas tail must trace under
    vmap (batched pallas_call) for the production classic path."""
    import functools

    import jax
    import jax.numpy as jnp

    import fpmash_tpu.ops.kmers_pallas as kp
    from fpmash_tpu.ops.kmers import _kmer_hashes_acgt

    orig = kp.kmer_hashes_slab_pallas
    kp.kmer_hashes_slab_pallas = functools.partial(orig, interpret=True)
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
        kp.kmer_hashes_slab_pallas = orig


def test_classic_sketch_device_matches_split_path():
    """Fused seq->bottom-k pipeline (planes end-to-end) == the split
    kmer_hashes + bottom_k_threshold path, interpret mode."""
    import functools

    import jax.numpy as jnp

    import fpmash_tpu.ops.kmers_pallas as kp
    from fpmash_tpu.ops.bottomk import bottom_k_threshold
    from fpmash_tpu.ops.kmers import _kmer_hashes_acgt, classic_sketch_device

    orig = kp.kmer_hashes_packed_masked_planes
    # NB: functools.partial keywords would be overridden by the route's
    # explicit interpret=False — force it in a wrapper instead
    kp.kmer_hashes_packed_masked_planes = lambda *a, **kw: orig(
        *a, **{**kw, "interpret": True}
    )
    try:
        rng = np.random.default_rng(2)
        chars = np.frombuffer(b"ACGTacgtN", np.uint8)
        seq = chars[rng.integers(0, len(chars), 3000)]
        ln = 2900
        # boost retry mirrors production callers: the fused route's
        # threshold uses the all-valid length estimate, so invalid-heavy
        # inputs under-collect at boost=1 and report ok=False
        for boost in (1, 8):
            v1, c1, n1, ok1 = classic_sketch_device(
                jnp.asarray(seq), jnp.int32(ln), k=21, s=100, seed=42,
                need_counts=True, boost=boost,
            )
            if bool(ok1):
                break
        h, valid = _kmer_hashes_acgt(
            jnp.asarray(seq), jnp.int32(ln), k=21, noncanonical=False,
            preserve_case=False, seed=42, pallas=False,
        )
        v0, c0, n0, ok0 = bottom_k_threshold(h, valid, s=100)
        assert bool(ok1) == bool(ok0)
        assert int(n1) == int(n0)
        assert np.array_equal(np.asarray(v1), np.asarray(v0))
        assert np.array_equal(np.asarray(c1), np.asarray(c0))
    finally:
        kp.kmer_hashes_packed_masked_planes = orig


def test_packed_topk_kernel_compaction():
    """In-kernel top-8 compaction: every threshold survivor (incl. its
    duplicates) appears in the compacted planes unless overflow flags,
    and the composed classic_sketch_device route == the masked-kernel
    route bit for bit."""
    import jax.numpy as jnp

    import fpmash_tpu.ops.kmers_pallas as kp
    from fpmash_tpu.ops.bottomk import bottom_k_premasked_planes
    from fpmash_tpu.ops.kmers import classic_sketch_device

    rng = np.random.default_rng(17)
    N, k, s = 1 << 16, 21, 16  # N >= 2048*s so the topk route engages
    codes = rng.integers(0, 4, size=N).astype(np.uint32)
    codes[: N // 2] = codes[N // 2 :]  # duplicated half: counts matter
    codes[5000:5010] = 4  # invalid characters
    frac = 8.0 * s / (N - (k - 1))
    t_hi = np.uint32(int(frac * 2**32))

    clo, chi, ovf = kp.kmer_hashes_packed_topk_planes(
        jnp.asarray(codes), jnp.uint32(t_hi), jnp.int32(N), k=k, seed=42,
        interpret=True,
    )
    assert not bool(ovf)
    mlo, mhi = kp.kmer_hashes_packed_masked_planes(
        jnp.asarray(codes), jnp.uint32(t_hi), jnp.int32(N), k=k, seed=42,
        interpret=True,
    )
    U = np.uint64(0xFFFFFFFF)
    want = np.asarray(mlo, np.uint64) | (np.asarray(mhi, np.uint64) << 32)
    want = np.sort(want[want != (U | (U << np.uint64(32)))])
    got = np.asarray(clo, np.uint64) | (np.asarray(chi, np.uint64) << 32)
    got = np.sort(got[got != (U | (U << np.uint64(32)))])
    assert np.array_equal(got, want)  # full multiset incl. duplicates

    # composed route parity (values + exact counts) vs the masked route;
    # classic_sketch_device takes BYTES, not codes — build the sequence
    lut = np.frombuffer(b"ACGTN", np.uint8)
    seq = lut[np.minimum(codes, 4)]
    orig_topk = kp.kmer_hashes_packed_topk8r_planes
    orig_masked = kp.kmer_hashes_packed_masked_planes
    kp.kmer_hashes_packed_topk8r_planes = lambda *a, **kw: orig_topk(
        *a, **{**kw, "interpret": True}
    )
    kp.kmer_hashes_packed_masked_planes = lambda *a, **kw: orig_masked(
        *a, **{**kw, "interpret": True}
    )
    try:
        for need_counts in (False, True):
            v1, c1, n1, ok1 = classic_sketch_device(
                jnp.asarray(seq), jnp.int32(N), k=k, s=s, seed=42,
                need_counts=need_counts,
            )
            v0, c0, n0, ok0 = bottom_k_premasked_planes(
                mlo, mhi, jnp.bool_(False), s=s, min_cov=1,
                need_counts=need_counts,
            )
            assert bool(ok1) and bool(ok0)
            assert int(n1) == int(n0)
            assert np.array_equal(np.asarray(v1), np.asarray(v0))
            assert np.array_equal(np.asarray(c1), np.asarray(c0))
    finally:
        kp.kmer_hashes_packed_topk8r_planes = orig_topk
        kp.kmer_hashes_packed_masked_planes = orig_masked

    # pathological repeats: one k-mer everywhere, saturated threshold ->
    # groups drop real copies and the overflow flag MUST trip
    mono = np.zeros(N, np.uint32)
    _, _, ovf2 = kp.kmer_hashes_packed_topk_planes(
        jnp.asarray(mono), jnp.uint32(0xFFFFFFFF), jnp.int32(N), k=k,
        seed=42, interpret=True,
    )
    assert bool(ovf2)
    """Packed-plane kmer kernel == slab kernel (h1 planes + validity),
    incl. non-ACGT bytes and the N-boundary tail, at several k."""
    import jax.numpy as jnp

    from fpmash_tpu.ops.kmers_pallas import (
        kmer_hashes_packed_pallas_planes,
        kmer_hashes_slab_pallas_planes,
    )

    rng = np.random.default_rng(9)
    N = 3000
    codes = rng.integers(0, 4, size=N).astype(np.uint32)
    codes[100:110] = 4  # invalid characters
    for k in (17, 21, 32):
        a = kmer_hashes_slab_pallas_planes(
            jnp.asarray(codes), k=k, seed=42, interpret=True
        )
        b = kmer_hashes_packed_pallas_planes(
            jnp.asarray(codes), k=k, seed=42, interpret=True
        )
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), k
        # noncanonical too
        a = kmer_hashes_slab_pallas_planes(
            jnp.asarray(codes), k=k, seed=7, noncanonical=True, interpret=True
        )
        b = kmer_hashes_packed_pallas_planes(
            jnp.asarray(codes), k=k, seed=7, noncanonical=True, interpret=True
        )
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), k
