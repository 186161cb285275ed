"""Pallas ICFL kernels (interpret mode) vs the scalar parity chain."""

from __future__ import annotations

import random

import numpy as np
import pytest


def _mask_bits(w128, upto):
    return [q for q in range(upto) if (int(w128[q >> 5]) >> (q & 31)) & 1]


def test_icfl_words_and_hash_match_scalar_chain():
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl_pallas import hash_from_words_fused, icfl_words_fused
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import icfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    random.seed(8)
    words = [
        "".join(random.choice(random.choice(["ACGT", "AC", "ACGTN"]))
                for _ in range(random.randint(1, 44)))
        for _ in range(24)
    ]
    # degenerate + adversarial (2-letter alphabets stress the chain walk)
    # 44-char cap keeps interpret-mode while_loop iterations (the cost
    # driver; ~linear in max length) low; >32 lengths still cross the
    # 32-bit boundary-mask word.  Full L=100 parity runs on real hardware
    # in scripts/chip_smoke.py.
    words += ["A" * 44, "ACGT" * 11, "T" * 43 + "A", "A", ("AB" * 22),
              ("BBA" * 15)[:43], "CACB" * 11]
    arr, lens = encode_batch(words)
    W, ok = jax.device_get(
        icfl_words_fused(jnp.asarray(arr), jnp.asarray(lens), pack="byte4",
                         interpret=True)
    )
    assert ok.all()
    for k, s in enumerate(words):
        starts, pos = [], 0
        for f in icfl(s):
            starts.append(pos)
            pos += len(f)
        assert _mask_bits(W[k], len(s)) == starts, (k, s[:40])

    h1, _, cnt = jax.device_get(
        hash_from_words_fused(jnp.asarray(W), jnp.asarray(lens), seed=42,
                              interpret=True)
    )
    for k, s in enumerate(words):
        fac = [len(f) for f in icfl(s)]
        assert int(h1[k]) == hash_u64_vector(fac, seed=42, use64=True), k
        assert int(cnt[k]) == len(fac)


@pytest.mark.parametrize("pack", ["byte4", "dna16"])
def test_icfl_comb_fused_matches_scalar(pack):
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl_pallas import icfl_family_hashes_fused
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import d_icfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    random.seed(31)
    alpha = "ACGT" if pack == "dna16" else "ACGTN"
    words = ["".join(random.choice(alpha) for _ in range(44)) for _ in range(16)]
    words += ["A" * 44, "ACGT" * 11, "TGCA" * 11]
    arr, lens = encode_batch(words)
    h1, _, cnt, ok = jax.device_get(
        icfl_family_hashes_fused(
            jnp.asarray(arr), jnp.asarray(lens), family="ICFL_COMB", seed=42,
            pack=pack, interpret=True,
        )
    )
    assert np.asarray(ok).all()
    for k, s in enumerate(words):
        fac = [len(f) for f in d_icfl(s)]
        assert int(h1[k]) == hash_u64_vector(fac, seed=42, use64=True), (pack, k)
        assert int(cnt[k]) == len(fac)


def test_flip_words_uniform_matches_reference_flip():
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl_pallas import flip_words_uniform

    rng = np.random.default_rng(3)
    for L in (100, 96, 64, 37, 5):
        bits = rng.integers(0, 2, size=L).astype(bool)
        words = np.zeros(4, np.uint32)
        for q in range(L):
            if bits[q]:
                words[q >> 5] |= np.uint32(1 << (q & 31))
        flipped = np.asarray(flip_words_uniform(jnp.asarray(words[None]), L))[0]
        got = set(_mask_bits(flipped, 128))
        want = {L - q for q in range(1, L) if bits[q]}
        assert got == want, L
