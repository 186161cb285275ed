"""Fused Duval+MurmurHash3 Pallas kernel vs the scalar parity chain."""

from __future__ import annotations

import random

import numpy as np
import pytest


def test_fused_kernel_matches_scalar_chain():
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import cfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    random.seed(3)
    words = [
        "".join(random.choice("ACGT") for _ in range(random.randint(1, 100)))
        for _ in range(80)
    ]
    # degenerate shapes: max factor count, single factor, odd/even counts
    words += ["A" * 100, "ACGT" * 25, "T" * 99 + "A", "A", "CAAB", "BANANA"]
    arr, lens = encode_batch(words)
    h1, h2, fc = jax.device_get(
        fingerprint_hashes_fused(
            jnp.asarray(arr), jnp.asarray(lens), seed=42, interpret=True,
            variant="inline",
        )
    )
    for i, w in enumerate(words):
        fac = [len(f) for f in cfl(w)]
        want = hash_u64_vector(fac, seed=42, use64=True)
        assert int(h1[i]) == want, (i, w[:20])
        assert int(fc[i]) == len(fac), (i, w[:20])


def test_fused_kernel_seed_and_low32():
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import cfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    words = ["GATTACA" * 10, "CCCTTTAAA"]
    arr, lens = encode_batch(words)
    h1, _, _ = jax.device_get(
        fingerprint_hashes_fused(
            jnp.asarray(arr), jnp.asarray(lens), seed=7, interpret=True
        )
    )
    for i, w in enumerate(words):
        fac = [len(f) for f in cfl(w)]
        # fp-mode 32-bit truncation rule (Sketch.cpp:1288)
        want = hash_u64_vector(fac, seed=7, use64=False)
        assert int(h1[i]) & 0xFFFFFFFF == want


@pytest.mark.parametrize("variant", ["split", "inline"])
def test_fused_kernel_multi_chunk(monkeypatch, variant):
    """B large enough that chunks > 1 exercises the lax.map chunking + output
    reassembly for BOTH variants.

    The split variant's per-call capacity is GROUPS*ROW_BLOCK, so ROW_BLOCK
    must be patched low enough that B=300 > 8*ROW_BLOCK — production
    (ROW_BLOCK=2048, up to 1M windows) hits the split multi-chunk path
    routinely.
    """
    import random

    import jax
    import jax.numpy as jnp

    import fpmash_tpu.ops.fused_pallas as fp
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import cfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    monkeypatch.setattr(fp, "ROW_BLOCK", 16)
    random.seed(5)
    words = [
        "".join(random.choice("ACGT") for _ in range(random.randint(1, 100)))
        for _ in range(300)
    ]
    arr, lens = encode_batch(words)
    h1, _, fc = jax.device_get(
        fp.fingerprint_hashes_fused(
            jnp.asarray(arr), jnp.asarray(lens), seed=42, interpret=True,
            variant=variant,
        )
    )
    # the patched geometry must actually chunk (split capacity 8*16=128 < 300)
    assert 300 > 8 * fp.ROW_BLOCK
    for i, w in enumerate(words):
        fac = [len(f) for f in cfl(w)]
        assert int(h1[i]) == hash_u64_vector(fac, seed=42, use64=True), i
        assert int(fc[i]) == len(fac)

def test_fused_kernel_dna16_pack():
    """2-bit DNA packing must match byte4 and the scalar chain exactly."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import cfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    random.seed(11)
    words = [
        "".join(random.choice("ACGT") for _ in range(random.randint(1, 100)))
        for _ in range(64)
    ]
    words += ["A" * 100, "T" * 100, "ACGT" * 25, "A", "TGCA" * 25]
    arr, lens = encode_batch(words)
    h1, h2, fc = jax.device_get(
        fingerprint_hashes_fused(
            jnp.asarray(arr), jnp.asarray(lens), seed=42, interpret=True,
            pack="dna16",
        )
    )
    for i, w in enumerate(words):
        fac = [len(f) for f in cfl(w)]
        assert int(h1[i]) == hash_u64_vector(fac, seed=42, use64=True), (i, w[:20])
        assert int(fc[i]) == len(fac)

@pytest.mark.parametrize("pack", ["byte4", "dna16"])
def test_split_variant_wide_rows(pack):
    """L=300 (the generalized pipeline's chunk width) through the split
    kernel's multi-word boundary bitmask (M=10 mask words)."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import cfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    random.seed(23)
    words = [
        "".join(random.choice("ACGT") for _ in range(random.randint(120, 160)))
        for _ in range(48)
    ]
    # >128 exercises the multi-mask-word wide-row path (M=5 words at 160)
    # without paying interpret-mode cost linear in 300; chip_smoke keeps
    # the true L=300 case on hardware
    words += ["A" * 160, "ACGT" * 40, "T" * 159 + "A"]
    arr, lens = encode_batch(words)
    h1, _, fc = jax.device_get(
        fingerprint_hashes_fused(
            jnp.asarray(arr), jnp.asarray(lens), seed=42, interpret=True,
            pack=pack, variant="split",
        )
    )
    for i, w in enumerate(words):
        fac = [len(f) for f in cfl(w)]
        assert int(h1[i]) == hash_u64_vector(fac, seed=42, use64=True), (i, len(w))
        assert int(fc[i]) == len(fac)


@pytest.mark.parametrize("pack", ["byte4", "dna16"])
def test_split_variant_matches_scalar_chain(pack):
    """Two-phase (boundary-bit) kernel == scalar chain, both packings."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused
    from fpmash_tpu.ops.lyndon import encode_batch
    from fpmash_tpu.scalar.lyndon import cfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    random.seed(17)
    words = [
        "".join(random.choice("ACGT") for _ in range(random.randint(1, 128)))
        for _ in range(64)
    ]
    # worst cases: max factor count (all-same char), single factor,
    # alternating parity, full-width rows hitting all 4 mask words
    words += ["A" * 128, "T" * 127 + "A", "ACGT" * 32, "A", "TGCA" * 32,
              "G" * 100, "C"]
    arr, lens = encode_batch(words)
    h1, h2, fc = jax.device_get(
        fingerprint_hashes_fused(
            jnp.asarray(arr), jnp.asarray(lens), seed=42, interpret=True,
            pack=pack, variant="split",
        )
    )
    for i, w in enumerate(words):
        fac = [len(f) for f in cfl(w)]
        assert int(h1[i]) == hash_u64_vector(fac, seed=42, use64=True), (i, w[:20])
        assert int(fc[i]) == len(fac)


def test_flat_stream_words_match_u8_packing():
    """dna16_window_words (flat read stream + device gather) produces
    bit-identical packed words AND hashes vs the u8-window wrapper — the
    transfer-optimized `sketch --direct-fp` route (models/sketch.py)."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import (
        dna16_window_words,
        fingerprint_hashes_fused,
        fingerprint_hashes_fused_words,
    )

    random.seed(23)
    W = 100
    reads = [
        "".join(random.choice("ACGT") for _ in range(random.randint(W, 260)))
        for _ in range(5)
    ]
    code_map = np.zeros(256, np.uint8)
    for v, ch in enumerate(b"ACGT"):
        code_map[ch] = v
    segs, st, wins = [], [], []
    off = 0
    for seq in reads:
        n = len(seq)
        dbl = seq + seq[: W - 1]
        segs.append(code_map[np.frombuffer(dbl.encode(), np.uint8)])
        st.append(np.arange(off, off + n, dtype=np.int32))
        off += n + W - 1
        for i in range(n):
            wins.append(dbl[i : i + W])
    flat = np.concatenate(segs)
    starts = np.concatenate(st)
    B = len(wins)
    batch = np.frombuffer("".join(wins).encode(), np.uint8).reshape(B, W)
    lens = np.full(B, W, np.int32)

    words = dna16_window_words(
        jnp.asarray(flat), jnp.asarray(starts), nwords=-(-W // 16), L=W
    )
    h1w, _, fcw = jax.device_get(
        fingerprint_hashes_fused_words(
            words, jnp.asarray(lens), L=W, seed=42, interpret=True
        )
    )
    h1u, _, fcu = jax.device_get(
        fingerprint_hashes_fused(
            jnp.asarray(batch), jnp.asarray(lens), seed=42, interpret=True,
            pack="dna16",
        )
    )
    assert np.array_equal(h1w, h1u)
    assert np.array_equal(fcw, fcu)


def test_words_entry_u32_plane():
    """full64=False returns the low 32-bit plane (fp-mode hashes are
    32-bit), equal to the u64 result's low word."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused_words

    rng = np.random.default_rng(5)
    B, W = 16, 100
    # pack random codes the same way the production ladder would
    codes = rng.integers(0, 4, size=(B, W)).astype(np.uint32)
    words = np.zeros((B, 7), np.uint32)
    for b in range(B):
        for w in range(7):
            for m in range(16):
                j = 16 * w + m
                if j < W:
                    words[b, w] |= codes[b, j] << (2 * m)
    lens = np.full(B, W, np.int32)
    h64, _, fc64 = jax.device_get(
        fingerprint_hashes_fused_words(
            jnp.asarray(words), jnp.asarray(lens), L=W, seed=42, interpret=True
        )
    )
    h32, none, fc32 = fingerprint_hashes_fused_words(
        jnp.asarray(words), jnp.asarray(lens), L=W, seed=42, interpret=True,
        full64=False,
    )
    assert none is None
    assert np.array_equal(np.asarray(h32), (h64 & 0xFFFFFFFF).astype(np.uint32))
    assert np.array_equal(np.asarray(fc32), fc64)
