"""MurmurHash3 parity: scalar model vs golden fixtures, device kernel vs scalar."""

import json
import random
import re

import numpy as np
import pytest

from fpmash_tpu.scalar.murmur3 import hash_bytes, hash_u64_vector, murmur3_x64_128


def load_sketch_json(path):
    """Parse a reference ``info -d`` JSON dump (skipping any debug preamble)."""
    text = open(path).read()
    start = text.index("{")
    return json.loads(text[start:])


def test_scalar_matches_dna3_golden(golden_dir):
    """Every fingerprint line of DNA3-CFL.txt hashes to the golden 32-bit
    value in DNA3-sketch.json (hash.cpp:45-73 + Sketch.cpp:132)."""
    doc = load_sketch_json(golden_dir / "cfl" / "DNA3-sketch.json")
    assert doc["hashBits"] == 32 and doc["hashSeed"] == 42
    golden_by_name = {s["name"]: s["hashes"] for s in doc["sketches"]}

    lines = open(golden_dir / "cfl" / "DNA3-CFL.txt").read().splitlines()
    got = {}
    for line in lines:
        parts = line.split()
        got.setdefault(parts[0], []).append(
            hash_u64_vector([int(x) for x in parts[1:]], seed=42, use64=False)
        )
    assert set(got) == set(golden_by_name)
    for name in got:
        # The golden JSON was produced by `info -d` on the .msh, and loadCapnp
        # truncates each hash list to minHashesPerWindow=1000 on load
        # (Sketch.cpp:1117-1120); the fingerprint file yields 2000 lines/ref.
        assert len(got[name]) == 2000 and len(golden_by_name[name]) == 1000
        assert got[name][:1000] == golden_by_name[name], name


def test_known_vectors():
    # Digests cross-checked against the reference MurmurHash3.cpp compiled
    # natively (x64_128; printed as (h1, h2) uint64 pairs).
    assert murmur3_x64_128(b"", 0) == (0, 0)
    assert murmur3_x64_128(b"The quick brown fox jumps over the lazy dog", 0) == (
        0xE34BBC7BBC071B6C,
        0x7A433CA9C49A9347,
    )
    assert murmur3_x64_128(b"Hello, world!", 123) == (
        0x421C8C738743ACAD,
        0xF19732FDD373C3F5,
    )


def test_device_u64_matches_scalar():
    import jax.numpy as jnp

    from fpmash_tpu.ops.murmur3 import murmur3_u64_batch

    random.seed(11)
    rows = [
        [random.randint(0, 10**6) for _ in range(random.randint(1, 41))]
        for _ in range(200)
    ]
    L = max(map(len, rows))
    arr = np.zeros((len(rows), L), np.uint64)
    cnt = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        arr[i, : len(r)] = r
        cnt[i] = len(r)
    h1, _ = murmur3_u64_batch(jnp.asarray(arr), jnp.asarray(cnt))
    h1 = np.asarray(h1)
    for i, r in enumerate(rows):
        assert int(h1[i]) == hash_u64_vector(r, use64=True)


def test_device_bytes_matches_scalar():
    import jax.numpy as jnp

    from fpmash_tpu.ops.murmur3 import murmur3_bytes_batch

    random.seed(12)
    sizes = [1, 5, 8, 15, 16, 17, 21, 24, 31, 32, 33, 48]
    rows = [
        bytes(random.randint(0, 255) for _ in range(random.choice(sizes)))
        for _ in range(200)
    ]
    L = max(map(len, rows))
    arr = np.zeros((len(rows), L), np.uint8)
    cnt = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        arr[i, : len(r)] = np.frombuffer(r, np.uint8)
        cnt[i] = len(r)
    h1, h2 = murmur3_bytes_batch(jnp.asarray(arr), jnp.asarray(cnt))
    for i, r in enumerate(rows):
        assert (int(h1[i]), int(h2[i])) == murmur3_x64_128(r, 42)
