"""MXU (nibble-limb matmul) murmur3 == scalar model, both variants."""

import random
import struct

import numpy as np
import pytest

from fpmash_tpu.scalar.murmur3 import murmur3_x64_128


def test_u64_variant_matches_scalar():
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.murmur3_mxu import murmur3_u64_batch_mxu

    random.seed(151)
    rows = [
        [random.randint(0, 2**64 - 1) for _ in range(random.randint(1, 21))]
        for _ in range(150)
    ]
    rows += [[0], [2**64 - 1] * 10, [5, 6], [1] * 20]
    L = max(map(len, rows))
    arr = np.zeros((len(rows), L), np.uint64)
    cnt = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        arr[i, : len(r)] = r
        cnt[i] = len(r)
    h1, h2 = jax.device_get(murmur3_u64_batch_mxu(jnp.asarray(arr), jnp.asarray(cnt)))
    for i, r in enumerate(rows):
        data = b"".join(struct.pack("<Q", v) for v in r)
        assert (int(h1[i]), int(h2[i])) == murmur3_x64_128(data, 42)


def test_bytes_variant_matches_scalar():
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.murmur3_mxu import murmur3_bytes_batch_mxu

    random.seed(152)
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
    h1, h2 = jax.device_get(murmur3_bytes_batch_mxu(jnp.asarray(arr), jnp.asarray(cnt)))
    for i, r in enumerate(rows):
        assert (int(h1[i]), int(h2[i])) == murmur3_x64_128(r, 42)
