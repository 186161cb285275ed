"""Benchmark: fingerprint sketching throughput (the `sketch -fp` hot path).

Measures the fused device pipeline (batched Duval factorization ->
MurmurHash3 over the factor-length vectors, i.e. one fingerprint hash per
100-base shift window) against the reference-equivalent scalar CPU
pipeline (lyn2vec's per-window Python Duval + hash — the reference's
fingerprint front-end is pure Python, lyn2vec.py:40).

Prints ONE JSON line:
  {"metric": "sketched_bases_per_s", "value": N, "unit": "bases/s",
   "vs_baseline": device_over_cpu_ratio}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.lyndon import cfl_lengths_onehot as cfl_lengths
    from fpmash_tpu.ops.murmur3 import murmur3_u64_batch

    WINDOW = 100
    B = 8192  # windows per batch
    BATCHES = 32

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    windows = lut[rng.integers(0, 4, size=(B, WINDOW))]
    lengths = np.full((B,), WINDOW, np.int32)
    w = jnp.asarray(windows)
    l = jnp.asarray(lengths)

    @jax.jit
    def step(w, l):
        fac_len, fac_count = cfl_lengths(w, l)
        h1, _ = murmur3_u64_batch(fac_len.astype(jnp.uint64), fac_count, seed=42)
        return h1

    # warmup/compile (twice: the first dispatch after compile pays extra
    # relay latency in tunneled environments)
    step(w, l).block_until_ready()
    step(w, l).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(BATCHES):
        out = step(w, l)
    out.block_until_ready()
    device_s = time.perf_counter() - t0
    device_bases_per_s = B * BATCHES * WINDOW / device_s

    # scalar CPU baseline (reference-equivalent Python front-end) on a sample
    from fpmash_tpu.scalar.lyndon import cfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    sample = ["".join(chr(c) for c in row) for row in windows[:2048]]
    t0 = time.perf_counter()
    for s in sample:
        fac = cfl(s)
        hash_u64_vector([len(f) for f in fac], seed=42, use64=False)
    cpu_s = time.perf_counter() - t0
    cpu_bases_per_s = len(sample) * WINDOW / cpu_s

    print(
        json.dumps(
            {
                "metric": "sketched_bases_per_s",
                "value": round(device_bases_per_s),
                "unit": "bases/s",
                "vs_baseline": round(device_bases_per_s / cpu_bases_per_s, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
