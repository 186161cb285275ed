"""Benchmark: fingerprint sketching throughput (the `sketch -fp` hot path).

Measures the fused device pipeline (batched Duval factorization ->
MurmurHash3 over the factor-length vectors, i.e. one fingerprint hash per
100-base shift window) against the reference-equivalent scalar CPU
pipeline (lyn2vec's per-window Python Duval + hash — the reference's
fingerprint front-end is pure Python, lyn2vec.py:40).

Timing methodology: N dependent iterations are chained inside ONE jitted
``lax.scan`` (each iteration's input is derived from the previous
iteration's output), and the scalar result is fetched to the host.  This
is required on tunneled/relayed devices, where enqueueing N independent
calls and blocking on the last one does NOT serialize them and wildly
overstates throughput.

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

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused

    WINDOW = 100
    B = 131072  # windows per batch
    N = 16  # chained iterations inside one dispatch

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    windows = lut[rng.integers(0, 4, size=(B, WINDOW))]
    windows2 = lut[rng.integers(0, 4, size=(B, WINDOW))]
    lengths = np.full((B,), WINDOW, np.int32)
    w = jnp.asarray(windows)
    w2 = jnp.asarray(windows2)
    l = jnp.asarray(lengths)

    on_cpu = jax.default_backend() == "cpu"

    @jax.jit
    def bench(w, w2, l):
        def body(carry, _):
            # data dependency on prev iter that keeps the batch pure ACGT
            # (the production fp path picks the dna16 2-bit packing for
            # pure-DNA batches)
            wv = jnp.where(carry > 0, w2, w)
            if on_cpu:
                # pallas needs a real TPU; CPU runs the split XLA pipeline
                from fpmash_tpu.ops.lyndon import cfl_lengths_onehot
                from fpmash_tpu.ops.murmur3 import murmur3_u64_batch

                fl, fc = cfl_lengths_onehot(wv, l)
                h1, _ = murmur3_u64_batch(fl.astype(jnp.uint64), fc, seed=42)
            else:
                h1, _, _ = fingerprint_hashes_fused(wv, l, seed=42, pack="dna16")
            return (h1[0] & jnp.uint64(1)).astype(jnp.int32), h1.sum()
        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=N)
        return sums

    # warmup/compile
    jax.block_until_ready(bench(w, w2, l))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(w, w2, l))  # full fetch guarantees completion
        best = min(best, time.perf_counter() - t0)
    device_bases_per_s = B * N * WINDOW / best

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
