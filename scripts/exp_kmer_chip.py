"""On-chip throughput for the classic k-mer sketch path (k=21 MinHash).

Times the two production stages SEPARATELY, each with chained-scan
discipline (the production path dispatches kmer_hashes and
bottom_k_distinct as separate jits; fusing both into one scanned jit
trips a scoped-VMEM cliff that production never sees).  Reports each
stage's rate and the combined pipeline rate 1/(1/r1 + 1/r2).

Usage: python scripts/exp_kmer_chip.py [N] [k] [ITERS]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.bottomk import bottom_k_distinct
    from fpmash_tpu.ops.kmers import kmer_hashes

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = jnp.asarray(lut[rng.integers(0, 4, size=N)])
    seq2 = jnp.asarray(lut[rng.integers(0, 4, size=N)])
    length = jnp.int32(N)
    pool = jnp.asarray(rng.integers(1, 1 << 62, size=N, dtype=np.uint64))

    print(f"N={N} k={k} iters={ITERS} backend={jax.default_backend()}", flush=True)

    @jax.jit
    def bench_kmer(seq, seq2):
        def body(carry, _):
            sv = jnp.where(carry > 0, seq2, seq)
            h, valid = kmer_hashes(sv, length, k=k, seed=42, use64=True)
            return (h[0] & jnp.uint64(1)).astype(jnp.int32), h.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return sums

    @jax.jit
    def bench_bottomk(pool):
        def body(carry, _):
            pv = pool ^ carry  # data dependency, elementwise only
            vals, counts, nv = bottom_k_distinct(pv, pv > 0, s=1000)
            return vals[0] & jnp.uint64(1), vals.sum()

        _, sums = jax.lax.scan(body, jnp.uint64(0), None, length=ITERS)
        return sums

    rates = {}
    for name, fn, args in (
        ("kmer", bench_kmer, (seq, seq2)),
        ("bottomk", bench_bottomk, (pool,)),
    ):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            best = min(best, time.perf_counter() - t0)
        rates[name] = N * ITERS / best
        print(f"{name}: time={best:.3f}s  {rates[name]/1e9:.3f} Gbases/s", flush=True)

    combined = 1.0 / (1.0 / rates["kmer"] + 1.0 / rates["bottomk"])
    print(f"pipeline (kmer+bottomk): {combined/1e9:.3f} Gbases/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
