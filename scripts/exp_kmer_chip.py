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

    from fpmash_tpu.ops.bottomk import bottom_k_threshold
    from fpmash_tpu.ops.kmers import kmer_hashes

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = jnp.asarray(lut[rng.integers(0, 4, size=N)])
    seq2 = jnp.asarray(lut[rng.integers(0, 4, size=N)])
    length = jnp.int32(N)
    pool = jnp.asarray(rng.integers(1, 1 << 62, size=N, dtype=np.uint64))

    print(f"N={N} k={k} iters={ITERS} backend={jax.default_backend()}", flush=True)

    from fpmash_tpu.ops.kmers import _kmer_hashes_acgt

    use_pallas = jax.default_backend() != "cpu"

    @jax.jit
    def bench_kmer(seq, seq2):
        def body(carry, _):
            sv = jnp.where(carry > 0, seq2, seq)
            h, valid = _kmer_hashes_acgt(
                sv, length, k=k, noncanonical=False, preserve_case=False,
                seed=42, pallas=use_pallas,
            )
            return (h[0] & jnp.uint64(1)).astype(jnp.int32), h.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return sums

    # bottom-k: scan-wrapping trips a scoped-VMEM cliff, so chain ITERS
    # DEPENDENT dispatches instead (each call's input xors the previous
    # call's output — real data dependencies serialize on device; only
    # independent calls get relay-reordered)
    bk = jax.jit(
        lambda pool, t: bottom_k_threshold(pool ^ t, (pool ^ t) > 0, s=1000)[0]
    )

    def bench_bottomk_chain():
        t = jnp.uint64(0)
        vals = None
        for _ in range(ITERS):
            vals = bk(pool, t)
            t = vals[0] & jnp.uint64(1)
        return vals

    rates = {}

    t0 = time.perf_counter()
    jax.block_until_ready(bench_kmer(seq, seq2))
    print(f"kmer compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench_kmer(seq, seq2))
        best = min(best, time.perf_counter() - t0)
    rates["kmer"] = N * ITERS / best
    print(f"kmer: time={best:.3f}s  {rates['kmer']/1e9:.3f} Gbases/s", flush=True)

    t0 = time.perf_counter()
    jax.block_until_ready(bench_bottomk_chain())
    print(f"bottomk compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench_bottomk_chain())
        best = min(best, time.perf_counter() - t0)
    rates["bottomk"] = N * ITERS / best
    print(f"bottomk: time={best:.3f}s  {rates['bottomk']/1e9:.3f} Gbases/s", flush=True)

    combined = 1.0 / (1.0 / rates["kmer"] + 1.0 / rates["bottomk"])
    print(f"pipeline (kmer+bottomk): {combined/1e9:.3f} Gbases/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
