"""On-chip throughput for the classic k-mer sketch path (k=21 MinHash).

kmer_hashes (window+canonical+murmur) + bottom-k over one sequence batch.
Chained-scan timing.  Usage: python scripts/exp_kmer_chip.py [N] [k] [ITERS]
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

    @jax.jit
    def bench(seq, seq2):
        def body(carry, _):
            sv = jnp.where(carry > 0, seq2, seq)
            h, valid = kmer_hashes(sv, length, k=k, seed=42, use64=True)
            vals, counts, nv = bottom_k_distinct(h, valid, s=1000)
            return (vals[0] & jnp.uint64(1)).astype(jnp.int32), vals.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return sums

    print(f"N={N} k={k} iters={ITERS} backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(bench(seq, seq2))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(seq, seq2))
        best = min(best, time.perf_counter() - t0)
    rate = N * ITERS / best
    print(f"time={best:.3f}s  {rate/1e9:.3f} Gbases/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
