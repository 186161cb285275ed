"""Classic k-mer path breakdown with honest single-dispatch chains.

Round-2's bench combined the kmer-hash and bottom-k rates harmonically and
timed bottom-k as 8 dependent DISPATCHES (~25 ms relay latency each), so
nobody could tell which stage limits.  Every mode here chains N dependent
iterations inside ONE jit via a Python loop (no lax.scan — serializes on
device, dodges both the scan-VMEM cliff and the Mosaic scan bugs).

Modes:
  hash     kmer ladder + pallas canonical/murmur tail only
  bottomk  threshold-filtered bottom-k only (ops/bottomk.py)
  fused    hash -> threshold bottom-k, one jit
  sortfull full-sort bottom_k_distinct only (reference point)

Usage: python scripts/exp_kmer2.py MODE [N] [k] [ITERS]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    mode = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 21
    ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.bottomk import bottom_k_distinct, bottom_k_threshold
    from fpmash_tpu.ops.kmers import _kmer_hashes_acgt

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = jnp.asarray(lut[rng.integers(0, 4, size=N)])
    seq2 = jnp.asarray(lut[rng.integers(0, 4, size=N)])
    length = jnp.int32(N)
    pool = jnp.asarray(rng.integers(1, 1 << 62, size=N, dtype=np.uint64))
    use_pallas = jax.default_backend() != "cpu"

    print(f"mode={mode} N={N} k={k} iters={ITERS} backend={jax.default_backend()}", flush=True)

    def khash(sv):
        h, valid = _kmer_hashes_acgt(
            sv, length, k=k, noncanonical=False, preserve_case=False,
            seed=42, pallas=use_pallas,
        )
        return h, valid

    if mode == "hash":

        @jax.jit
        def bench(seq, seq2):
            t = jnp.int32(0)
            acc = jnp.uint64(0)
            for _ in range(ITERS):
                sv = jnp.where(t > 0, seq2, seq)
                h, _ = khash(sv)
                t = (h[0] & jnp.uint64(1)).astype(jnp.int32)
                acc = acc + h.sum()
            return acc

        args = (seq, seq2)
    elif mode == "bottomk":

        @jax.jit
        def bench(pool):
            t = jnp.uint64(0)
            acc = jnp.uint64(0)
            for _ in range(ITERS):
                vals, counts, n, ok = bottom_k_threshold(
                    pool ^ t, (pool ^ t) > 0, s=1000
                )
                t = vals[0] & jnp.uint64(1)
                acc = acc + vals.sum()
            return acc

        args = (pool,)
    elif mode == "sortfull":

        @jax.jit
        def bench(pool):
            t = jnp.uint64(0)
            acc = jnp.uint64(0)
            for _ in range(ITERS):
                vals, counts, n = bottom_k_distinct(
                    pool ^ t, (pool ^ t) > 0, s=1000
                )
                t = vals[0] & jnp.uint64(1)
                acc = acc + vals.sum()
            return acc

        args = (pool,)
    elif mode == "fused":

        @jax.jit
        def bench(seq, seq2):
            t = jnp.int32(0)
            acc = jnp.uint64(0)
            for _ in range(ITERS):
                sv = jnp.where(t > 0, seq2, seq)
                h, valid = khash(sv)
                vals, counts, n, ok = bottom_k_threshold(h, valid, s=1000)
                t = (vals[0] & jnp.uint64(1)).astype(jnp.int32)
                acc = acc + vals.sum()
            return acc

        args = (seq, seq2)
    else:
        raise SystemExit(f"unknown mode {mode}")

    t0 = time.perf_counter()
    out = jax.block_until_ready(bench(*args))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(*args))
        best = min(best, time.perf_counter() - t0)
    rate = N * ITERS / best
    print(f"OK time={best:.3f}s  {rate/1e9:.3f} Gbases/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
