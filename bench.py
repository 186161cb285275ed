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

    # ---- secondary metrics (BASELINE: "...and sketch-pair comparisons/s");
    # each guarded so a failure cannot lose the primary number ----
    extra = {}
    if not on_cpu:
        try:
            extra["icfl_comb_bases_per_s"] = round(_bench_icfl(w, w2, l, B, WINDOW, N))
        except Exception as e:  # pragma: no cover
            extra["icfl_comb_error"] = type(e).__name__
        try:
            extra["pair_comparisons_per_s"] = round(_bench_compare())
        except Exception as e:  # pragma: no cover
            extra["compare_error"] = type(e).__name__
        try:
            extra["classic_kmer_bases_per_s"] = round(_bench_kmer())
        except Exception as e:  # pragma: no cover
            extra["kmer_error"] = type(e).__name__

    print(
        json.dumps(
            {
                "metric": "sketched_bases_per_s",
                "value": round(device_bases_per_s),
                "unit": "bases/s",
                "vs_baseline": round(device_bases_per_s / cpu_bases_per_s, 2),
                **({"extra": extra} if extra else {}),
            }
        )
    )
    return 0


def _chained_best(fn, *args, reps: int = 3):
    import jax

    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_icfl(w, w2, l, B, WINDOW, N):
    """Fused ICFL_COMB pipeline (9-of-10 families' representative)."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl_pallas import icfl_family_hashes_fused

    @jax.jit
    def bench(w, w2, l):
        def body(carry, _):
            wv = jnp.where(carry > 0, w2, w)
            h1, _, cnt, ok = icfl_family_hashes_fused(
                wv, l, family="ICFL_COMB", seed=42, pack="dna16"
            )
            return (h1[0] & jnp.uint64(1)).astype(jnp.int32), h1.sum() + ok.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=N)
        return sums

    return B * N * WINDOW / _chained_best(bench, w, w2, l)


def _bench_compare(R: int = 128, Q: int = 128, S: int = 1000, N: int = 8):
    """Pairwise sketch comparisons/s at the production tile size (BASELINE
    config 4's kernel).  Chained DEPENDENT dispatches (scan-wrapping this
    kernel faults on chip; dependencies serialize honestly)."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.compare import pairwise_common_denom

    rng = np.random.default_rng(1)

    def mk(n):
        a = rng.integers(0, 1 << 62, size=(n, S + 64), dtype=np.uint64)
        return jnp.asarray(np.sort(a, axis=1)[:, :S])

    ref, qry = mk(R), mk(Q)
    rl = jnp.full((R,), S, jnp.int32)
    ql = jnp.full((Q,), S, jnp.int32)
    f = jax.jit(
        lambda q, t: pairwise_common_denom(ref, rl, q ^ t, ql, sketch_size=S)[0]
    )

    def chain():
        t = jnp.uint64(0)
        c = None
        for _ in range(N):
            c = f(qry, t)
            t = (c[0, 0] & 1).astype(jnp.uint64)
        return c

    return R * Q * N / _chained_best(chain)


def _bench_kmer(Nseq: int = 1 << 20, k: int = 21, N: int = 8):
    """Classic k=21 sketch path: window+canonical+murmur (chained scan) and
    bottom-k (dependent dispatches), combined as a pipeline rate."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.bottomk import bottom_k_threshold
    from fpmash_tpu.ops.kmers import kmer_hashes

    rng = np.random.default_rng(2)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = jnp.asarray(lut[rng.integers(0, 4, size=Nseq)])
    seq2 = jnp.asarray(lut[rng.integers(0, 4, size=Nseq)])
    length = jnp.int32(Nseq)
    pool = jnp.asarray(rng.integers(1, 1 << 62, size=Nseq, dtype=np.uint64))

    @jax.jit
    def bench_kmer(seq, seq2):
        def body(carry, _):
            sv = jnp.where(carry > 0, seq2, seq)
            h, valid = kmer_hashes(sv, length, k=k, seed=42, use64=True)
            return (h[0] & jnp.uint64(1)).astype(jnp.int32), h.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=N)
        return sums

    bk = jax.jit(
        lambda pool, t: bottom_k_threshold(pool ^ t, (pool ^ t) > 0, s=1000)[0]
    )

    def chain():
        t = jnp.uint64(0)
        vals = None
        for _ in range(N):
            vals = bk(pool, t)
            t = vals[0] & jnp.uint64(1)
        return vals

    r_kmer = Nseq * N / _chained_best(bench_kmer, seq, seq2)
    r_bk = Nseq * N / _chained_best(chain)
    return 1.0 / (1.0 / r_kmer + 1.0 / r_bk)


if __name__ == "__main__":
    sys.exit(main())
