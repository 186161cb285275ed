"""Slope-method rates: time N-dependent-iteration chains at two chain
lengths and report (work2-work1)/(t2-t1), cancelling the ~25 ms relay
round-trip constant that floors every small-call measurement on this rig
(discovered 2026-08-21: 48 adds/elem and the full 570-op slab kernel both
"measure" ~26 ms at 1M x 8 — the constant, not the device).

Modes: hash (slab kmer kernel), fused (classic_sketch_device),
fp (fingerprint fused), bk (bottom-k planes), walk, compare.

Usage: python scripts/exp_slope_r4.py MODE [N] [I1] [I2]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _best(fn, *args, reps: int = 3):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    mode = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 22
    I1 = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    I2 = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    print(f"mode={mode} N={N} I1={I1} I2={I2} backend={jax.default_backend()}",
          flush=True)

    def make_bench(iters):
        if mode == "hash":
            from fpmash_tpu.ops.kmers_pallas import kmer_hashes_slab_pallas_planes

            codes = jnp.asarray(rng.integers(0, 4, size=N).astype(np.uint32))
            codes2 = jnp.asarray(rng.integers(0, 4, size=N).astype(np.uint32))

            @jax.jit
            def bench(a, b):
                t = jnp.uint32(0)
                acc = jnp.uint32(0)
                for _ in range(iters):
                    cv = jnp.where(t > 0, b, a)
                    h1l, h1h, vw = kmer_hashes_slab_pallas_planes(cv, k=21, seed=42)
                    t = h1l[0] & jnp.uint32(1)
                    acc = acc + jnp.sum(h1l, dtype=jnp.uint32)
                return acc

            return bench, (codes, codes2), N

        if mode == "hash_packed":
            from fpmash_tpu.ops.kmers_pallas import kmer_hashes_packed_pallas_planes

            codes = jnp.asarray(rng.integers(0, 4, size=N).astype(np.uint32))
            codes2 = jnp.asarray(rng.integers(0, 4, size=N).astype(np.uint32))

            @jax.jit
            def bench(a, b):
                t = jnp.uint32(0)
                acc = jnp.uint32(0)
                for _ in range(iters):
                    cv = jnp.where(t > 0, b, a)
                    h1l, h1h, vw = kmer_hashes_packed_pallas_planes(
                        cv, k=21, seed=42
                    )
                    t = h1l[0] & jnp.uint32(1)
                    acc = acc + jnp.sum(h1l, dtype=jnp.uint32)
                return acc

            return bench, (codes, codes2), N

        if mode == "fused":
            from fpmash_tpu.ops.kmers import classic_sketch_device

            lut = np.frombuffer(b"ACGT", dtype=np.uint8)
            seq = jnp.asarray(lut[rng.integers(0, 4, size=N)])
            seq2 = jnp.asarray(lut[rng.integers(0, 4, size=N)])
            length = jnp.int32(N)

            @jax.jit
            def bench(a, b):
                t = jnp.uint8(0)
                acc = jnp.uint64(0)
                for _ in range(iters):
                    sv = jnp.where(t > 0, b, a)
                    vals, counts, n, ok = classic_sketch_device(
                        sv, length, k=21, s=1000, seed=42
                    )
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint8)
                    acc = acc + vals.sum()
                return acc

            return bench, (seq, seq2), N

        if mode == "fused_nobk":
            # classic pipeline MINUS bottom-k: byte->code map, routed hash
            # kernel, validity, and a sum consumer — isolates how much of
            # the fused time is the bk stage vs everything before it
            from fpmash_tpu.ops.kmers_pallas import kmer_hashes_route_planes

            lut = np.frombuffer(b"ACGT", dtype=np.uint8)
            seq = jnp.asarray(lut[rng.integers(0, 4, size=N)])
            seq2 = jnp.asarray(lut[rng.integers(0, 4, size=N)])
            length = jnp.int32(N)

            @jax.jit
            def bench(a, b):
                t = jnp.uint8(0)
                acc = jnp.uint32(0)
                for _ in range(iters):
                    sv = jnp.where(t > 0, b, a)
                    sequ = sv.astype(jnp.uint8)
                    lower = (sequ > 96) & (sequ < 123)
                    sequ = jnp.where(lower, sequ - 32, sequ)
                    code = jnp.full((N,), 4, jnp.uint32)
                    for v, ch in enumerate(b"ACGT"):
                        code = jnp.where(sequ == jnp.uint8(ch), jnp.uint32(v), code)
                    h1l, h1h, vw = kmer_hashes_route_planes(code, k=21, seed=42)
                    pos = jnp.arange(N, dtype=jnp.int32)
                    valid = vw & (pos <= length - 21)
                    t = (h1l[0] & jnp.uint32(1)).astype(jnp.uint8)
                    acc = (
                        acc
                        + jnp.sum(h1l, dtype=jnp.uint32)
                        + jnp.sum(h1h, dtype=jnp.uint32)
                        + jnp.sum(valid.astype(jnp.uint32), dtype=jnp.uint32)
                    )
                return acc

            return bench, (seq, seq2), N

        if mode == "fp":
            from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused

            B = N // 100
            lut = np.frombuffer(b"ACGT", dtype=np.uint8)
            w = jnp.asarray(lut[rng.integers(0, 4, size=(B, 100))])
            w2 = jnp.asarray(lut[rng.integers(0, 4, size=(B, 100))])
            l = jnp.asarray(np.full((B,), 100, np.int32))

            @jax.jit
            def bench(w, w2):
                def body(carry, _):
                    wv = jnp.where(carry > 0, w2, w)
                    h1, _, _ = fingerprint_hashes_fused(wv, l, seed=42, pack="dna16")
                    return (h1[0] & jnp.uint64(1)).astype(jnp.int32), h1.sum()

                _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
                return sums

            return bench, (w, w2), B * 100

        if mode == "bk":
            from fpmash_tpu.ops.bottomk import bottom_k_threshold_planes

            plo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
            phi = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))

            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint64(0)
                for _ in range(iters):
                    vals = bottom_k_threshold_planes(
                        plo ^ t, phi, (plo ^ t) > 0, s=1000
                    )[0]
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                    acc = acc + vals.sum()
                return acc

            return bench, (plo, phi), N

        if mode == "compare":
            from fpmash_tpu.ops.compare_pallas import pairwise_common_denom_pallas

            R = Q = 512
            S = 1000

            def mk(n):
                a = rng.integers(0, 1 << 62, size=(n, S + 64), dtype=np.uint64)
                return jnp.asarray(np.sort(a, axis=1)[:, :S])

            ref, qry = mk(R), mk(Q)
            rl = jnp.full((R,), S, jnp.int32)
            ql = jnp.full((Q,), S, jnp.int32)

            @jax.jit
            def bench(ref, qry):
                t = jnp.uint64(0)
                acc = jnp.int32(0)
                for _ in range(iters):
                    c, d = pairwise_common_denom_pallas(
                        ref, rl, qry ^ t, ql, sketch_size=S
                    )
                    t = (c[0, 0] & 1).astype(jnp.uint64)
                    acc = acc + c.sum().astype(jnp.int32)
                return acc

            return bench, (ref, qry), R * Q

        if mode == "walk":
            from fpmash_tpu.ops.walk_pallas import pairwise_walk_pallas

            R = Q = 256
            L = 64
            ref = jnp.asarray(rng.integers(0, 1 << 32, size=(R, L), dtype=np.uint64))
            qry = jnp.asarray(rng.integers(0, 1 << 32, size=(Q, L), dtype=np.uint64))
            rl = jnp.asarray(rng.integers(1, L + 1, size=R).astype(np.int32))
            ql = jnp.asarray(rng.integers(1, L + 1, size=Q).astype(np.int32))

            @jax.jit
            def bench(ref, qry):
                t = jnp.uint64(0)
                acc = jnp.int32(0)
                for _ in range(iters):
                    c, d = pairwise_walk_pallas(ref, rl, qry ^ t, ql, sketch_size=1000)
                    t = (c[0, 0] & 1).astype(jnp.uint64)
                    acc = acc + c.sum() + d.sum()
                return acc

            return bench, (ref, qry), R * Q

        raise SystemExit(f"unknown mode {mode}")

    b1, args1, per_iter = make_bench(I1)
    t1 = _best(b1, *args1)
    b2, args2, _ = make_bench(I2)
    t2 = _best(b2, *args2)
    rate = per_iter * (I2 - I1) / (t2 - t1)
    floor1 = t1 - per_iter * I1 / rate
    print(
        f"OK t({I1})={t1*1e3:.1f}ms t({I2})={t2*1e3:.1f}ms  "
        f"slope_rate={rate/1e6:.1f} M/s  implied_const={floor1*1e3:.1f}ms",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
