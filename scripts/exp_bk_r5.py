"""Round-5 bottom-k A/B: row-sort compaction vs group-extraction.

The round-4 verdict: the classic pipeline is bottom-k-bound (793 M vs a
4.17 G hash sub-rate), with the full-pool one-key ROW SORT as the
presumed limiter.  Round 5 replaces it (need_counts=False path) with two
rounds of per-group iterated min-extraction — reduces + masks only, no
sort until the ~N/32 candidate volume.

Interleaved A/B in ONE process (memory: separate-process slope runs of
the same kernel swing 0.5-1.5 G): compile all variants first, then
alternate timed reps; rate = slope between two chain lengths.

Usage: python scripts/exp_bk_r5.py {bk,classic} [N] [I1] [I2]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "bk"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 22
    I1 = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    I2 = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    import jax
    import jax.numpy as jnp

    print(f"which={which} N={N} backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(2)

    if which.startswith("topk_kernel:"):
        # kernel-level A/B: production topk vs the sublane-rotation
        # variant (one variant per process — pallas relay rule)
        from fpmash_tpu.ops.kmers_pallas import (
            kmer_hashes_packed_topk8r_planes,
            kmer_hashes_packed_topk_planes,
        )

        fn0 = (
            kmer_hashes_packed_topk8r_planes
            if which.split(":", 1)[1] == "rot"
            else kmer_hashes_packed_topk_planes
        )
        codes = jnp.asarray(rng.integers(0, 4, size=N).astype(np.uint32))
        codes2 = jnp.asarray(rng.integers(0, 4, size=N).astype(np.uint32))
        frac = min(1.0, 8.0 * 1000 / max(N - 20, 1))
        t_hi = jnp.uint32(min(0xFFFFFFFF, int(frac * 2**32)))
        length = jnp.int32(N)

        def make(iters):
            @jax.jit
            def bench(codes, codes2):
                t = jnp.uint32(0)
                acc = jnp.uint32(0)
                for _ in range(iters):
                    cv = jnp.where(t > 0, codes2, codes)
                    clo, chi, ovf = fn0(cv, t_hi, length, k=21, seed=42)
                    t = clo[0] & jnp.uint32(1)
                    acc = acc + jnp.sum(clo, dtype=jnp.uint32)
                return acc

            return bench, (codes, codes2)

        best = {}
        for i in (I1, I2):
            fn, args = make(i)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            print(f"  compile {i}: {time.perf_counter()-t0:.1f}s", flush=True)
            b = float("inf")
            for _ in range(4):
                try:
                    t0 = time.perf_counter()
                    jax.device_get(fn(*args))
                    b = min(b, time.perf_counter() - t0)
                except Exception as e:
                    print(f"  rep error {i}: {type(e).__name__}", flush=True)
            best[i] = b
        rate = N * (I2 - I1) / max(best[I2] - best[I1], 1e-9)
        print(
            f"{which}: t({I1})={best[I1]*1e3:.1f}ms "
            f"t({I2})={best[I2]*1e3:.1f}ms slope={rate/1e9:.3f} G/s",
            flush=True,
        )
        return 0

    if which.startswith("classic_one:"):
        # ONE variant, TWO executables, bench.py's exact proven pattern —
        # any third executable embedding the same pallas kernel makes its
        # re-execution fault through the relay (queue1/3/5, 2026-08-21)
        from fpmash_tpu.ops.kmers import classic_sketch_device

        topk = which.split(":", 1)[1] == "topk"
        lut = np.frombuffer(b"ACGT", dtype=np.uint8)
        seq = jnp.asarray(lut[rng.integers(0, 4, size=N)])
        seq2 = jnp.asarray(lut[rng.integers(0, 4, size=N)])
        length = jnp.int32(N)

        def make(iters):
            @jax.jit
            def bench(seq, seq2):
                t = jnp.uint8(0)
                acc = jnp.uint64(0)
                for _ in range(iters):
                    sv = jnp.where(t > 0, seq2, seq)
                    vals, counts, n, ok = classic_sketch_device(
                        sv, length, k=21, s=1000, seed=42, use_topk=topk
                    )
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint8)
                    acc = acc + vals.sum()
                return acc

            return bench, (seq, seq2)

        best = {}
        for i in (I1, I2):
            fn, args = make(i)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            print(f"  compile {i}: {time.perf_counter()-t0:.1f}s", flush=True)
            b = float("inf")
            for _ in range(4):
                try:
                    t0 = time.perf_counter()
                    jax.device_get(fn(*args))
                    b = min(b, time.perf_counter() - t0)
                except Exception as e:
                    print(f"  rep error {i}: {type(e).__name__}", flush=True)
            best[i] = b
        rate = N * (I2 - I1) / max(best[I2] - best[I1], 1e-9)
        print(
            f"{which}: t({I1})={best[I1]*1e3:.1f}ms "
            f"t({I2})={best[I2]*1e3:.1f}ms slope={rate/1e9:.3f} G/s",
            flush=True,
        )
        return 0

    variants = {}
    if which == "bk":
        from fpmash_tpu.ops.bottomk import bottom_k_threshold_planes

        plo = jnp.asarray(
            rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
        )
        phi = jnp.asarray(
            rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
        )

        def make_bk(compact, iters):
            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint64(0)
                for _ in range(iters):
                    vals = bottom_k_threshold_planes(
                        plo ^ t, phi, (plo ^ t) > 0, s=1000,
                        need_counts=False, compact=compact,
                    )[0]
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                    acc = acc + vals.sum()
                return acc

            return bench, (plo, phi)

        def make_nz(iters, s=1000, boost=1):
            # candidate compaction via jnp.nonzero (cumsum + bincount)
            # straight off the threshold mask — no row sort, no group
            # extraction; selection tail as in the compact path
            from fpmash_tpu.ops.bottomk import _sort_planes_flat

            U32MAX = jnp.uint32(0xFFFFFFFF)
            cap = 1 << 15
            frac = min(1.0, (8.0 * s * boost) / N)
            t_hi = jnp.uint32(min(0xFFFFFFFF, int(frac * float(2**32))))

            def one(lo, hi):
                mask = (lo > 0) & (hi <= t_hi)
                idx = jnp.nonzero(mask, size=cap, fill_value=N)[0]
                opad = idx >= N
                idx = jnp.minimum(idx, N - 1)
                chi = jnp.where(opad, U32MAX, hi[idx])
                clo = jnp.where(opad, U32MAX, lo[idx])
                chi, clo = _sort_planes_flat(chi, clo)
                neq = (chi[1:] != chi[:-1]) | (clo[1:] != clo[:-1])
                is_start = jnp.concatenate([jnp.array([True]), neq]) & ~(
                    (chi == U32MAX) & (clo == U32MAX)
                )
                oi = jnp.nonzero(is_start, size=s, fill_value=cap)[0]
                op = oi >= cap
                oi = jnp.minimum(oi, cap - 1)
                v = (chi[oi].astype(jnp.uint64) << jnp.uint64(32)) | clo[
                    oi
                ].astype(jnp.uint64)
                return jnp.where(op, jnp.uint64(0xFFFFFFFFFFFFFFFF), v)

            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint64(0)
                for _ in range(iters):
                    vals = one(plo ^ t, phi)
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                    acc = acc + vals.sum()
                return acc

            return bench, (plo, phi)

        for name, compact in (("row", False), ("cmp", True)):
            variants[name] = {i: make_bk(compact, i) for i in (I1, I2)}
        variants["nz"] = {i: make_nz(i) for i in (I1, I2)}
    else:
        from fpmash_tpu.ops.kmers import classic_sketch_device

        lut = np.frombuffer(b"ACGT", dtype=np.uint8)
        seq = jnp.asarray(lut[rng.integers(0, 4, size=N)])
        seq2 = jnp.asarray(lut[rng.integers(0, 4, size=N)])
        length = jnp.int32(N)

        # on-chip parity gate before trusting any topk perf number: the
        # sort networks are new Mosaic surface (s=16 so the 2048*s gate
        # admits the topk route at this small shape)
        Ns = 1 << 16
        seqs = jnp.asarray(lut[rng.integers(0, 4, size=Ns)])
        a = jax.device_get(
            classic_sketch_device(
                seqs, jnp.int32(Ns), k=21, s=16, seed=42, use_topk=True
            )
        )
        b = jax.device_get(
            classic_sketch_device(
                seqs, jnp.int32(Ns), k=21, s=16, seed=42, use_topk=False
            )
        )
        assert bool(a[3]) and bool(b[3]), (a[3], b[3])
        assert np.array_equal(a[0], b[0]) and int(a[2]) == int(b[2])
        print("  topk parity on chip: OK", flush=True)

        def make_classic(topk, iters):
            @jax.jit
            def bench(seq, seq2):
                t = jnp.uint8(0)
                acc = jnp.uint64(0)
                for _ in range(iters):
                    sv = jnp.where(t > 0, seq2, seq)
                    vals, counts, n, ok = classic_sketch_device(
                        sv, length, k=21, s=1000, seed=42, use_topk=topk
                    )
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint8)
                    acc = acc + vals.sum()
                return acc

            return bench, (seq, seq2)

        for name, topk in (("masked", False), ("topk", True)):
            variants[name] = {i: make_classic(topk, i) for i in (I1, I2)}

    if which == "classic":
        # SEQUENTIAL per-executable timing (bench.py's proven pattern):
        # interleaving 4+ pallas-bearing executables faults
        # deterministically on the first RE-execution through the relay
        # ("INVALID_ARGUMENT: TPU backend error" — 3/3 runs, queue1-3
        # 2026-08-21); two interleaved pallas executables (the cohort
        # A/B) are fine, as is compile-then-reps per executable.
        best = {}
        for name, by_iter in variants.items():
            for i, (fn, args) in by_iter.items():
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*args))
                print(f"  compile {name}/{i}: {time.perf_counter()-t0:.1f}s",
                      flush=True)
                b = float("inf")
                for _ in range(4):
                    try:
                        t0 = time.perf_counter()
                        jax.device_get(fn(*args))
                        b = min(b, time.perf_counter() - t0)
                    except Exception as e:
                        print(f"  rep error {name}/{i}: "
                              f"{type(e).__name__}: {str(e)[:120]}",
                              flush=True)
                best[(name, i)] = b
        for name in variants:
            t1, t2 = best[(name, I1)], best[(name, I2)]
            if t1 == float("inf") or t2 == float("inf"):
                print(f"{name}: NO DATA", flush=True)
                continue
            rate = N * (I2 - I1) / max(t2 - t1, 1e-9)
            print(
                f"{name}: t({I1})={t1*1e3:.1f}ms t({I2})={t2*1e3:.1f}ms "
                f"slope={rate/1e9:.3f} G/s",
                flush=True,
            )
        return 0

    # compile everything first
    for name, by_iter in variants.items():
        for i, (fn, args) in by_iter.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            print(f"  compile {name}/{i}: {time.perf_counter()-t0:.1f}s", flush=True)

    # interleaved timed reps; a single relay fault (INVALID_ARGUMENT
    # flake, hit 2026-08-21 on the classic A/B) must not kill the run —
    # and a fault can poison the input device buffers (every subsequent
    # call then raises ValueError), so keep host copies and re-upload
    # after any error
    host_args = {
        (name, i): tuple(np.asarray(a) for a in by_iter[i][1])
        for name, by_iter in variants.items()
        for i in by_iter
    }
    REPS = 4
    best = {(name, i): float("inf") for name in variants for i in (I1, I2)}
    for _ in range(REPS):
        for name, by_iter in variants.items():
            for i, (fn, args) in by_iter.items():
                try:
                    t0 = time.perf_counter()
                    jax.device_get(fn(*args))
                    best[(name, i)] = min(
                        best[(name, i)], time.perf_counter() - t0
                    )
                except Exception as e:
                    print(
                        f"  rep error {name}/{i}: {type(e).__name__}: "
                        f"{str(e)[:160]}",
                        flush=True,
                    )
                    # inputs are shared across variants: refresh them ALL
                    for n2, bi2 in variants.items():
                        for i2 in bi2:
                            bi2[i2] = (
                                bi2[i2][0],
                                tuple(
                                    jnp.asarray(a)
                                    for a in host_args[(n2, i2)]
                                ),
                            )

    for name in variants:
        t1, t2 = best[(name, I1)], best[(name, I2)]
        if t1 == float("inf") or t2 == float("inf"):
            print(f"{name}: NO DATA (all reps errored)", flush=True)
            continue
        rate = N * (I2 - I1) / max(t2 - t1, 1e-9)
        print(
            f"{name}: t({I1})={t1*1e3:.1f}ms t({I2})={t2*1e3:.1f}ms "
            f"slope={rate/1e9:.3f} G/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
