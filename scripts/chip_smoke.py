"""On-chip parity smoke: every Pallas/device kernel vs the scalar chain.

Mosaic has a history of silent on-chip miscompiles that interpret-mode
tests cannot catch (unsigned reductions, i1 carries — commit 7502253), so
this script runs each production kernel ONCE on the real TPU with small
shapes and asserts values against the pure-Python parity models.

Coverage:
  * fused CFL kernel (ops/fused_pallas.py): inline + split variants, byte4
    + dna16 packings, including rows with non-ACGT bytes (byte4 only).
  * fused ICFL / ICFL_COMB kernel (ops/icfl_pallas.py), both packings.
  * packed k-mer path (ops/kmers.py) k=21 canonical.
  * bottom-k (ops/bottomk.py) and pairwise compare (ops/compare.py).

Each jitted shape costs one tunnel compile (2-15 min cold); expect ~10-40
minutes end to end.  Exit code 0 = all parity checks passed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_smoke.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _words(rng, n, width, pure=True):
    chars = b"ACGT" if pure else b"ACGTN"
    lut = np.frombuffer(chars, dtype=np.uint8)
    arr = lut[rng.integers(0, len(lut), size=(n, width))]
    return arr


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.scalar.lyndon import cfl, d_icfl, icfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    failures = []

    def check(name, got, want):
        ok = all(int(g) == w for g, w in zip(got, want))
        print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures.append(name)

    def guard(name, fn):
        """One crashing kernel (e.g. a Mosaic compile regression) must not
        mask the remaining checks — run each section through this."""
        try:
            fn()
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:160]}", flush=True)
            failures.append(name)

    B, W = 512, 100
    lens = np.full((B,), W, np.int32)

    # --- fused CFL: variants x packings, plus non-ACGT bytes on byte4 ---
    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused

    def _cfl_case(variant, pack):
        arr = _words(rng, B, W, pure=(pack == "dna16"))
        t0 = time.perf_counter()
        h1, _, fc = jax.device_get(
            fingerprint_hashes_fused(
                jnp.asarray(arr), jnp.asarray(lens), seed=42,
                pack=pack, variant=variant,
            )
        )
        want = [
            hash_u64_vector(
                [len(f) for f in cfl(r.tobytes().decode())], seed=42, use64=True
            )
            for r in arr[:64]
        ]
        check(
            f"cfl/{variant}/{pack} ({time.perf_counter()-t0:.0f}s)",
            h1[:64], want,
        )

    for variant in ("inline", "split"):
        for pack in ("byte4", "dna16"):
            guard(f"cfl/{variant}/{pack}", lambda v=variant, p=pack: _cfl_case(v, p))

    # --- split kernel at generalized chunk width (M=10 mask words) ---
    def _l300_case():
        arr = _words(rng, B, 300, pure=True)
        lens300 = np.full((B,), 300, np.int32)
        t0 = time.perf_counter()
        h1, _, fc = jax.device_get(
            fingerprint_hashes_fused(
                jnp.asarray(arr), jnp.asarray(lens300), seed=42,
                pack="dna16", variant="split",
            )
        )
        want = [
            hash_u64_vector(
                [len(f) for f in cfl(r.tobytes().decode())], seed=42, use64=True
            )
            for r in arr[:64]
        ]
        check(f"cfl/split/dna16/L300 ({time.perf_counter()-t0:.0f}s)", h1[:64], want)

    guard("cfl/split/dna16/L300", _l300_case)

    # --- fused ICFL / ICFL_COMB ---
    from fpmash_tpu.ops.icfl_pallas import icfl_family_hashes_fused

    def _icfl_case(family, fn, pack):
        arr = _words(rng, B, W, pure=True)
        t0 = time.perf_counter()
        h1, _, cnt, ok = jax.device_get(
            icfl_family_hashes_fused(
                jnp.asarray(arr), jnp.asarray(lens), family=family,
                seed=42, pack=pack,
            )
        )
        assert ok.all()
        want = [
            hash_u64_vector(
                [len(f) for f in fn(r.tobytes().decode())], seed=42, use64=True
            )
            for r in arr[:64]
        ]
        check(
            f"{family.lower()}/{pack} ({time.perf_counter()-t0:.0f}s)",
            h1[:64], want,
        )

    for family, fn in (("ICFL", icfl), ("ICFL_COMB", d_icfl)):
        for pack in ("byte4", "dna16"):
            guard(f"{family.lower()}/{pack}",
                  lambda f=family, sc=fn, p=pack: _icfl_case(f, sc, p))

    # --- packed k-mer path k=21 canonical ---
    from fpmash_tpu.ops.kmers import kmer_hashes
    from fpmash_tpu.scalar.murmur3 import hash_bytes

    def _kmer_case():
        N = 4096
        seq = _words(rng, 1, N, pure=True)[0]
        t0 = time.perf_counter()
        h, valid = jax.device_get(
            kmer_hashes(jnp.asarray(seq), jnp.int32(N), k=21, seed=42, use64=True)
        )
        comp = {65: 84, 67: 71, 71: 67, 84: 65}
        want = []
        sb = seq.tobytes()
        for i in range(64):
            kmer = sb[i : i + 21]
            rc = bytes(comp[c] for c in reversed(kmer))
            want.append(hash_bytes(min(kmer, rc), seed=42, use64=True))
        assert valid[:64].all()
        check(f"kmer21 ({time.perf_counter()-t0:.0f}s)", h[:64], want)

    guard("kmer21", _kmer_case)

    def _kmer32_case():
        # k=32 is the packed kernel's s_lo==32 edge: a full-bit-width u32
        # shift there is implementation-defined (XLA:CPU yields 0, Mosaic
        # may mask the amount), so the kernel special-cases it — assert
        # the on-chip lowering agrees with the scalar chain
        N = 4096
        seq = _words(rng, 1, N, pure=True)[0]
        t0 = time.perf_counter()
        h, valid = jax.device_get(
            kmer_hashes(jnp.asarray(seq), jnp.int32(N), k=32, seed=42, use64=True)
        )
        comp = {65: 84, 67: 71, 71: 67, 84: 65}
        want = []
        sb = seq.tobytes()
        for i in range(64):
            kmer = sb[i : i + 32]
            rc = bytes(comp[c] for c in reversed(kmer))
            want.append(hash_bytes(min(kmer, rc), seed=42, use64=True))
        assert valid[:64].all()
        check(f"kmer32-packed ({time.perf_counter()-t0:.0f}s)", h[:64], want)

    guard("kmer32-packed", _kmer32_case)

    # --- bottom-k + compare ---
    from fpmash_tpu.ops.bottomk import bottom_k_distinct, bottom_k_host
    from fpmash_tpu.ops.compare import pairwise_common_denom

    def _bottomk_case():
        pool = rng.integers(1, 1 << 40, size=8192, dtype=np.uint64)
        t0 = time.perf_counter()
        vals, counts, nv = jax.device_get(
            bottom_k_distinct(jnp.asarray(pool), jnp.ones(8192, bool), s=128)
        )
        wv, wc = bottom_k_host(pool, 128)
        check(f"bottomk ({time.perf_counter()-t0:.0f}s)", vals[: len(wv)], list(map(int, wv)))

    guard("bottomk", _bottomk_case)

    def _bottomk_planes_case():
        # threshold-filtered planes path (the production pool route)
        from fpmash_tpu.ops.bottomk import bottom_k_threshold

        pool = rng.integers(1, 1 << 63, size=1 << 18, dtype=np.uint64)
        pool[:2000] = pool[2000:4000]  # duplicates exercise run counts
        t0 = time.perf_counter()
        vals, counts, nv, ok = jax.device_get(
            bottom_k_threshold(
                jnp.asarray(pool), jnp.ones(len(pool), bool), s=256
            )
        )
        wv, wc = bottom_k_host(pool, 256)
        assert bool(ok)
        got = [int(v) * 7 + int(c) for v, c in zip(vals[: len(wv)], counts[: len(wc)])]
        want = [int(v) * 7 + int(c) for v, c in zip(wv, wc)]
        check(f"bottomk-planes ({time.perf_counter()-t0:.0f}s)", got, want)

    guard("bottomk-planes", _bottomk_planes_case)

    def _bottomk_nocounts_case():
        # need_counts=False fast path (default-CLI sketching): identical
        # value set, counts reported as 1
        from fpmash_tpu.ops.bottomk import bottom_k_threshold

        pool = rng.integers(1, 1 << 63, size=1 << 18, dtype=np.uint64)
        pool[:2000] = pool[2000:4000]
        t0 = time.perf_counter()
        vals, counts, nv, ok = jax.device_get(
            bottom_k_threshold(
                jnp.asarray(pool), jnp.ones(len(pool), bool), s=256,
                need_counts=False,
            )
        )
        wv, _ = bottom_k_host(pool, 256)
        assert bool(ok)
        assert all(int(c) == 1 for c in counts[: len(wv)])
        check(
            f"bottomk-nocounts ({time.perf_counter()-t0:.0f}s)",
            vals[: len(wv)],
            list(map(int, wv)),
        )

    guard("bottomk-nocounts", _bottomk_nocounts_case)

    def _bottomk_compact_case():
        # round-5 group-extraction compaction (s small enough for the
        # 2048*s density gate at this pool size) — u32 min-reduce
        # semantics on chip vs the host model
        from fpmash_tpu.ops.bottomk import _compact_supported, bottom_k_threshold

        N, s = 1 << 18, 64
        assert _compact_supported(N, s, 1, 1, False)
        pool = rng.integers(1, 1 << 63, size=N, dtype=np.uint64)
        pool[:1000] = pool[1000:2000]  # cross-group duplicates
        t0 = time.perf_counter()
        vals, counts, nv, ok = jax.device_get(
            bottom_k_threshold(
                jnp.asarray(pool), jnp.ones(N, bool), s=s, need_counts=False,
                compact=True,
            )
        )
        wv, _ = bottom_k_host(pool, s)
        assert bool(ok)
        assert all(int(c) == 1 for c in counts[: len(wv)])
        check(
            f"bottomk-compact ({time.perf_counter()-t0:.0f}s)",
            vals[: len(wv)],
            list(map(int, wv)),
        )

    guard("bottomk-compact", _bottomk_compact_case)

    def _flat_words_case():
        # device-side window-word builder + words-entry fused kernel
        # (the sketch --direct-fp flat-stream route)
        from fpmash_tpu.ops.fused_pallas import (
            dna16_window_words,
            fingerprint_hashes_fused_words,
        )
        from fpmash_tpu.scalar.murmur3 import hash_u64_vector

        W = 100
        reads = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=n))
                 for n in (150, 230)]
        code_map = np.zeros(256, np.uint8)
        for v, ch in enumerate(b"ACGT"):
            code_map[ch] = v
        segs, st, wins = [], [], []
        off = 0
        for seq in reads:
            dbl = seq + seq[: W - 1]
            segs.append(code_map[np.frombuffer(dbl.encode(), np.uint8)])
            st.append(np.arange(off, off + len(seq), dtype=np.int32))
            off += len(seq) + W - 1
            for i in range(len(seq)):
                wins.append(dbl[i : i + W])
        flat = np.concatenate(segs)
        starts = np.concatenate(st)
        lens = np.full(len(starts), W, np.int32)
        t0 = time.perf_counter()
        words = dna16_window_words(
            jnp.asarray(flat), jnp.asarray(starts), nwords=-(-W // 16), L=W
        )
        h1, _, fc = jax.device_get(
            fingerprint_hashes_fused_words(
                words, jnp.asarray(lens), L=W, seed=42
            )
        )
        want, got = [], []
        for i in (0, 1, len(wins) // 2, len(wins) - 1):
            fac = [len(f) for f in cfl(wins[i])]
            want.append(hash_u64_vector(fac, seed=42, use64=True) * 131 + len(fac))
            got.append(int(h1[i]) * 131 + int(fc[i]))
        check(f"flat-words ({time.perf_counter()-t0:.0f}s)", got, want)

    guard("flat-words", _flat_words_case)

    def _classic_fused_case():
        # fused seq -> bottom-k pipeline (classic_sketch_device)
        from fpmash_tpu.ops.kmers import classic_sketch_device
        from fpmash_tpu.models.sketch import _kmer_hash_pool_scalar, SketchParams

        seq = _words(rng, 1, 20000, pure=True)[0]
        t0 = time.perf_counter()
        vals, counts, nv, ok = jax.device_get(
            classic_sketch_device(
                jnp.asarray(seq), jnp.int32(20000), k=21, s=64, seed=42
            )
        )
        p = SketchParams(kmer_size=21, sketch_size=64)
        pool = _kmer_hash_pool_scalar([seq.tobytes().decode()], p)
        wv, wc = bottom_k_host(pool, 64)
        assert bool(ok)
        got = [int(v) * 7 + int(c) for v, c in zip(vals[: len(wv)], counts[: len(wc)])]
        want = [int(v) * 7 + int(c) for v, c in zip(wv, wc)]
        check(f"classic-fused ({time.perf_counter()-t0:.0f}s)", got, want)

    guard("classic-fused", _classic_fused_case)

    def _classic_reads_case():
        # reads-mode collect-all contract (out_slots): every sub-threshold
        # survivor + exact counts, asserted against the scalar pool
        from fpmash_tpu.ops.kmers import classic_sketch_device
        from fpmash_tpu.models.sketch import _kmer_hash_pool_scalar, SketchParams

        seq = _words(rng, 1, 20000, pure=True)[0]
        seq[3000:6000] = seq[:3000]  # duplicated region: counts matter
        t0 = time.perf_counter()
        vals, counts, nv, ok = jax.device_get(
            classic_sketch_device(
                jnp.asarray(seq), jnp.int32(20000), k=21, s=16, seed=42,
                out_slots=2048,
            )
        )
        assert bool(ok)
        nv = int(nv)
        p = SketchParams(kmer_size=21, sketch_size=16)
        pool = _kmer_hash_pool_scalar([seq.tobytes().decode()], p)
        uv, uc = np.unique(pool, return_counts=True)
        # the kernel's threshold uses the UNPADDED input length
        # (classic_sketch_device: N = seq.shape[0])
        frac = min(1.0, 8.0 * 16 / (20000 - 20))
        t_hi = min(0xFFFFFFFF, int(frac * 2**32))
        keep = (uv >> np.uint64(32)) <= t_hi
        want_v, want_c = uv[keep], uc[keep]
        got = [int(v) * 131 + int(c) for v, c in zip(vals[:nv], counts[:nv])]
        want = [int(v) * 131 + int(c) for v, c in zip(want_v, want_c)]
        check(f"classic-reads-collectall ({time.perf_counter()-t0:.0f}s)", got, want)

    guard("classic-reads-collectall", _classic_reads_case)

    def _classic_reads_topk_case():
        # reads collect-all THROUGH the topk kernel (N >= 2048*s engages
        # the in-kernel compaction; duplicates must survive with exact
        # counts)
        from fpmash_tpu.ops.kmers import classic_sketch_device
        from fpmash_tpu.models.sketch import _kmer_hash_pool_scalar, SketchParams

        Nr = 1 << 16
        seq = _words(rng, 1, Nr, pure=True)[0]
        seq[8000:16000] = seq[:8000]  # duplicated region
        t0 = time.perf_counter()
        vals, counts, nv, ok = jax.device_get(
            classic_sketch_device(
                jnp.asarray(seq), jnp.int32(Nr), k=21, s=16, seed=42,
                out_slots=2048,
            )
        )
        assert bool(ok)
        nv = int(nv)
        p = SketchParams(kmer_size=21, sketch_size=16)
        pool = _kmer_hash_pool_scalar([seq.tobytes().decode()], p)
        uv, uc = np.unique(pool, return_counts=True)
        frac = min(1.0, 8.0 * 16 / (Nr - 20))
        t_hi = min(0xFFFFFFFF, int(frac * 2**32))
        keep = (uv >> np.uint64(32)) <= t_hi
        want_v, want_c = uv[keep], uc[keep]
        got = [int(v) * 131 + int(c) for v, c in zip(vals[:nv], counts[:nv])]
        want = [int(v) * 131 + int(c) for v, c in zip(want_v, want_c)]
        check(f"classic-reads-topk ({time.perf_counter()-t0:.0f}s)", got, want)

    guard("classic-reads-topk", _classic_reads_topk_case)

    S = 128
    ref = np.stack([np.unique(rng.integers(1, 1 << 30, size=S * 2, dtype=np.uint64))[:S] for _ in range(8)])
    qry = np.stack([np.unique(rng.integers(1, 1 << 30, size=S * 2, dtype=np.uint64))[:S] for _ in range(8)])
    rl = np.full(8, S, np.int32)
    from fpmash_tpu.models.distance import compare_sketches

    wantc = []
    for i in range(8):
        for j in range(8):
            r = compare_sketches(ref[i], qry[j], 0, 0, S, 21, 4.0**21)
            wantc.append(r.numer * 100000 + r.denom)

    def _compare_case():
        t0 = time.perf_counter()
        c, d = jax.device_get(
            pairwise_common_denom(
                jnp.asarray(ref), jnp.asarray(rl), jnp.asarray(qry), jnp.asarray(rl),
                sketch_size=S,
            )
        )
        gotc = [int(c[i, j]) * 100000 + int(d[i, j]) for i in range(8) for j in range(8)]
        check(f"compare ({time.perf_counter()-t0:.0f}s)", gotc, wantc)

    guard("compare", _compare_case)

    def _compare_pallas_case():
        # 16x16 rows -> grid (2, 2): a NONTRIVIAL grid is load-bearing.
        # With grid (1, 1) Mosaic folds the BlockSpec index maps away,
        # which hid the x64 index-map i64 promotion bug ("failed to
        # legalize 'func.return' (i32, i64)", root-caused 2026-08-21) from
        # this smoke for a whole round.
        from fpmash_tpu.ops.compare_pallas import pairwise_common_denom_pallas

        ref2 = np.concatenate([ref, ref[::-1]])
        qry2 = np.concatenate([qry, qry[::-1]])
        rl2 = np.full(16, S, np.int32)
        wantp = []
        for i in range(16):
            for j in range(16):
                r = compare_sketches(ref2[i], qry2[j], 0, 0, S, 21, 4.0**21)
                wantp.append(r.numer * 100000 + r.denom)
        t0 = time.perf_counter()
        cp, dp = jax.device_get(
            pairwise_common_denom_pallas(
                jnp.asarray(ref2), jnp.asarray(rl2), jnp.asarray(qry2),
                jnp.asarray(rl2), sketch_size=S,
            )
        )
        gotp = [int(cp[i, j]) * 100000 + int(dp[i, j]) for i in range(16) for j in range(16)]
        check(f"compare-pallas-grid2x2 ({time.perf_counter()-t0:.0f}s)", gotp, wantp)

    guard("compare-pallas", _compare_pallas_case)

    # --- positional fingerprint compare (triangle -fp kernel) ---
    from fpmash_tpu.ops.compare import pairwise_positional

    def _positional_case():
        h = rng.integers(0, 1 << 30, size=(16, 64), dtype=np.uint64)
        lens_p = rng.integers(1, 65, size=16).astype(np.int32)
        t0 = time.perf_counter()
        m, nmin = jax.device_get(
            pairwise_positional(jnp.asarray(h), jnp.asarray(lens_p))
        )
        want = []
        got = []
        for a in range(16):
            for b in range(16):
                n = int(min(lens_p[a], lens_p[b]))
                want.append(int(np.sum(h[a, :n] == h[b, :n])) * 1000 + n)
                got.append(int(m[a, b]) * 1000 + int(nmin[a, b]))
        check(f"positional ({time.perf_counter()-t0:.0f}s)", got, want)

    guard("positional", _positional_case)

    # --- unsorted-walk Pallas kernel (dist -fp path), grid (2, 2) ---
    def _walk_pallas_case():
        from fpmash_tpu.ops.walk_pallas import pairwise_walk_pallas

        wrng = np.random.default_rng(3)
        Rw = Qw = 16
        Lw = 40
        wref = wrng.integers(0, 60, size=(Rw, Lw)).astype(np.uint64)
        wqry = wrng.integers(0, 60, size=(Qw, Lw)).astype(np.uint64)
        wrl = wrng.integers(1, Lw + 1, size=Rw).astype(np.int32)
        wql = wrng.integers(1, Lw + 1, size=Qw).astype(np.int32)
        t0 = time.perf_counter()
        c, d = jax.device_get(
            pairwise_walk_pallas(
                jnp.asarray(wref), jnp.asarray(wrl), jnp.asarray(wqry),
                jnp.asarray(wql), sketch_size=50,
            )
        )
        want = []
        got = []
        for i in range(Rw):
            for jj in range(Qw):
                r = compare_sketches(
                    wref[i, : wrl[i]], wqry[jj, : wql[jj]], 100, 100, 50, 21,
                    4.0**21,
                )
                want.append(r.numer * 100000 + r.denom)
                got.append(int(c[i, jj]) * 100000 + int(d[i, jj]))
        check(f"walk-pallas-grid2x2 ({time.perf_counter()-t0:.0f}s)", got, want)

    guard("walk-pallas", _walk_pallas_case)

    # --- windowed minmer marks (find / -W path) ---
    def _winnow_case():
        from fpmash_tpu.ops.winnow import minmer_positions

        hpool = rng.integers(1, 1 << 40, size=5000, dtype=np.uint64)
        # force duplicates so prev-occurrence logic is exercised
        hpool[1000:1200] = hpool[0:200]
        t0 = time.perf_counter()
        pos_j, h_j = minmer_positions(hpool, 200, 8, backend="jax")
        pos_s, h_s = minmer_positions(hpool, 200, 8, backend="scalar")
        check(
            f"winnow ({time.perf_counter()-t0:.0f}s)",
            list(pos_j) + list(h_j),
            list(map(int, pos_s)) + list(map(int, h_s)),
        )

    guard("winnow", _winnow_case)

    print("ALL OK" if not failures else f"FAILED: {failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
