"""Bottom-k compaction variants on chip.

The threshold-filtered bottom-k (ops/bottomk.py) measured 0.149 Gbases/s
(~7 ms per 1M pool) in round 3's breakdown — the classic-path limiter.
Candidates: the [1024, 1024] two-u32-key row sort used for segmented
compaction.  Variants:

  cur      current bottom_k_threshold (2-key row sort, 1024 cols)
  key1     row sort with ONE u32 key (hi plane; non-candidates pushed to
           0xFFFFFFFF) carrying lo as payload — prefix-P membership only
           needs candidates-before-padding, not full u64 order
  cols256  key1 at [4096, 256] (cheaper per-element bitonic depth)
  minx     sort-free min-extraction: P rounds of (row-min, count, mask)
           over [8192, 128] — pure VPU min/eq/where, no lax.sort on the
           pool at all; final sort only over [8192*P] extracted values

Usage: python scripts/exp_bottomk.py MODE [N] [ITERS]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def main() -> int:
    mode = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    s = 1000

    import fpmash_tpu  # noqa: F401  (enables x64 — uint64 lanes need it)
    import jax
    import jax.numpy as jnp

    _U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)

    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.integers(1, 1 << 62, size=N, dtype=np.uint64))

    def threshold_mask(x, n_valid):
        frac = jnp.minimum((8.0 * s) / jnp.maximum(n_valid, 1.0), 1.0)
        t = jnp.where(frac >= 1.0, _U64MAX, (frac * float(2**64)).astype(jnp.uint64))
        return x <= t

    def finish(cand, cap):
        hi = (cand >> jnp.uint64(32)).astype(jnp.uint32)
        lo = (cand & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi, lo = jax.lax.sort((hi, lo), num_keys=2)
        c = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
        is_boundary = jnp.concatenate([jnp.array([True]), c[1:] != c[:-1]])
        is_start = is_boundary & (c != _U64MAX)
        idx_arr = jnp.arange(cap, dtype=jnp.int32)
        boundary_or_inf = jnp.where(is_boundary, idx_arr, cap)
        nxt = jax.lax.cummin(boundary_or_inf[::-1])[::-1]
        nxt = jnp.concatenate([nxt[1:], jnp.array([cap], jnp.int32)])
        run_count = jnp.where(is_start, nxt - idx_arr, 0).astype(jnp.uint32)
        out_idx = jnp.nonzero(is_start, size=s, fill_value=cap)[0]
        opad = out_idx >= cap
        out_idx = jnp.minimum(out_idx, cap - 1)
        values = jnp.where(opad, _U64MAX, c[out_idx])
        counts = jnp.where(opad, jnp.uint32(0), run_count[out_idx])
        return values, counts

    if mode == "cur":
        from fpmash_tpu.ops.bottomk import bottom_k_threshold

        def one(x):
            return bottom_k_threshold(x, x > 0, s=s)[0]

    elif mode in ("key1", "cols256"):
        cols = 1024 if mode == "key1" else 256

        def one(x):
            mask = threshold_mask(x, float(N))
            C = N // cols
            P = min(cols, max(16, -(-32 * s // C)))
            y = jnp.where(mask, x, _U64MAX).reshape(C, cols)
            yhi = (y >> jnp.uint64(32)).astype(jnp.uint32)
            ylo = (y & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            # ONE key: candidates (hi <= t_hi) sort before 0xFFFFFFFF pad;
            # order within candidates is irrelevant — the final sort
            # re-orders the compacted set exactly
            yhi, ylo = jax.lax.sort((yhi, ylo), num_keys=1)
            cand = (
                yhi[:, :P].astype(jnp.uint64) << jnp.uint64(32)
                | ylo[:, :P].astype(jnp.uint64)
            ).reshape(C * P)
            return finish(cand, C * P)[0]

    elif mode == "minx":
        cols = 128
        P = 16

        def one(x):
            mask = threshold_mask(x, float(N))
            R = N // cols
            y = jnp.where(mask, x, _U64MAX).reshape(R, cols)
            vals = []
            for _ in range(P):
                m = jnp.min(y, axis=1, keepdims=True)
                vals.append(m[:, 0])
                y = jnp.where(y == m, _U64MAX, y)
            # NB: this drops duplicate copies within a row (they collapse
            # into one extraction) — counts would need the per-row count
            # payload; this experiment only times the compaction shape
            cand = jnp.stack(vals, axis=1).reshape(R * P)
            return finish(cand, R * P)[0]

    elif mode == "xor_only":

        def one(x):
            y = x ^ jnp.uint64(12345)
            return y[:1024]

    elif mode == "mask_planes":

        def one(x):
            # u32-plane formulation of the threshold mask: no u64
            # elementwise ops at all
            lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
            t_hi = jnp.uint32((8 * s * (1 << 32)) // N)
            mask = hi <= t_hi
            ylo = jnp.where(mask, lo, jnp.uint32(0xFFFFFFFF))
            yhi = jnp.where(mask, hi, jnp.uint32(0xFFFFFFFF))
            return (yhi[:1024].astype(jnp.uint64) << jnp.uint64(32)) | ylo[:1024] | jnp.uint64(jnp.sum(mask.astype(jnp.int32)))

    elif mode == "maskstatic_only":

        def one(x):
            # like mask_only but with a STATIC threshold (no f64 scalar
            # chain) — isolates the float64 emulation suspect
            t = jnp.uint64((8 * s * (1 << 64)) // N)
            mask = x <= t
            y = jnp.where(mask, x, _U64MAX)
            return y[:1024] | jnp.uint64(jnp.sum(mask.astype(jnp.int32)))

    elif mode == "mask_only":

        def one(x):
            mask = threshold_mask(x, float(N))
            y = jnp.where(mask, x, _U64MAX)
            return y[:1024] | jnp.uint64(jnp.sum(mask.astype(jnp.int32)))

    elif mode == "rowsort_only":

        def one(x):
            mask = threshold_mask(x, float(N))
            y = jnp.where(mask, x, _U64MAX).reshape(N // 1024, 1024)
            yhi = (y >> jnp.uint64(32)).astype(jnp.uint32)
            ylo = (y & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            yhi, ylo = jax.lax.sort((yhi, ylo), num_keys=1)
            return (yhi[:, 0].astype(jnp.uint64) << jnp.uint64(32)) | ylo[:, 0]

    elif mode == "finish_only":

        def one(x):
            # candidate set materialized cheaply (no sort): first 32k
            cand = x[: 32 * 1024]
            return finish(cand, 32 * 1024)[0]

    else:
        raise SystemExit(f"unknown mode {mode}")

    import jax

    @jax.jit
    def bench(pool):
        t = jnp.uint64(0)
        acc = jnp.uint64(0)
        for _ in range(ITERS):
            vals = one(pool ^ t)
            t = vals[0] & jnp.uint64(1)
            acc = acc + vals.sum()
        return acc

    print(f"mode={mode} N={N} iters={ITERS} backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(bench(pool))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(pool))
        best = min(best, time.perf_counter() - t0)
    rate = N * ITERS / best
    print(f"OK time={best:.3f}s  {rate/1e9:.3f} Gbases/s-equivalent", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

# --- appended micro-modes (rowsort_only / finish_only / mask_only) ---
# Usage identical; each times ONE sub-stage of bottom_k_threshold to find
# where the ~7 ms per 1M pool actually goes.
