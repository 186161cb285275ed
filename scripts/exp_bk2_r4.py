"""Bottom-k compaction variants, slope-timed on chip.

The fused classic path is now bottom-k-bound (hash 2.7 G vs bk 0.5 G
bases/s, slope-measured).  The bk kernel's cost center is the [C, 1024]
one-key row sort that compacts ~0.2% candidates to the row fronts.
Variants:

  sort      production: lax.sort((hi, lo), num_keys=1), take P cols
  approx    lax.approx_min_k over f32-converted hi keys (+inf for
            non-candidates), gather (hi, lo) by returned index.  Order
            within a row is irrelevant (the downstream flat sort orders
            candidates); the exact-count guard still verifies nothing
            was dropped.  f32 conversion rounds hi, but every candidate
            key stays strictly below the +inf non-candidates, and ties
            among candidates only permute what we keep entirely.
  e2e_*     same two, wrapped as the full bottom_k pipeline

Usage: python scripts/exp_bk2_r4.py MODE [N] [I1] [I2]
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
    recall = float(sys.argv[5]) if len(sys.argv) > 5 else 0.999

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    s = 1000
    U32MAX = jnp.uint32(0xFFFFFFFF)
    plo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    phi = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    print(f"mode={mode} N={N} I1={I1} I2={I2} backend={jax.default_backend()}",
          flush=True)

    cols = 1024
    C = N // cols
    P = min(cols, max(16, -(-32 * s // max(C, 1))))

    def compact_sort(ylo, yhi):
        yhi2, ylo2 = jax.lax.sort((yhi, ylo), num_keys=1)
        return yhi2[:, :P], ylo2[:, :P]

    def compact_approx(ylo, yhi):
        # keys: f32 value of hi for candidates, +inf for U32MAX padding.
        # (hi < 2^32 always fits f32 with rounding; only the relative
        # order of candidates is perturbed, never candidate-vs-pad.)
        keys = jnp.where(yhi == U32MAX, jnp.float32(np.inf),
                         yhi.astype(jnp.float32))
        _, idx = jax.lax.approx_min_k(keys, k=P, recall_target=recall)
        chi = jnp.take_along_axis(yhi, idx, axis=1)
        clo = jnp.take_along_axis(ylo, idx, axis=1)
        return chi, clo

    compact = compact_sort if "sort" in mode else compact_approx

    if mode.startswith("e2e"):
        from fpmash_tpu.ops.bottomk import _U64MAX

        def bk(lo, hi, valid):
            n_valid = jnp.sum(valid.astype(jnp.int64))
            frac = jnp.minimum(
                (8.0 * s) / jnp.maximum(n_valid.astype(jnp.float32), 1.0), 1.0
            )
            sat = frac >= 1.0
            t_hi = jnp.where(sat, U32MAX, (frac * float(2**32)).astype(jnp.uint32))
            pad = (lo == U32MAX) & (hi == U32MAX)
            mask = valid & (hi <= t_hi) & ~pad
            m = jnp.sum(mask.astype(jnp.int64))
            ylo = jnp.where(mask, lo, U32MAX).reshape(C, cols)
            yhi = jnp.where(mask, hi, U32MAX).reshape(C, cols)
            chi2, clo2 = compact(ylo, yhi)
            chi = chi2.reshape(C * P)
            clo = clo2.reshape(C * P)
            cap = C * P
            cpad = (chi == U32MAX) & (clo == U32MAX)
            prefix_count = jnp.sum(((chi <= t_hi) & ~cpad).astype(jnp.int64))
            ok = prefix_count == m
            chi, clo = jax.lax.sort((chi, clo), num_keys=2)
            neq = (chi[1:] != chi[:-1]) | (clo[1:] != clo[:-1])
            is_boundary = jnp.concatenate([jnp.array([True]), neq])
            is_start = is_boundary & ~((chi == U32MAX) & (clo == U32MAX))
            out_idx = jnp.nonzero(is_start, size=s, fill_value=cap)[0]
            opad = out_idx >= cap
            out_idx = jnp.minimum(out_idx, cap - 1)
            vals64 = (chi[out_idx].astype(jnp.uint64) << jnp.uint64(32)) | clo[
                out_idx
            ].astype(jnp.uint64)
            return jnp.where(opad, _U64MAX, vals64), ok

        def make(iters):
            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint64(0)
                okacc = jnp.bool_(True)
                for _ in range(iters):
                    vals, ok = bk(plo ^ t, phi, (plo ^ t) > 0)
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                    acc = acc + vals.sum()
                    okacc = okacc & ok
                return acc, okacc

            return bench, (plo, phi)
    else:

        def make(iters):
            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint32(0)
                for _ in range(iters):
                    ylo = (plo ^ t).reshape(C, cols)
                    yhi = phi.reshape(C, cols)
                    chi, clo = compact(ylo, yhi)
                    t = clo[0, 0] & jnp.uint32(1)
                    acc = acc + jnp.sum(chi, dtype=jnp.uint32)
                return acc

            return bench, (plo, phi)

    b1, a1 = make(I1)
    t1 = _best(b1, *a1)
    b2, a2 = make(I2)
    t2 = _best(b2, *a2)
    out = jax.device_get(b2(*a2))
    rate = N * (I2 - I1) / (t2 - t1)
    print(f"OK t({I1})={t1*1e3:.1f}ms t({I2})={t2*1e3:.1f}ms "
          f"slope={rate/1e6:.1f} M/s out={out if mode.startswith('e2e') else ''}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
