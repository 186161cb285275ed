"""Walk pair-packing: on-chip value parity (all 3 PACK tiers) + slope
rate.  Usage: python scripts/exp_walk_packed_r4.py"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.models.distance import compare_sketches
    from fpmash_tpu.ops.walk_pallas import pairwise_walk_pallas

    print(f"backend={jax.default_backend()}", flush=True)
    fail = 0

    for S, cap in ((24, 1000), (40, 50), (200, 150)):
        rng = np.random.default_rng(3)
        R = Q = 16
        ref = rng.integers(0, 60, size=(R, S)).astype(np.uint64)
        qry = rng.integers(0, 60, size=(Q, S)).astype(np.uint64)
        rl = rng.integers(1, S + 1, size=R).astype(np.int32)
        ql = rng.integers(1, S + 1, size=Q).astype(np.int32)
        t0 = time.perf_counter()
        c, d = jax.device_get(
            pairwise_walk_pallas(
                jnp.asarray(ref), jnp.asarray(rl), jnp.asarray(qry),
                jnp.asarray(ql), sketch_size=cap,
            )
        )
        bad = 0
        for i in range(R):
            for j in range(Q):
                r = compare_sketches(
                    ref[i, : rl[i]], qry[j, : ql[j]], 100, 100, cap, 21, 4.0**21
                )
                if r.numer != int(c[i, j]) or r.denom != int(d[i, j]):
                    bad += 1
        print(f"S={S} cap={cap}: {'OK' if not bad else f'{bad} MISMATCHES'} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        fail += bad

    # slope rate at the bench shape (R=Q=256, L=64 -> PACK=2)
    rng = np.random.default_rng(3)
    R = Q = 256
    L = 64
    ref = jnp.asarray(rng.integers(0, 1 << 32, size=(R, L), dtype=np.uint64))
    qry = jnp.asarray(rng.integers(0, 1 << 32, size=(Q, L), dtype=np.uint64))
    rl = jnp.asarray(rng.integers(1, L + 1, size=R).astype(np.int32))
    ql = jnp.asarray(rng.integers(1, L + 1, size=Q).astype(np.int32))

    def make(iters):
        @jax.jit
        def bench(ref, qry):
            t = jnp.uint64(0)
            acc = jnp.int32(0)
            for _ in range(iters):
                c, d = pairwise_walk_pallas(ref, rl, qry ^ t, ql, sketch_size=1000)
                t = (c[0, 0] & 1).astype(jnp.uint64)
                acc = acc + c.sum() + d.sum()
            return acc

        return bench, (ref, qry)

    def best(fn, *args):
        jax.block_until_ready(fn(*args))
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    b1, a1 = make(2)
    t1 = best(b1, *a1)
    b2, a2 = make(8)
    t2 = best(b2, *a2)
    rate = R * Q * 6 / (t2 - t1)
    print(f"slope_rate={rate/1e6:.2f} M pairs/s  t2={t2*1e3:.0f}ms t1={t1*1e3:.0f}ms",
          flush=True)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
