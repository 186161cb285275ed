"""Why is the screen distinct-count kernel stuck at ~8.5 Mbases/s?

Stage isolation at the bench shape (N=4M), slope-timed in ONE process
(2 pallas-bearing executables max — the relay multi-executable trap):

  full    _distinct_counts_run (hash kernel + distinct_counts_planes)
  planes  distinct_counts_planes alone on random (lo, hi) planes
  sort2   two dependent _sort_planes_flat passes (the kernel's sorts)

Usage: python scripts/exp_screen_r5.py [N] [I1] [I2]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    I1 = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    I2 = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.models.sketch import _distinct_counts_run
    from fpmash_tpu.ops.bottomk import _sort_planes_flat, distinct_counts_planes

    print(f"N={N} backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(4)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    piece = lut[rng.integers(0, 4, size=N // 8)]
    b1 = jnp.asarray(np.tile(piece, 8))
    piece2 = lut[rng.integers(0, 4, size=N // 8)]
    b2 = jnp.asarray(np.tile(piece2, 8))
    plo = jnp.asarray(
        rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    )
    phi = jnp.asarray(
        rng.integers(0, 1 << 30, size=N, dtype=np.uint64).astype(np.uint32)
    )

    kw = dict(k=21, noncanonical=False, preserve_case=False, seed=42, use64=True)

    def make_full(iters):
        @jax.jit
        def bench(b1, b2):
            t = jnp.uint32(0)
            acc = jnp.int64(0)
            for _ in range(iters):
                bv = jnp.where(t > 0, b2, b1)
                vlo, vhi, counts, nd = _distinct_counts_run(
                    bv, jnp.int32(bv.shape[0]), **kw
                )
                t = vlo[0] & jnp.uint32(1)
                acc = acc + nd
            return acc

        return bench, (b1, b2)

    def make_planes(iters):
        @jax.jit
        def bench(plo, phi):
            t = jnp.uint32(0)
            acc = jnp.int64(0)
            for _ in range(iters):
                vlo, vhi, counts, nd = distinct_counts_planes(
                    plo ^ t, phi, (plo ^ t) > 0
                )
                t = vlo[0] & jnp.uint32(1)
                acc = acc + nd
            return acc

        return bench, (plo, phi)

    def make_sort2(iters):
        @jax.jit
        def bench(plo, phi):
            t = jnp.uint32(0)
            acc = jnp.uint64(0)
            for _ in range(iters):
                h, l = _sort_planes_flat(phi, plo ^ t)
                h2, l2 = _sort_planes_flat(h ^ jnp.uint32(1), l)
                t = l2[0] & jnp.uint32(1)
                acc = acc + h2.sum().astype(jnp.uint64)
            return acc

        return bench, (plo, phi)

    variants = {
        "full": make_full,
        "planes": make_planes,
        "sort2": make_sort2,
    }
    built = {
        name: {i: mk(i) for i in (I1, I2)} for name, mk in variants.items()
    }
    for name, by_iter in built.items():
        for i, (fn, args) in by_iter.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            print(f"  compile {name}/{i}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
    best = {(n, i): float("inf") for n in built for i in (I1, I2)}
    for _ in range(4):
        for name, by_iter in built.items():
            for i, (fn, args) in by_iter.items():
                try:
                    t0 = time.perf_counter()
                    jax.device_get(fn(*args))
                    best[(name, i)] = min(
                        best[(name, i)], time.perf_counter() - t0
                    )
                except Exception as e:
                    print(f"  rep error {name}/{i}: {type(e).__name__}",
                          flush=True)
    for name in built:
        t1, t2 = best[(name, I1)], best[(name, I2)]
        if float("inf") in (t1, t2):
            print(f"{name}: NO DATA", flush=True)
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
