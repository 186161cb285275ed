"""Bisect the Pallas-compare-under-scan Mosaic failure + big-grid timing.

Round-3 minimal repro (exp_scanfault.py pallas_scan) pinned the round-2
"faults on chip" note to a COMPILE-time error:

    Mosaic failed to compile TPU kernel: failed to legalize operation
    'func.return'   --  "func.return"(%arg0, %0) : (i32, i64) -> ()

i.e. under ``lax.scan`` (x64 enabled -> i64 carry in the loop) the Mosaic
pipeline chokes.  These modes isolate the trigger and test workarounds:

  i32_scan   scan whose carry and ys are all i32 (no 64-bit loop state)
  unroll     lax.scan(..., unroll=N) — no while loop in the lowering
  pyloop     Python for-loop of N dependent kernel calls inside ONE jit
  biggrid    single dispatch, R=Q=1024 (16384 sequential grid blocks);
             Pallas grids execute serially per core, so one big dispatch
             is honest timing with no loop construct at all

Usage: python scripts/exp_scanfault2.py MODE [R] [Q] [S] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    mode = sys.argv[1]
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    N = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.compare_pallas import pairwise_common_denom_pallas as kern

    rng = np.random.default_rng(0)

    def mk(n):
        a = rng.integers(0, 1 << 62, size=(n, S + 64), dtype=np.uint64)
        return jnp.asarray(np.sort(a, axis=1)[:, :S])

    ref, qry = mk(R), mk(Q)
    rl = jnp.full((R,), S, jnp.int32)
    ql = jnp.full((Q,), S, jnp.int32)

    print(
        f"mode={mode} R={R} Q={Q} S={S} N={N} backend={jax.default_backend()}",
        flush=True,
    )

    if mode == "biggrid":
        f = jax.jit(lambda q, t: kern(ref, rl, q ^ t, ql, sketch_size=S)[0])

        def run():
            c = f(qry, jnp.uint64(0))
            return c

        t0 = time.perf_counter()
        out = jax.block_until_ready(run())
        print(f"compile+first: {time.perf_counter()-t0:.1f}s out00={np.asarray(out)[0,0]}", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(run())
            best = min(best, time.perf_counter() - t0)
        rate = R * Q / best
        print(f"OK time={best:.3f}s  {rate/1e6:.3f} M pairs/s (single dispatch)", flush=True)
        return 0

    if mode == "i32_scan":

        @jax.jit
        def bench(ref, qry):
            def body(carry, _):
                q = qry ^ carry.astype(jnp.uint64)
                c, d = kern(ref, rl, q, ql, sketch_size=S)
                return (c[0, 0] & 1).astype(jnp.int32), (c.sum() + d.sum()).astype(jnp.int32)

            _, sums = jax.lax.scan(body, jnp.int32(0), None, length=N)
            return sums

    elif mode == "unroll":

        @jax.jit
        def bench(ref, qry):
            def body(carry, _):
                q = qry ^ carry
                c, d = kern(ref, rl, q, ql, sketch_size=S)
                return (c[0, 0] & 1).astype(jnp.uint64), c.sum() + d.sum()

            _, sums = jax.lax.scan(body, jnp.uint64(0), None, length=N, unroll=N)
            return sums

    elif mode == "pyloop":

        @jax.jit
        def bench(ref, qry):
            t = jnp.uint64(0)
            acc = jnp.int32(0)
            for _ in range(N):
                c, d = kern(ref, rl, qry ^ t, ql, sketch_size=S)
                t = (c[0, 0] & 1).astype(jnp.uint64)
                acc = acc + c.sum().astype(jnp.int32)
            return acc

    else:
        raise SystemExit(f"unknown mode {mode}")

    t0 = time.perf_counter()
    out = jax.block_until_ready(bench(ref, qry))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s out={np.asarray(out).ravel()[0]}", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(ref, qry))
        best = min(best, time.perf_counter() - t0)
    rate = R * Q * N / best
    print(f"OK time={best:.3f}s  {rate/1e6:.3f} M pairs/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
