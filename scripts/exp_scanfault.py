"""Minimal reproduction harness for the compare-kernel scan-wrap fault.

Round-2 observed that wrapping the pairwise comparison kernel in a
``lax.scan`` "faults on chip" (bench.py routed around it with chained
dependent dispatches, capping measured throughput at dispatch latency).
This script isolates the fault: one mode per invocation, ONE jitted
function, one shape, so the failing construct is unambiguous.

Modes:
  xla_scan     lax.scan over the XLA bitonic-merge kernel (ops/compare.py)
  pallas_scan  lax.scan over the Pallas tile kernel (ops/compare_pallas.py)
  xla_chain    dependent-dispatch chain over the XLA kernel (round-2 status quo)
  pallas_chain dependent-dispatch chain over the Pallas kernel

Usage: python scripts/exp_scanfault.py MODE [R] [Q] [S] [N]
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

    from fpmash_tpu.ops.compare import pairwise_common_denom
    from fpmash_tpu.ops.compare_pallas import pairwise_common_denom_pallas

    rng = np.random.default_rng(0)

    def mk(n):
        a = rng.integers(0, 1 << 62, size=(n, S + 64), dtype=np.uint64)
        return jnp.asarray(np.sort(a, axis=1)[:, :S])

    ref, qry = mk(R), mk(Q)
    rl = jnp.full((R,), S, jnp.int32)
    ql = jnp.full((Q,), S, jnp.int32)

    kern = pairwise_common_denom if mode.startswith("xla") else pairwise_common_denom_pallas

    print(
        f"mode={mode} R={R} Q={Q} S={S} N={N} backend={jax.default_backend()}",
        flush=True,
    )

    if mode.endswith("_scan"):

        @jax.jit
        def bench(ref, qry):
            def body(carry, _):
                q = qry ^ carry
                c, d = kern(ref, rl, q, ql, sketch_size=S)
                return (c[0, 0] & 1).astype(jnp.uint64), c.sum() + d.sum()

            _, sums = jax.lax.scan(body, jnp.uint64(0), None, length=N)
            return sums

        t0 = time.perf_counter()
        out = jax.block_until_ready(bench(ref, qry))
        print(f"compile+first: {time.perf_counter()-t0:.1f}s out0={np.asarray(out)[0]}", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(bench(ref, qry))
            best = min(best, time.perf_counter() - t0)
    else:
        f = jax.jit(lambda q, t: kern(ref, rl, q ^ t, ql, sketch_size=S)[0])

        def chain():
            t = jnp.uint64(0)
            c = None
            for _ in range(N):
                c = f(qry, t)
                t = (c[0, 0] & 1).astype(jnp.uint64)
            return c

        t0 = time.perf_counter()
        out = jax.block_until_ready(chain())
        print(f"compile+first: {time.perf_counter()-t0:.1f}s out00={np.asarray(out)[0,0]}", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(chain())
            best = min(best, time.perf_counter() - t0)

    rate = R * Q * N / best
    print(f"OK time={best:.3f}s  {rate/1e6:.3f} M pairs/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
