"""On-chip throughput for the pairwise sketch-comparison kernel.

BASELINE config 4: all-pairs over a population of s=1000 sketches.
Chained-scan timing (one jitted fn, one shape, dependent iterations).

Usage: python scripts/exp_compare_chip.py [R] [Q] [S] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.compare import tile_common_denom as pairwise_kernel

    rng = np.random.default_rng(0)
    # sorted distinct u64 hashes per sketch (classic-sketch invariant)
    def mk(n):
        a = rng.integers(0, 1 << 62, size=(n, S + 64), dtype=np.uint64)
        a = np.sort(a, axis=1)[:, :S]
        return jnp.asarray(a)

    ref = mk(R)
    qry = mk(Q)
    qry2 = mk(Q)
    rl = jnp.full((R,), S, jnp.int32)
    ql = jnp.full((Q,), S, jnp.int32)

    # chain N DEPENDENT dispatches (scan-wrapping this kernel faulted on
    # chip; data dependencies serialize on device, so blocking on the last
    # call times the whole chain honestly)
    f = jax.jit(
        lambda q, t: pairwise_kernel(ref, rl, q ^ t, ql, sketch_size=S)[0]
    )

    def chain():
        t = jnp.uint64(0)
        c = None
        for _ in range(N):
            c = f(qry, t)
            t = (c[0, 0] & 1).astype(jnp.uint64)
        return c

    print(f"R={R} Q={Q} S={S} N={N} backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(chain())
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chain())
        best = min(best, time.perf_counter() - t0)
    rate = R * Q * N / best
    print(f"time={best:.3f}s  {rate/1e6:.3f} M comparisons/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
