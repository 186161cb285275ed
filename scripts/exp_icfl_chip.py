"""On-chip throughput experiment for the ICFL-family kernels.

Chained-scan timing discipline (CLAUDE.md): N dependent iterations inside
ONE jitted lax.scan, full device_get.  One jitted function + one shape.

Usage: python scripts/exp_icfl_chip.py [family] [B] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    family = sys.argv[1] if len(sys.argv) > 1 else "ICFL_COMB"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    WINDOW = 100

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.factorize import factor_lengths_device
    from fpmash_tpu.ops.murmur3 import murmur3_u64_batch

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    w = jnp.asarray(lut[rng.integers(0, 4, size=(B, WINDOW))])
    w2 = jnp.asarray(lut[rng.integers(0, 4, size=(B, WINDOW))])
    l = jnp.asarray(np.full((B,), WINDOW, np.int32))

    @jax.jit
    def bench(w, w2, l):
        def body(carry, _):
            wv = jnp.where(carry > 0, w2, w)
            fl, fc, ok = factor_lengths_device(wv, l, family)
            h1, _ = murmur3_u64_batch(fl.astype(jnp.uint64), fc, seed=42)
            return (h1[0] & jnp.uint64(1)).astype(jnp.int32), h1.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=N)
        return sums

    print(f"family={family} B={B} N={N} backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(bench(w, w2, l))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(w, w2, l))
        best = min(best, time.perf_counter() - t0)
    rate = B * N * WINDOW / best
    print(f"time={best:.3f}s  {rate/1e9:.3f} Gbases/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
