"""On-chip decision bench: VPU u64 murmur vs the MXU nibble-limb variant.

Hashes the same [B, L] u64 fingerprint batch with both implementations,
each timed as a chained lax.scan.  Settles VERDICT item 9 (wire the MXU
variant in if it wins, else record the loss).

Usage: python scripts/exp_murmur_mxu_chip.py [B] [L] [ITERS]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.murmur3 import murmur3_u64_batch
    from fpmash_tpu.ops.murmur3_mxu import murmur3_u64_batch_mxu

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(1, 200, size=(B, L), dtype=np.uint64))
    counts = jnp.asarray(rng.integers(1, L + 1, size=B, dtype=np.int32))

    print(f"B={B} L={L} iters={ITERS} backend={jax.default_backend()}", flush=True)

    results = {}
    for name, fn in (("vpu", murmur3_u64_batch), ("mxu", murmur3_u64_batch_mxu)):
        def body(carry, _, fn=fn):
            h1, _ = fn(vals ^ carry, counts)
            return h1[0] & jnp.uint64(1), h1.sum()

        bench = jax.jit(
            lambda v, c, body=body: jax.lax.scan(
                body, jnp.uint64(0), None, length=ITERS
            )[1]
        )
        t0 = time.perf_counter()
        jax.block_until_ready(bench(vals, counts))
        print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(bench(vals, counts))
            best = min(best, time.perf_counter() - t0)
        results[name] = B * ITERS / best
        print(f"{name}: time={best:.3f}s  {results[name]/1e6:.2f} M hashes/s", flush=True)

    print(f"mxu/vpu ratio: {results['mxu']/results['vpu']:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
