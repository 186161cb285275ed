"""On-chip: fused Pallas ICFL / ICFL_COMB fingerprint hashing.

Also verifies on-chip values against the scalar chain for the first rows
(Mosaic miscompiles would otherwise pass silently — see CLAUDE.md).

Usage: python scripts/exp_icfl_pallas_chip.py [family] [pack] [B] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    family = sys.argv[1] if len(sys.argv) > 1 else "ICFL_COMB"
    pack = sys.argv[2] if len(sys.argv) > 2 else "dna16"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    WINDOW = 100

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl_pallas import icfl_family_hashes_fused

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    wn = lut[rng.integers(0, 4, size=(B, WINDOW))]
    w = jnp.asarray(wn)
    w2 = jnp.asarray(lut[rng.integers(0, 4, size=(B, WINDOW))])
    l = jnp.asarray(np.full((B,), WINDOW, np.int32))

    @jax.jit
    def bench(w, w2, l):
        def body(carry, _):
            wv = jnp.where(carry > 0, w2, w)
            h1, _, cnt, ok = icfl_family_hashes_fused(
                wv, l, family=family, seed=42, pack=pack
            )
            return (h1[0] & jnp.uint64(1)).astype(jnp.int32), h1.sum() + ok.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=N)
        return sums

    print(f"family={family} pack={pack} B={B} N={N} backend={jax.default_backend()}",
          flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(bench(w, w2, l))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    # on-chip value spot check vs scalar chain (first 64 rows)
    h1, _, cnt, ok = jax.device_get(
        icfl_family_hashes_fused(w, l, family=family, seed=42, pack=pack)
    )
    from fpmash_tpu.scalar.lyndon import d_icfl, icfl
    from fpmash_tpu.scalar.murmur3 import hash_u64_vector

    fn = d_icfl if family == "ICFL_COMB" else icfl
    bad = 0
    for k in range(64):
        s = wn[k].tobytes().decode()
        fac = [len(f) for f in fn(s)]
        if int(h1[k]) != hash_u64_vector(fac, seed=42, use64=True) or int(cnt[k]) != len(fac):
            bad += 1
    print(f"on-chip spot check: {'OK' if bad == 0 else f'{bad}/64 BAD'}; ok={ok.all()}",
          flush=True)

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
