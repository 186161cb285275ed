"""On-chip timing for one piece of the factorization pipeline.

Usage: python scripts/exp_piece_chip.py <piece> [B] [N]
pieces: icfl_mask | cfl_mask | revcomp_flip | lengths | murmur | icfl_words
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    piece = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    WINDOW = 100

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    w = jnp.asarray(lut[rng.integers(0, 4, size=(B, WINDOW))])
    w2 = jnp.asarray(lut[rng.integers(0, 4, size=(B, WINDOW))])
    l = jnp.asarray(np.full((B,), WINDOW, np.int32))

    if piece == "icfl_mask":
        from fpmash_tpu.ops.icfl import icfl_boundary_mask

        def fn(wv, l):
            m, ok = icfl_boundary_mask(wv, l)
            return m.sum(dtype=jnp.int32) + ok.sum(dtype=jnp.int32)

    elif piece == "icfl_words":
        from fpmash_tpu.ops.icfl import icfl_boundary_words

        def fn(wv, l):
            words, ok = icfl_boundary_words(
                wv, l, l[:, None] * 0, l[:, None], (l > 0).astype(jnp.int32)
            )
            return words.sum(dtype=jnp.uint32).astype(jnp.int32)

    elif piece == "cfl_mask":
        from fpmash_tpu.ops.lyndon import cfl_boundary_mask

        def fn(wv, l):
            return cfl_boundary_mask(wv, l).sum(dtype=jnp.int32)

    elif piece == "revcomp_flip":
        from fpmash_tpu.ops.factorize import _flip_mask, _revcomp_batch

        def fn(wv, l):
            rc = _revcomp_batch(wv, l)
            m = _flip_mask(rc == 65, l)
            return m.sum(dtype=jnp.int32) + rc.sum(dtype=jnp.int32)

    elif piece == "lengths":
        from fpmash_tpu.ops.lyndon import lengths_from_boundary

        def fn(wv, l):
            fl, fc = lengths_from_boundary((wv & 1) > 0, l)
            return fl.sum(dtype=jnp.int32) + fc.sum(dtype=jnp.int32)

    elif piece == "murmur":
        from fpmash_tpu.ops.murmur3 import murmur3_u64_batch

        def fn(wv, l):
            h1, _ = murmur3_u64_batch(wv.astype(jnp.uint64), l // 10, seed=42)
            return h1.sum().astype(jnp.int32)

    else:
        raise SystemExit(f"unknown piece {piece}")

    @jax.jit
    def bench(w, w2, l):
        def body(carry, _):
            wv = jnp.where(carry > 0, w2, w)
            s = fn(wv, l)
            return (s & 1).astype(jnp.int32), s

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=N)
        return sums

    print(f"piece={piece} B={B} N={N} backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(bench(w, w2, l))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(w, w2, l))
        best = min(best, time.perf_counter() - t0)
    rate = B * N * WINDOW / best
    print(f"time={best:.3f}s  {rate/1e9:.3f} Gbases/s-equivalent", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
