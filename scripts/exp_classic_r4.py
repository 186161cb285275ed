"""Round-4 classic-path breakdown: where do the 6.6 ns/base actually go?

BENCH_r03: classic fused 151.8 M, hash stage 248.6 M, bottom-k 151.6 M
bases/s — yet the fingerprint kernel sustains ~1.2 T i32 op/s on the same
VPU, which would put a ~570-op/position hash kernel at ~2 Gbases/s.  This
script times each candidate limiter in isolation on the chip (one mode
per process through the tunnel, chained-dependent timing per CLAUDE.md):

  kernel_only   slab Pallas kernel on PREBUILT slabs (no XLA construction)
  build_only    the XLA slab construction (21 dynamic-slices + stack)
  bk_mask       bottom-k stage 1: threshold mask + where
  bk_rowsort    bottom-k stage 2: [C, 1024] one-key row sort
  bk_full       full bottom_k_threshold_planes
  mul32         microbench: 48 dependent u32 multiplies per element
  add32         microbench: 48 dependent u32 adds per element

Usage: python scripts/exp_classic_r4.py MODE [N] [ITERS]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def _chained_best(fn, *args, reps: int = 3):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    mode = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    k = 21

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from fpmash_tpu.ops import kmers_pallas as kp

    G, RB = kp.GROUPS, kp.ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    C = Np // per
    rng = np.random.default_rng(0)
    print(f"mode={mode} N={N} iters={ITERS} backend={jax.default_backend()}",
          flush=True)

    if mode == "kernel_only":
        slabs = jnp.asarray(
            rng.integers(0, 4, size=(C * k * G, RB)).astype(np.uint32)
        )
        Z = np.int32(0)
        call = pl.pallas_call(
            partial(kp._slab_kernel, k, False, 42),
            grid=(C,),
            out_shape=jax.ShapeDtypeStruct((C * 3 * G, RB), jnp.uint32),
            in_specs=[pl.BlockSpec((k * G, RB), lambda i: (i, Z))],
            out_specs=pl.BlockSpec((3 * G, RB), lambda i: (i, Z)),
        )

        @jax.jit
        def bench(slabs):
            t = jnp.uint32(0)
            acc = jnp.uint32(0)
            for _ in range(ITERS):
                out = call(slabs ^ t)
                t = out[0, 0] & jnp.uint32(1)
                acc = acc + jnp.sum(out, dtype=jnp.uint32)
            return acc

        best = _chained_best(bench, slabs)

    elif mode == "build_only":
        codes = jnp.asarray(rng.integers(0, 4, size=N).astype(np.uint32))

        @jax.jit
        def bench(codes):
            t = jnp.uint32(0)
            acc = jnp.uint32(0)
            for _ in range(ITERS):
                flat = (
                    jnp.full((Np + k,), jnp.uint32(4))
                    .at[:N]
                    .set(codes ^ t)
                )
                shifted = jnp.stack(
                    [
                        jax.lax.dynamic_slice(flat, (j,), (Np,)).reshape(C, G, RB)
                        for j in range(k)
                    ],
                    axis=1,
                )
                slabs = shifted.reshape(C * k * G, RB)
                t = slabs[0, 0] & jnp.uint32(1)
                acc = acc + jnp.sum(slabs, dtype=jnp.uint32)
            return acc

        best = _chained_best(bench, codes)

    elif mode in ("bk_mask", "bk_rowsort", "bk_full"):
        from fpmash_tpu.ops.bottomk import bottom_k_threshold_planes

        plo = jnp.asarray(
            rng.integers(0, 1 << 32, size=Np, dtype=np.uint64).astype(np.uint32)
        )
        phi = jnp.asarray(
            rng.integers(0, 1 << 32, size=Np, dtype=np.uint64).astype(np.uint32)
        )
        s = 1000
        U32MAX = jnp.uint32(0xFFFFFFFF)

        if mode == "bk_mask":

            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint32(0)
                for _ in range(ITERS):
                    lo = plo ^ t
                    valid = lo > 0
                    n_valid = jnp.sum(valid.astype(jnp.int64))
                    frac = jnp.minimum(
                        (8.0 * s) / jnp.maximum(n_valid.astype(jnp.float32), 1.0),
                        1.0,
                    )
                    t_hi = (frac * float(2**32)).astype(jnp.uint32)
                    mask = valid & (phi <= t_hi)
                    ylo = jnp.where(mask, lo, U32MAX)
                    yhi = jnp.where(mask, phi, U32MAX)
                    t = ylo[0] & jnp.uint32(1)
                    acc = acc + jnp.sum(yhi, dtype=jnp.uint32)
                return acc

        elif mode == "bk_rowsort":

            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint32(0)
                for _ in range(ITERS):
                    ylo = (plo ^ t).reshape(-1, 1024)
                    yhi = phi.reshape(-1, 1024)
                    yhi2, ylo2 = jax.lax.sort((yhi, ylo), num_keys=1)
                    t = ylo2[0, 0] & jnp.uint32(1)
                    acc = acc + jnp.sum(yhi2[:, :32], dtype=jnp.uint32)
                return acc

        else:

            @jax.jit
            def bench(plo, phi):
                t = jnp.uint32(0)
                acc = jnp.uint64(0)
                for _ in range(ITERS):
                    vals = bottom_k_threshold_planes(
                        plo ^ t, phi, (plo ^ t) > 0, s=s
                    )[0]
                    t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                    acc = acc + vals.sum()
                return acc

        best = _chained_best(bench, plo, phi)

    elif mode in ("mul32", "add32"):
        M = 48
        x = jnp.asarray(rng.integers(0, 1 << 32, size=(C * G, RB),
                                     dtype=np.uint64).astype(np.uint32))
        Z = np.int32(0)

        def _kern(x_ref, o_ref):
            v = x_ref[:]
            if mode == "mul32":
                for i in range(M):
                    v = v * jnp.uint32(0x9E3779B1 + 2 * i) + jnp.uint32(1)
            else:
                for i in range(M):
                    v = (v + jnp.uint32(0x9E3779B1 + 2 * i)) ^ (v >> jnp.uint32(1))
            o_ref[:] = v

        call = pl.pallas_call(
            _kern,
            grid=(C,),
            out_shape=jax.ShapeDtypeStruct((C * G, RB), jnp.uint32),
            in_specs=[pl.BlockSpec((G, RB), lambda i: (i, Z))],
            out_specs=pl.BlockSpec((G, RB), lambda i: (i, Z)),
        )

        @jax.jit
        def bench(x):
            t = jnp.uint32(0)
            acc = jnp.uint32(0)
            for _ in range(ITERS):
                out = call(x ^ t)
                t = out[0, 0] & jnp.uint32(1)
                acc = acc + jnp.sum(out, dtype=jnp.uint32)
            return acc

        best = _chained_best(bench, x)
        ops = Np * ITERS * M / best
        print(f"OK time={best:.4f}s  {ops/1e12:.3f} T {mode[:3]}-ops/s "
              f"({M} deps/elem)", flush=True)
        return 0

    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 2

    rate = N * ITERS / best
    print(f"OK time={best:.4f}s  {rate/1e6:.1f} Mbases/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
