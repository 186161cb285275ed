"""Fingerprint kernel: how much does while-loop exit skew cost?

Each [8, 2048]-window grid chunk runs its Duval while_loop until the
SLOWEST window in the chunk finishes.  This probe bounds the cohorting
upside by comparing slope rates on:

  random    uniform random ACGT windows (production-like; every chunk's
            max step count ~= the global max)
  uniform   every window identical (zero variance; the chunk exits as
            early as that content allows)
  sorted    random windows pre-sorted by a cheap step-count proxy
            (per-window automaton steps simulated host-side), so slow
            windows cluster into few chunks

Usage: python scripts/exp_fp_cohort_r4.py MODE [B] [I1] [I2]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _best(fn, *args, reps: int = 3):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def duval_steps(s: np.ndarray) -> int:
    """Simulate the kernel automaton's substep count for one window."""
    n = len(s)
    steps = 0
    i = 0
    while i < n:
        # scan phase
        j, k = i + 1, i
        steps += 1  # the transition substep that flips to emitting
        while j < n and s[k] <= s[j]:
            k = i if s[k] < s[j] else k + 1
            j += 1
            steps += 1
        # emit phase
        p = j - k
        while i <= k:
            i += p
            steps += 1
    return steps


def main() -> int:
    mode = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 19
    I1 = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    I2 = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    L = 100

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    if mode == "uniform":
        one = lut[rng.integers(0, 4, size=(1, L))]
        windows = np.repeat(one, B, axis=0)
        windows2 = np.repeat(lut[rng.integers(0, 4, size=(1, L))], B, axis=0)
    else:
        windows = lut[rng.integers(0, 4, size=(B, L))]
        windows2 = lut[rng.integers(0, 4, size=(B, L))]
        if mode == "sorted":
            t0 = time.perf_counter()
            for name, arr in (("w", windows), ("w2", windows2)):
                steps = np.array([duval_steps(r) for r in arr])
                order = np.argsort(steps, kind="stable")
                arr[:] = arr[order]
                print(f"  {name} step sim: {time.perf_counter()-t0:.0f}s "
                      f"min={steps.min()} med={int(np.median(steps))} "
                      f"max={steps.max()}", flush=True)

    w = jnp.asarray(windows)
    w2 = jnp.asarray(windows2)
    l = jnp.asarray(np.full((B,), L, np.int32))
    print(f"mode={mode} B={B} backend={jax.default_backend()}", flush=True)

    def make(iters):
        @jax.jit
        def bench(w, w2, l):
            def body(carry, _):
                wv = jnp.where(carry > 0, w2, w)
                h1, _, _ = fingerprint_hashes_fused(wv, l, seed=42, pack="dna16")
                return (h1[0] & jnp.uint64(1)).astype(jnp.int32), h1.sum()

            _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return sums

        return bench, (w, w2, l)

    b1, a1 = make(I1)
    t1 = _best(b1, *a1)
    b2, a2 = make(I2)
    t2 = _best(b2, *a2)
    rate = B * L * (I2 - I1) / (t2 - t1)
    print(f"OK t({I1})={t1*1e3:.1f}ms t({I2})={t2*1e3:.1f}ms "
          f"slope={rate/1e9:.2f} Gbases/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
