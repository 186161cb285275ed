"""Fingerprint cohorting A/B, round 5 — interleaved and honest.

Round 4 probed tile-exit skew with SEPARATE-process runs (exp_fp_cohort_r4),
which the round-4 forensics showed can swing 0.5-1.5 G run to run.  Here
ONE process compiles ONE executable (the production fused kernel at the
bench shape) and alternates timed reps over three DATASETS:

  random   production-like uniform ACGT windows
  sorted   the same windows pre-sorted by exact per-window automaton
           substeps (host sim) -> slow windows cluster into few tiles
  uniform  every window identical (zero skew floor)

If sorted ~= random, the tile-exit-skew lever is closed: the kernel is
bounded by total substeps, not per-tile maxima.  If sorted wins
materially, production integration (host proxy sort + output unpermute)
is justified.

Usage: python scripts/exp_fp_cohort_r5.py [B] [I1] [I2] [modes-csv]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from exp_fp_cohort_r4 import duval_steps  # noqa: E402


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19
    I1 = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    I2 = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    modes = (
        sys.argv[4].split(",")
        if len(sys.argv) > 4
        else ["random", "sorted", "uniform", "shifts"]
    )
    L = 100

    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    rand_w = lut[rng.integers(0, 4, size=(B, L))]
    rand_w2 = lut[rng.integers(0, 4, size=(B, L))]

    datasets = {}
    if "random" in modes:
        datasets["random"] = (rand_w, rand_w2)
    if "sorted" in modes:
        t0 = time.perf_counter()
        srt = []
        for arr in (rand_w, rand_w2):
            steps = np.array([duval_steps(r) for r in arr])
            order = np.argsort(steps, kind="stable")
            srt.append(arr[order])
        print(
            f"step sim: {time.perf_counter()-t0:.0f}s "
            f"min={steps.min()} med={int(np.median(steps))} max={steps.max()}",
            flush=True,
        )
        datasets["sorted"] = tuple(srt)
    if "uniform" in modes:
        datasets["uniform"] = (
            np.repeat(rand_w[:1], B, axis=0),
            np.repeat(rand_w2[:1], B, axis=0),
        )
    # production-like: windows are the L cyclic shifts of B/L random
    # reads, consecutive in the batch (the CLI's shift_windows layout) —
    # step counts of adjacent windows correlate, so tiles may already be
    # closer to 'sorted' than 'random' without any reordering
    def shifts(seed):
        r2 = np.random.default_rng(seed)
        nreads = -(-B // L)
        reads = lut[r2.integers(0, 4, size=(nreads, L))]
        dbl = np.concatenate([reads, reads[:, : L - 1]], axis=1)
        wins = np.stack(
            [
                np.lib.stride_tricks.sliding_window_view(row, L)[:L]
                for row in dbl
            ]
        )
        return wins.reshape(nreads * L, L)[:B]

    if "shifts" in modes:
        datasets["shifts"] = (shifts(101), shifts(102))
    l = jnp.asarray(np.full((B,), L, np.int32))
    print(f"B={B} backend={jax.default_backend()}", flush=True)

    def make(iters):
        @jax.jit
        def bench(w, w2, l):
            def body(carry, _):
                wv = jnp.where(carry > 0, w2, w)
                h1, _, _ = fingerprint_hashes_fused(wv, l, seed=42, pack="dna16")
                return (h1[0] & jnp.uint64(1)).astype(jnp.int32), h1.sum()

            _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return sums

        return bench, l

    benches = {i: make(i) for i in (I1, I2)}
    dev = {
        name: tuple(jnp.asarray(a) for a in arrs)
        for name, arrs in datasets.items()
    }
    # compile once per chain length (same executable for every dataset)
    for i, (fn, l_) in benches.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*next(iter(dev.values())), l_))
        print(f"  compile i={i}: {time.perf_counter()-t0:.1f}s", flush=True)

    best = {(name, i): float("inf") for name in datasets for i in (I1, I2)}
    for _ in range(4):
        for name in datasets:
            for i, (fn, l_) in benches.items():
                try:
                    t0 = time.perf_counter()
                    jax.device_get(fn(*dev[name], l_))
                    best[(name, i)] = min(
                        best[(name, i)], time.perf_counter() - t0
                    )
                except Exception as e:
                    print(f"  rep error {name}/{i}: {type(e).__name__}",
                          flush=True)
    for name in datasets:
        t1, t2 = best[(name, I1)], best[(name, I2)]
        if t1 == float("inf") or t2 == float("inf"):
            print(f"{name}: NO DATA (all reps errored)", flush=True)
            continue
        rate = B * L * (I2 - I1) / max(t2 - t1, 1e-9)
        print(
            f"{name}: t({I1})={t1*1e3:.1f}ms t({I2})={t2*1e3:.1f}ms "
            f"slope={rate/1e9:.2f} Gbases/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
