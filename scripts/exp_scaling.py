"""Multi-device scaling-efficiency harness.

BASELINE's north star asks for >=80% scaling efficiency to N devices; no
multi-chip hardware is attached in this environment, so this harness makes
the number one command away when a slice appears.  It measures the two
sharded production pipelines (the same `shard_map` code paths the CLI
dispatches through, `fpmash_tpu/parallel/sharded.py`) at D = 1, 2, 4, ...
visible devices:

* window fingerprinting — `sharded_fingerprint_hashes` (windows shard over
  the dp mesh axis; Duval + Murmur3 run shard-local, zero cross-device
  traffic), timed as N dependent iterations chained in one jitted
  `lax.scan` (see CLAUDE.md on tunneled-device timing);
* all-pairs distance tiles — `sharded_all_pairs` (queries shard, reference
  batch replicated, per-device [R, Q/D] tiles all-gather), timed as N
  dependent dispatches.

Reported efficiency = rate(D) / (D * rate(1)).  On a real slice this is
the ICI scaling number; with ``--virtual N`` it forces N virtual CPU
devices, which validates the collective program shapes end-to-end but NOT
efficiency (virtual devices share the same host cores, so efficiency ~1/D
is expected and fine there).

Usage:
  python scripts/exp_scaling.py                 # real attached devices
  python scripts/exp_scaling.py --virtual 8     # 8 virtual CPU devices
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _chained_best(fn, *args, reps: int = 3):
    import jax

    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_fingerprint(mesh, B, L, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fpmash_tpu.parallel.sharded import sharded_fingerprint_hashes

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    w = jnp.asarray(lut[rng.integers(0, 4, size=(B, L))])
    w2 = jnp.asarray(lut[rng.integers(0, 4, size=(B, L))])
    l = jnp.asarray(np.full((B,), L, np.int32))

    @jax.jit
    def bench(w, w2, l):
        def body(carry, _):
            wv = jnp.where(carry > 0, w2, w)
            h = sharded_fingerprint_hashes(mesh, wv, l)
            return (h[0] & jnp.uint64(1)).astype(jnp.int32), h.sum()

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return sums

    dt = _chained_best(bench, w, w2, l)
    return B * iters * L / dt


def bench_allpairs(mesh, R, Q, S, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fpmash_tpu.parallel.sharded import sharded_all_pairs

    rng = np.random.default_rng(1)

    def mk(n):
        a = rng.integers(0, 1 << 62, size=(n, S + 64), dtype=np.uint64)
        return jnp.asarray(np.sort(a, axis=1)[:, :S])

    ref, qry = mk(R), mk(Q)
    rl = jnp.full((R,), S, jnp.int32)
    ql = jnp.full((Q,), S, jnp.int32)

    f = jax.jit(
        lambda q, t: sharded_all_pairs(mesh, ref, rl, q ^ t, ql, sketch_size=S)[0]
    )

    def chain():
        t = jnp.uint64(0)
        c = None
        for _ in range(iters):
            c = f(qry, t)
            t = (c[0, 0] & 1).astype(jnp.uint64)
        return c

    dt = _chained_best(chain)
    return R * Q * iters / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (shape check only)")
    ap.add_argument("--windows", type=int, default=1 << 15)
    ap.add_argument("--window-len", type=int, default=100)
    ap.add_argument("--pairs", type=int, default=128,
                    help="R=Q tile edge for the all-pairs stage")
    ap.add_argument("--sketch-size", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    if args.virtual:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from fpmash_tpu.parallel.mesh import default_mesh

    n = jax.device_count()
    counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n]
    print(f"backend={jax.default_backend()} devices={n} sweep={counts}",
          file=sys.stderr, flush=True)

    rows = []
    base_fp = base_ap = None
    for d in counts:
        mesh = default_mesh(d)
        fp = bench_fingerprint(mesh, args.windows, args.window_len, args.iters)
        ap_rate = bench_allpairs(
            mesh, args.pairs, args.pairs, args.sketch_size, args.iters
        )
        if d == 1:
            base_fp, base_ap = fp, ap_rate
        rows.append(
            {
                "devices": d,
                "fingerprint_bases_per_s": round(fp),
                "fingerprint_scaling_eff": round(fp / (d * base_fp), 3),
                "allpairs_comparisons_per_s": round(ap_rate),
                "allpairs_scaling_eff": round(ap_rate / (d * base_ap), 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
