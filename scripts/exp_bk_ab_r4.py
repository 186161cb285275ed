"""Interleaved A/B: bottom_k_threshold_planes need_counts True vs False,
same inputs, same process — settles the 0.5-1.5 G run-to-run swing.
Usage: python scripts/exp_bk_ab_r4.py [N]"""
import sys, time
import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    import jax
    import jax.numpy as jnp
    from fpmash_tpu.ops.bottomk import bottom_k_threshold_planes

    rng = np.random.default_rng(0)
    plo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    phi = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    print(f"N={N} backend={jax.default_backend()}", flush=True)

    def make(nc, iters):
        @jax.jit
        def bench(plo, phi):
            t = jnp.uint32(0)
            acc = jnp.uint64(0)
            for _ in range(iters):
                vals = bottom_k_threshold_planes(
                    plo ^ t, phi, (plo ^ t) > 0, s=1000, need_counts=nc
                )[0]
                t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                acc = acc + vals.sum()
            return acc
        return bench

    fns = {}
    for nc in (True, False):
        for iters in (4, 16):
            fns[(nc, iters)] = make(nc, iters)
            jax.block_until_ready(fns[(nc, iters)](plo, phi))

    # interleave 5 rounds
    times = {k: [] for k in fns}
    for _ in range(5):
        for k, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get(f(plo, phi))
            times[k].append(time.perf_counter() - t0)
    for nc in (True, False):
        t1 = min(times[(nc, 4)])
        t2 = min(times[(nc, 16)])
        rate = N * 12 / (t2 - t1)
        print(f"need_counts={nc}: t4={t1*1e3:.1f}ms t16={t2*1e3:.1f}ms "
              f"slope={rate/1e6:.0f} M/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
