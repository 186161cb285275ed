"""Interleaved A/B: candidate flat sort via lax.sort vs the batched
row-sort + bitonic-merge (_sort_planes_flat) inside the full bottom-k.
Round 3 rejected the batched variant on floored single-point timings;
this re-decides with slopes in one process.
Usage: python scripts/exp_bk_sort_r4.py [N]"""
import sys, time
import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    import jax
    import jax.numpy as jnp
    from fpmash_tpu.ops.bottomk import _sort_planes_flat, _U64MAX

    rng = np.random.default_rng(0)
    s = 1000
    U32MAX = jnp.uint32(0xFFFFFFFF)
    plo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    phi = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    cols = 1024
    C = N // cols
    P = min(cols, max(16, -(-32 * s // max(C, 1))))
    print(f"N={N} C={C} P={P} cap={C*P} backend={jax.default_backend()}", flush=True)

    def bk(lo, hi, flat_batched):
        valid = lo > 0
        n_valid = jnp.sum(valid.astype(jnp.int64))
        frac = jnp.minimum((8.0 * s) / jnp.maximum(n_valid.astype(jnp.float32), 1.0), 1.0)
        t_hi = (frac * float(2**32)).astype(jnp.uint32)
        mask = valid & (hi <= t_hi)
        ylo = jnp.where(mask, lo, U32MAX).reshape(C, cols)
        yhi = jnp.where(mask, hi, U32MAX).reshape(C, cols)
        yhi, ylo = jax.lax.sort((yhi, ylo), num_keys=1)
        chi = yhi[:, :P].reshape(C * P)
        clo = ylo[:, :P].reshape(C * P)
        if flat_batched:
            chi, clo = _sort_planes_flat(chi, clo)
        else:
            chi, clo = jax.lax.sort((chi, clo), num_keys=2)
        neq = (chi[1:] != chi[:-1]) | (clo[1:] != clo[:-1])
        is_start = jnp.concatenate([jnp.array([True]), neq])
        is_start = is_start & ~((chi == U32MAX) & (clo == U32MAX))
        cap = C * P
        out_idx = jnp.nonzero(is_start, size=s, fill_value=cap)[0]
        opad = out_idx >= cap
        out_idx = jnp.minimum(out_idx, cap - 1)
        vals64 = (chi[out_idx].astype(jnp.uint64) << jnp.uint64(32)) | clo[out_idx].astype(jnp.uint64)
        return jnp.where(opad, _U64MAX, vals64)

    def make(fb, iters):
        @jax.jit
        def bench(plo, phi):
            t = jnp.uint32(0)
            acc = jnp.uint64(0)
            for _ in range(iters):
                vals = bk(plo ^ t, phi ^ t, fb)
                t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                acc = acc + vals.sum()
            return acc
        return bench

    # value parity first
    a = jax.device_get(make(False, 1)(plo, phi))
    b = jax.device_get(make(True, 1)(plo, phi))
    print("parity:", "OK" if int(a) == int(b) else f"MISMATCH {a} {b}", flush=True)

    fns = {}
    for fb in (False, True):
        for iters in (4, 16):
            fns[(fb, iters)] = make(fb, iters)
            jax.block_until_ready(fns[(fb, iters)](plo, phi))
    times = {k: [] for k in fns}
    for _ in range(5):
        for k, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get(f(plo, phi))
            times[k].append(time.perf_counter() - t0)
    for fb in (False, True):
        t1 = min(times[(fb, 4)])
        t2 = min(times[(fb, 16)])
        rate = N * 12 / (t2 - t1)
        print(f"flat_batched={fb}: t4={t1*1e3:.1f}ms t16={t2*1e3:.1f}ms "
              f"slope={rate/1e6:.0f} M/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
