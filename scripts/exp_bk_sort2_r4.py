"""Interleaved A/B: two-operand row-sort compaction (production) vs a
single-key lane-id sort + take_along_axis gathers.  The compaction only
needs "all candidates to the row front" in ANY order, so the sort key
can be ``lane_id if candidate else U32MAX`` — one operand instead of
two and no ylo where-pass, at the cost of two [C, P] gathers.
Usage: python scripts/exp_bk_sort2_r4.py [N]"""
import sys
import time

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
    print(f"N={N} C={C} P={P} backend={jax.default_backend()}", flush=True)

    def bk(lo, hi, laneid):
        valid = lo > 0
        n_valid = jnp.sum(valid.astype(jnp.int64))
        frac = jnp.minimum((8.0 * s) / jnp.maximum(n_valid.astype(jnp.float32), 1.0), 1.0)
        t_hi = (frac * float(2**32)).astype(jnp.uint32)
        mask = valid & (hi <= t_hi)
        lo2 = lo.reshape(C, cols)
        hi2 = hi.reshape(C, cols)
        if laneid:
            lane = jax.lax.broadcasted_iota(jnp.uint32, (C, cols), 1)
            keys = jnp.where(mask.reshape(C, cols), lane, U32MAX)
            keys = jax.lax.sort(keys, dimension=1)[:, :P]
            kpad = keys == U32MAX
            idx = jnp.minimum(keys, jnp.uint32(cols - 1)).astype(jnp.int32)
            chi = jnp.where(kpad, U32MAX, jnp.take_along_axis(hi2, idx, axis=1))
            clo = jnp.where(kpad, U32MAX, jnp.take_along_axis(lo2, idx, axis=1))
            chi = chi.reshape(C * P)
            clo = clo.reshape(C * P)
        else:
            ylo = jnp.where(mask, lo, U32MAX).reshape(C, cols)
            yhi = jnp.where(mask, hi, U32MAX).reshape(C, cols)
            yhi, ylo = jax.lax.sort((yhi, ylo), num_keys=1)
            chi = yhi[:, :P].reshape(C * P)
            clo = ylo[:, :P].reshape(C * P)
        chi, clo = _sort_planes_flat(chi, clo)
        neq = (chi[1:] != chi[:-1]) | (clo[1:] != clo[:-1])
        is_start = jnp.concatenate([jnp.array([True]), neq])
        is_start = is_start & ~((chi == U32MAX) & (clo == U32MAX))
        cap = C * P
        out_idx = jnp.nonzero(is_start, size=s, fill_value=cap)[0]
        opad = out_idx >= cap
        out_idx = jnp.minimum(out_idx, cap - 1)
        vals64 = (chi[out_idx].astype(jnp.uint64) << jnp.uint64(32)) | clo[out_idx].astype(jnp.uint64)
        return jnp.where(opad, _U64MAX, vals64)

    def make(laneid, iters):
        @jax.jit
        def bench(plo, phi):
            t = jnp.uint32(0)
            acc = jnp.uint64(0)
            for _ in range(iters):
                vals = bk(plo ^ t, phi ^ t, laneid)
                t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                acc = acc + vals.sum()
            return acc
        return bench

    a = jax.device_get(make(False, 1)(plo, phi))
    b = jax.device_get(make(True, 1)(plo, phi))
    print("parity:", "OK" if int(a) == int(b) else f"MISMATCH {a} {b}", flush=True)

    fns = {}
    for li in (False, True):
        for iters in (4, 16):
            fns[(li, iters)] = make(li, iters)
            jax.block_until_ready(fns[(li, iters)](plo, phi))
    times = {k: [] for k in fns}
    for _ in range(5):
        for k, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get(f(plo, phi))
            times[k].append(time.perf_counter() - t0)
    for li in (False, True):
        t1 = min(times[(li, 4)])
        t2 = min(times[(li, 16)])
        rate = N * 12 / (t2 - t1)
        print(f"laneid={li}: t4={t1*1e3:.1f}ms t16={t2*1e3:.1f}ms "
              f"slope={rate/1e6:.0f} M/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
