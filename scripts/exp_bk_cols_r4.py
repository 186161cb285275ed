"""Interleaved sweep: bottom-k compaction row width (cols) 1024 vs 512 /
256 / 128.  Narrower rows make the per-row sort network cheaper (~log
cols) but raise the candidate cap C*P; the batched candidate sort
absorbs that.  Usage: python scripts/exp_bk_cols_r4.py [N]"""
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
    print(f"N={N} backend={jax.default_backend()}", flush=True)

    def bk(lo, hi, cols, P):
        C = N // cols
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

    CFG = [(1024, 16), (2048, 24), (4096, 40), (8192, 72)]

    def make(cols, P, iters):
        @jax.jit
        def bench(plo, phi):
            t = jnp.uint32(0)
            acc = jnp.uint64(0)
            for _ in range(iters):
                vals = bk(plo ^ t, phi ^ t, cols, P)
                t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                acc = acc + vals.sum()
            return acc
        return bench

    base = jax.device_get(make(1024, 16, 1)(plo, phi))
    for cols, P in CFG[1:]:
        got = jax.device_get(make(cols, P, 1)(plo, phi))
        print(f"cols={cols}: parity {'OK' if int(got) == int(base) else 'MISMATCH'}",
              flush=True)

    fns = {}
    for cols, P in CFG:
        for iters in (4, 16):
            fns[(cols, iters)] = make(cols, P, iters)
            jax.block_until_ready(fns[(cols, iters)](plo, phi))
    times = {k: [] for k in fns}
    for _ in range(5):
        for k, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get(f(plo, phi))
            times[k].append(time.perf_counter() - t0)
    for cols, P in CFG:
        t1 = min(times[(cols, 4)])
        t2 = min(times[(cols, 16)])
        rate = N * 12 / (t2 - t1)
        print(f"cols={cols} P={P}: t4={t1*1e3:.1f}ms t16={t2*1e3:.1f}ms "
              f"slope={rate/1e6:.0f} M/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
