"""Pallas bitonic row sort vs XLA lax.sort for the bottom-k compaction.

The bottom-k's dominant stage is the [C, 4096] one-key row sort (~1
ns/elem via lax.sort).  A Pallas bitonic network over lanes — the
compare kernel's construct, which sustains ~80% VPU issue — costs
(log n)(log n + 1)/2 = 78 compare-exchange stages at ~12 ops each,
~0.25 ns/elem at the demonstrated issue rate.  Interleaved slope A/B
with value parity on the compaction semantics (non-candidates sort to
the back; only the first P slots are consumed).

Usage: python scripts/exp_psort_r4.py [N]
"""
import sys
import time
from functools import partial

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    COLS = 4096
    G = 8
    C = N // COLS
    assert C % G == 0
    blocks = C // G
    print(f"N={N} C={C} blocks={blocks} backend={jax.default_backend()}",
          flush=True)

    def _psort_kernel(kh_ref, kl_ref, oh_ref, ol_ref):
        kh = kh_ref[:]
        kl = kl_ref[:]
        n = COLS
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, n), 1)
        s = 2
        while s <= n:
            d = s // 2
            while d >= 1:
                fh = jnp.roll(kh, -d, axis=1)
                fl = jnp.roll(kl, -d, axis=1)
                gh = jnp.roll(kh, d, axis=1)
                gl = jnp.roll(kl, d, axis=1)
                upper = (lane & jnp.int32(d)) != jnp.int32(0)
                qh = jnp.where(upper, gh, fh)
                ql = jnp.where(upper, gl, fl)
                # ascending region iff (lane & s) == 0; final merge (s=n)
                # is ascending everywhere
                if s < n:
                    asc = (lane & jnp.int32(s)) == jnp.int32(0)
                else:
                    asc = lane >= jnp.int32(0)
                p_less = qh < kh
                p_greater = kh < qh
                # take the partner when (partner<own) ^ we sit on the side
                # that should hold the larger element
                ueq = upper == asc  # i1 algebra only; no bool selects
                take = (p_less & ~ueq) | (p_greater & ueq)
                kh = jnp.where(take, qh, kh)
                kl = jnp.where(take, ql, kl)
                d //= 2
            s *= 2
        oh_ref[:] = kh
        ol_ref[:] = kl

    Z = np.int32(0)
    call = pl.pallas_call(
        _psort_kernel,
        grid=(blocks,),
        out_shape=[
            jax.ShapeDtypeStruct((C, COLS), jnp.uint32),
            jax.ShapeDtypeStruct((C, COLS), jnp.uint32),
        ],
        in_specs=[
            pl.BlockSpec((G, COLS), lambda i: (i, Z)),
            pl.BlockSpec((G, COLS), lambda i: (i, Z)),
        ],
        out_specs=[
            pl.BlockSpec((G, COLS), lambda i: (i, Z)),
            pl.BlockSpec((G, COLS), lambda i: (i, Z)),
        ],
    )

    rng = np.random.default_rng(0)
    s = 1000
    U32MAX = jnp.uint32(0xFFFFFFFF)
    plo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    phi = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
    P = 40

    from fpmash_tpu.ops.bottomk import _U64MAX, _sort_planes_flat

    def full_bk(lo, hi, pallas_sort):
        chi2, clo2 = compact(lo, hi, pallas_sort)
        chi = chi2.reshape(-1)
        clo = clo2.reshape(-1)
        cap = chi.shape[0]
        chi, clo = _sort_planes_flat(chi, clo)
        neq = (chi[1:] != chi[:-1]) | (clo[1:] != clo[:-1])
        is_start = jnp.concatenate([jnp.array([True]), neq])
        is_start = is_start & ~((chi == U32MAX) & (clo == U32MAX))
        out_idx = jnp.nonzero(is_start, size=s, fill_value=cap)[0]
        opad = out_idx >= cap
        out_idx = jnp.minimum(out_idx, cap - 1)
        vals64 = (chi[out_idx].astype(jnp.uint64) << jnp.uint64(32)) | clo[out_idx].astype(jnp.uint64)
        return jnp.where(opad, _U64MAX, vals64)

    def compact(lo, hi, pallas_sort):
        valid = lo > 0
        n_valid = jnp.sum(valid.astype(jnp.int64))
        frac = jnp.minimum((8.0 * s) / jnp.maximum(n_valid.astype(jnp.float32), 1.0), 1.0)
        t_hi = (frac * float(2**32)).astype(jnp.uint32)
        mask = valid & (hi <= t_hi)
        ylo = jnp.where(mask, lo, U32MAX).reshape(C, COLS)
        yhi = jnp.where(mask, hi, U32MAX).reshape(C, COLS)
        if pallas_sort:
            yhi, ylo = call(yhi, ylo)
        else:
            yhi, ylo = jax.lax.sort((yhi, ylo), num_keys=1)
        return yhi[:, :P], ylo[:, :P]

    def make(ps, iters):
        @jax.jit
        def bench(plo, phi):
            t = jnp.uint32(0)
            acc = jnp.uint64(0)
            for _ in range(iters):
                vals = full_bk(plo ^ t, phi ^ t, ps)
                t = (vals[0] & jnp.uint64(1)).astype(jnp.uint32)
                acc = acc + vals.sum()
            return acc
        return bench

    # parity: compare the candidate SETS per row (order may differ for
    # equal hi keys — both orders are valid compactions)
    a_hi, a_lo = jax.device_get(jax.jit(lambda a, b: compact(a, b, False))(plo, phi))
    b_hi, b_lo = jax.device_get(jax.jit(lambda a, b: compact(a, b, True))(plo, phi))
    bad = 0
    for r in range(C):
        sa = sorted(zip(a_hi[r], a_lo[r]))
        sb = sorted(zip(b_hi[r], b_lo[r]))
        if sa != sb:
            bad += 1
    print(f"parity: {'OK' if not bad else f'{bad} rows differ'}", flush=True)

    fns = {}
    for ps in (False, True):
        for iters in (4, 16):
            fns[(ps, iters)] = make(ps, iters)
            t0 = time.perf_counter()
            jax.block_until_ready(fns[(ps, iters)](plo, phi))
            print(f"  compile ps={ps} it={iters}: {time.perf_counter()-t0:.0f}s",
                  flush=True)
    times = {k: [] for k in fns}
    for _ in range(5):
        for k, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get(f(plo, phi))
            times[k].append(time.perf_counter() - t0)
    for ps in (False, True):
        t1 = min(times[(ps, 4)])
        t2 = min(times[(ps, 16)])
        rate = N * 12 / (t2 - t1)
        print(f"pallas={ps}: t4={t1*1e3:.1f}ms t16={t2*1e3:.1f}ms "
              f"slope={rate/1e6:.0f} M/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
