"""On-chip: vmapped fused kmer kernel parity + rate (production hash_rows
path vmaps kmer_hashes over chunk rows; auto-batched pallas must agree
with the XLA ladder on real hardware)."""
import sys, time
import numpy as np

def main():
    N = 1 << 18
    ROWS = 4
    import jax, jax.numpy as jnp
    from fpmash_tpu.ops.kmers import _kmer_hashes_acgt
    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    bufs = jnp.asarray(lut[rng.integers(0, 4, size=(ROWS, N))])
    lens = jnp.asarray(np.full(ROWS, N, np.int32))
    kw = dict(k=21, noncanonical=False, preserve_case=False, seed=42)
    fp = jax.jit(jax.vmap(lambda b, l: _kmer_hashes_acgt(b, l, pallas=True, **kw)))
    fx = jax.jit(jax.vmap(lambda b, l: _kmer_hashes_acgt(b, l, pallas=False, **kw)))
    t0 = time.perf_counter()
    hp, vp = jax.device_get(fp(bufs, lens))
    print(f"pallas-vmap compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    hx, vx = jax.device_get(fx(bufs, lens))
    print(f"xla-vmap compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    ok_v = np.array_equal(vp, vx)
    ok_h = np.array_equal(hp[vx], hx[vx])
    print(f"PARITY valid={ok_v} hash={ok_h}", flush=True)
    return 0 if (ok_v and ok_h) else 1

if __name__ == "__main__":
    sys.exit(main())
