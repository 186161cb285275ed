"""On-chip rate of the Pallas shift-register walk kernel (dist -fp)."""
import sys, time
import numpy as np

def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    import jax, jax.numpy as jnp
    from fpmash_tpu.ops.walk_pallas import pairwise_walk_pallas
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 1 << 32, size=(R, L), dtype=np.uint64))
    qry = jnp.asarray(rng.integers(0, 1 << 32, size=(Q, L), dtype=np.uint64))
    rl = jnp.asarray(rng.integers(1, L + 1, size=R).astype(np.int32))
    ql = jnp.asarray(rng.integers(1, L + 1, size=Q).astype(np.int32))
    print(f"R={R} Q={Q} L={L} N={N} backend={jax.default_backend()}", flush=True)

    @jax.jit
    def bench(ref, qry):
        t = jnp.uint64(0)
        acc = jnp.int32(0)
        for _ in range(N):
            c, d = pairwise_walk_pallas(ref, rl, qry ^ t, ql, sketch_size=1000)
            t = (c[0, 0] & 1).astype(jnp.uint64)
            acc = acc + c.sum() + d.sum()
        return acc

    t0 = time.perf_counter()
    out = jax.block_until_ready(bench(ref, qry))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s out={int(np.asarray(out))}", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(bench(ref, qry))
        best = min(best, time.perf_counter() - t0)
    print(f"OK time={best:.3f}s  {R*Q*N/best/1e6:.3f} M pairs/s", flush=True)
    return 0

if __name__ == "__main__":
    sys.exit(main())
