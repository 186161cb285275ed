"""On-chip validation + timing of the fused direct classic sketch route.

1. Parity: Sketch.init_from_sequences on a ~200 kbase sequence (auto
   backend -> direct route on TPU) vs the scalar pipeline.
2. Timing: wall clock of sketching an 8 Mbase sequence through the
   Sketch API (includes host prep + dispatch + s-sized fetch), second
   call timed (warm executable).
Usage: python scripts/exp_direct_route_r4.py"""
import sys, time
import numpy as np


def main():
    import jax
    from fpmash_tpu.models import sketch as sk

    print(f"backend={jax.default_backend()}", flush=True)
    sk._DIRECT_CHUNK = 1 << 24
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=3_000_000))
    p = sk.SketchParams()

    t0 = time.perf_counter()
    direct = sk._classic_sketch_direct([seq], p, "auto")
    print(f"direct route taken: {direct is not None} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)
    want = sk._kmer_hash_pool([seq], p, "auto")
    from fpmash_tpu.ops.bottomk import bottom_k_host

    wv, wc = bottom_k_host(want, p.sketch_size)
    gv, gc = direct
    ok = np.array_equal(gv, wv)
    print(f"parity vs pool path: {'OK' if ok else 'MISMATCH'}", flush=True)

    big = "".join("ACGT"[c] for c in rng.integers(0, 4, size=8_000_000))
    s1 = sk.Sketch(p)
    t0 = time.perf_counter()
    s1.init_from_sequences([("g", "", big)], name="g", merge=True)
    print(f"cold 8 Mbase sketch: {time.perf_counter()-t0:.1f}s", flush=True)
    s2 = sk.Sketch(p)
    t0 = time.perf_counter()
    s2.init_from_sequences([("g", "", big)], name="g", merge=True)
    dt = time.perf_counter() - t0
    print(f"warm 8 Mbase sketch: {dt:.2f}s = {8e6/dt/1e6:.1f} Mbases/s "
          f"end-to-end incl host", flush=True)
    assert np.array_equal(s1.references[0].hashes, s2.references[0].hashes)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
