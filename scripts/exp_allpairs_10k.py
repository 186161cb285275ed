"""BASELINE config 4: all-pairs distance over 10k sketches (s=1000).

Runs the PRODUCTION host tile loop (ops.compare.all_pairs_common_denom —
the same function `dist`/`triangle` call), not a synthetic kernel chain:
10k x 10k = 100M pairs stream through fixed-shape 512-wide device-resident
tiles reusing one compiled executable.  Wall-clock includes result
fetch and placement, i.e. a real end-to-end number (round 3: 160 s on the
tunneled dev rig, of which ~25 s is kernel compute — the tunnel's ~3 MB/s
result download dominates; PCIe-attached chips are compute-bound).

Usage: python scripts/exp_allpairs_10k.py [N] [S]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    import jax

    from fpmash_tpu.ops.compare import all_pairs_common_denom

    rng = np.random.default_rng(0)
    print(f"N={N} S={S} backend={jax.default_backend()}", flush=True)
    # synthetic sorted-distinct sketches with planted overlap structure
    base = np.sort(rng.integers(1, 1 << 62, size=4 * S, dtype=np.uint64))
    sketches = []
    for i in range(N):
        take = rng.choice(4 * S, S, replace=False)
        sketches.append(np.sort(base[take]))
    t0 = time.perf_counter()
    common, denom = all_pairs_common_denom(sketches, sketches, sketch_size=S)
    dt = time.perf_counter() - t0
    rate = N * N / dt
    print(
        f"time={dt:.1f}s  {rate/1e6:.2f} M comparisons/s  "
        f"(diag common[0,0]={common[0,0]}, denom[0,0]={denom[0,0]})",
        flush=True,
    )
    # sanity: self-comparison must be full overlap
    assert common[0, 0] == denom[0, 0]
    return 0


if __name__ == "__main__":
    sys.exit(main())
