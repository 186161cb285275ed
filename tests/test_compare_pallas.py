"""Pallas fused bitonic-merge comparison vs the XLA kernel (itself pinned
to the literal CommandDistance walk)."""

import numpy as np
import pytest


def _mk(rng, n, S, lo_len, hi_len):
    rows = np.full((n, S), np.uint64(0xFFFFFFFFFFFFFFFF))
    lens = rng.integers(lo_len, hi_len + 1, n).astype(np.int32)
    for i in range(n):
        v = np.sort(
            rng.choice(np.arange(1, 10**6, dtype=np.uint64), int(lens[i]), replace=False)
        )
        rows[i, : lens[i]] = v
    return rows, lens


@pytest.mark.parametrize("S,cap", [(100, 64), (128, 128), (300, 256)])
def test_pallas_compare_matches_xla(S, cap):
    import jax.numpy as jnp

    from fpmash_tpu.ops.compare import pairwise_common_denom
    from fpmash_tpu.ops.compare_pallas import pairwise_common_denom_pallas

    rng = np.random.default_rng(S)
    R = Q = 16
    ref, rl = _mk(rng, R, S, S // 2, S)
    qry, ql = _mk(rng, Q, S, S // 2, S)
    # force heavy sharing on some pairs
    qry[3, :40] = ref[5, :40]
    qry[3] = np.sort(qry[3])
    c0, d0 = pairwise_common_denom(
        jnp.asarray(ref), jnp.asarray(rl), jnp.asarray(qry), jnp.asarray(ql),
        sketch_size=cap,
    )
    c1, d1 = pairwise_common_denom_pallas(
        jnp.asarray(ref), jnp.asarray(rl), jnp.asarray(qry), jnp.asarray(ql),
        sketch_size=cap, interpret=True,
    )
    assert np.array_equal(np.asarray(c0), np.asarray(c1))
    assert np.array_equal(np.asarray(d0), np.asarray(d1))
