"""Pallas bitonic row sort for the bottom-k compaction.

Sorts each row of a ``[C, 4096]`` (key, payload) u32 plane pair
ascending by key — the one-key row sort that compacts threshold
candidates to row fronts (`ops/bottomk.py`).  The bitonic network runs
in VMEM with lane rolls and i1 boolean algebra (the compare kernel's
construct); measured 1.14x XLA's ``lax.sort`` on the compaction stage
(scripts/exp_psort_r4.py, interleaved slope A/B).

Ties on the key may order differently than lax.sort — irrelevant to
bottom-k, whose downstream two-key candidate sort fixes the global
order (final sketches are bitwise identical; asserted in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

G = 8
COLS = 4096


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
            # ascending region iff (lane & s) == 0 (trivially true on the
            # final s == n merge).  i1 boolean algebra only — selects
            # with BOOL operands are a Mosaic trap.
            asc = (lane & jnp.int32(s)) == jnp.int32(0)
            p_less = qh < kh
            p_greater = kh < qh
            ueq = upper == asc
            take = (p_less & ~ueq) | (p_greater & ueq)
            kh = jnp.where(take, qh, kh)
            kl = jnp.where(take, ql, kl)
            d //= 2
        s *= 2
    oh_ref[:] = kh
    ol_ref[:] = kl


@partial(jax.jit, static_argnames=("interpret",))
def row_sort_planes_pallas(
    keys: jax.Array,  # u32[C, 4096], C a multiple of 8
    payload: jax.Array,  # u32[C, 4096]
    *,
    interpret: bool = False,
):
    """(sorted_keys, moved_payload) — each row ascending by key."""
    C = keys.shape[0]
    if keys.shape[1] != COLS or C % G:
        raise ValueError("row_sort_planes_pallas needs [8k, 4096] planes")
    blocks = C // G
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
        interpret=interpret,
    )
    return tuple(call(keys, payload))
