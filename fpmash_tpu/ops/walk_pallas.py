"""Pallas kernel for the order-dependent merge-join walk (dist -fp).

The XLA formulation (ops/walk.py) steps all pairs in lockstep but pays
two pool-sized GATHERS per step (``A[r, i]``, ``B[q, j]``) — measured
0.26 M pairs/s on chip at L=64 lists (gather-bound).  This kernel keeps a
block of pairs resident in VMEM and replaces the gathers with conditional
SHIFT REGISTERS: each pair's lists ride the lanes, and advancing a
pointer is a masked lane-roll by one, so the "current element" is always
lane 0 — a slice, not a gather.

* layout: 64 pairs (8 ref x 8 qry) per grid step on the sublane axis,
  list elements on the lanes as (lo, hi) u32 planes (mirrors
  ops/compare_pallas.py).
* per step: compare lane-0 elements (u64 lex on pairs), advance the
  matching shift registers (masked roll by -1), update
  i/j/common/denom scalars [64, 1]; ``live`` freezes exhausted pairs, so
  rolled-around garbage is never read.
* trip count: static ``min(sketch_size, Sp_ref + Sp_qry)`` — every walk
  iteration consumes at least one element (CommandDistance.cpp:376-400).

Semantics identical to the literal walk / ops/walk.py (asserted in
interpret tests on adversarially unsorted lists and on chip in
scripts/chip_smoke.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

GR = 8
GQ = 8

_U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _walk_kernel(Sp1: int, Sp2: int, sketch_size: int, steps: int,
                 al_ref, ah_ref, bl_ref, bh_ref, la_ref, lb_ref, out_ref):
    G = GR * GQ
    al = jnp.repeat(al_ref[:], GQ, axis=0)  # [G, Sp1]
    ah = jnp.repeat(ah_ref[:], GQ, axis=0)
    bl = jnp.tile(bl_ref[:], (GR, 1))  # [G, Sp2]
    bh = jnp.tile(bh_ref[:], (GR, 1))
    la = jnp.repeat(la_ref[:][:, :1].astype(jnp.int32), GQ, axis=0)  # [G, 1]
    lb = jnp.tile(lb_ref[:][:, :1].astype(jnp.int32), (GR, 1))

    zero1 = jnp.zeros((G, 1), jnp.int32)
    one = jnp.int32(1)
    cap = jnp.int32(sketch_size)

    def body(_, st):
        al_, ah_, bl_, bh_, i, j, common, denom = st
        live = (denom < cap) & (i < la) & (j < lb)  # [G, 1]
        a_lo, a_hi = al_[:, :1], ah_[:, :1]
        b_lo, b_hi = bl_[:, :1], bh_[:, :1]
        lt = (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))
        gt = (b_hi < a_hi) | ((b_hi == a_hi) & (b_lo < a_lo))
        adv_i = live & ~gt  # a <= b
        adv_j = live & ~lt  # b <= a
        # masked shift-register advance (broadcast [G,1] over lanes)
        al_ = jnp.where(adv_i, jnp.roll(al_, -1, axis=1), al_)
        ah_ = jnp.where(adv_i, jnp.roll(ah_, -1, axis=1), ah_)
        bl_ = jnp.where(adv_j, jnp.roll(bl_, -1, axis=1), bl_)
        bh_ = jnp.where(adv_j, jnp.roll(bh_, -1, axis=1), bh_)
        i = i + jnp.where(adv_i, one, zero1)
        j = j + jnp.where(adv_j, one, zero1)
        common = common + jnp.where(live & ~lt & ~gt, one, zero1)
        denom = denom + jnp.where(live, one, zero1)
        return (al_, ah_, bl_, bh_, i, j, common, denom)

    # manual 4x unroll (Mosaic's fori_loop only supports unroll=1 or
    # full): surplus steps are no-ops once ``live`` drops, so rounding the
    # trip count up is safe
    def body4(t, st):
        for _ in range(4):
            st = body(t, st)
        return st

    init = (al, ah, bl, bh, zero1, zero1, zero1, zero1)
    al_, ah_, bl_, bh_, i, j, common, denom = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(-(-steps // 4)), body4, init
    )

    # post-loop fixup (CommandDistance.cpp:392-400)
    short = denom < cap
    rest = jnp.maximum(la - i, zero1) + jnp.maximum(lb - j, zero1)
    denom = jnp.where(short, jnp.minimum(denom + rest, cap), denom)

    out_ref[0:G, :] = jnp.broadcast_to(common, (G, 128))
    out_ref[G : 2 * G, :] = jnp.broadcast_to(denom, (G, 128))


@partial(jax.jit, static_argnames=("sketch_size", "max_steps", "interpret"))
def pairwise_walk_pallas(
    ref: jax.Array,  # u64[R, S1] file-order hash lists
    ref_len: jax.Array,  # i32[R]
    qry: jax.Array,  # u64[Q, S2]
    qry_len: jax.Array,  # i32[Q]
    *,
    sketch_size: int,
    max_steps: int | None = None,
    interpret: bool = False,
):
    """(common i32[R, Q], denom i32[R, Q]) — R, Q multiples of 8.

    ``max_steps``: static upper bound on true walk length (callers that
    know the real max list lengths pass min(S, max_la + max_lb), ideally
    pow2-bucketed — the padded lane width would otherwise set the trip
    count, which over-steps short fingerprint lists by up to 10x).
    """
    R, S1 = ref.shape
    Q, S2 = qry.shape
    Sp1 = max(128, -(-S1 // 128) * 128)
    Sp2 = max(128, -(-S2 // 128) * 128)

    def planes(x, Sp):
        if x.shape[1] != Sp:
            x = jnp.concatenate(
                [x, jnp.full((x.shape[0], Sp - x.shape[1]), _U64MAX)], axis=1
            )
        return (
            (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (x >> jnp.uint64(32)).astype(jnp.uint32),
        )

    al, ah = planes(ref, Sp1)
    bl, bh = planes(qry, Sp2)
    # lens as [N, 128] lane-replicated i32 slabs (scalar-per-row transport)
    laf = jnp.broadcast_to(ref_len.astype(jnp.int32)[:, None], (R, 128))
    lbf = jnp.broadcast_to(qry_len.astype(jnp.int32)[:, None], (Q, 128))

    steps = int(min(sketch_size, Sp1 + Sp2))
    if max_steps is not None:
        steps = max(1, min(steps, int(max_steps)))
    Rb, Qb = R // GR, Q // GQ
    G = GR * GQ
    Z = np.int32(0)  # np scalar: index maps must not see bare 0 (i64 trap)
    call = pl.pallas_call(
        partial(_walk_kernel, Sp1, Sp2, sketch_size, steps),
        grid=(Rb, Qb),
        out_shape=jax.ShapeDtypeStruct((Rb * Qb * 2 * G, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec((GR, Sp1), lambda i, j: (i, Z)),
            pl.BlockSpec((GR, Sp1), lambda i, j: (i, Z)),
            pl.BlockSpec((GQ, Sp2), lambda i, j: (j, Z)),
            pl.BlockSpec((GQ, Sp2), lambda i, j: (j, Z)),
            pl.BlockSpec((GR, 128), lambda i, j: (i, Z)),
            pl.BlockSpec((GQ, 128), lambda i, j: (j, Z)),
        ],
        out_specs=pl.BlockSpec((2 * G, 128), lambda i, j, Qb=Qb: (i * Qb + j, Z)),
        interpret=interpret,
    )
    out = call(al, ah, bl, bh, laf, lbf)
    out = out[:, 0].reshape(Rb * Qb, 2, G)
    c = out[:, 0, :].reshape(Rb, Qb, GR, GQ).transpose(0, 2, 1, 3).reshape(R, Q)
    d = out[:, 1, :].reshape(Rb, Qb, GR, GQ).transpose(0, 2, 1, 3).reshape(R, Q)
    return c, d
