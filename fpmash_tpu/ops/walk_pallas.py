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


def _walk_kernel(Sp1: int, Sp2: int, sketch_size: int, steps: int, pack: int,
                 al_ref, ah_ref, bl_ref, bh_ref, la_ref, lb_ref, out_ref):
    """``pack`` > 1 places PACK independent pairs per 128-lane row: pair
    slot ``s`` owns lanes ``[s*128/pack, (s+1)*128/pack)``; the whole row
    still rolls by one lane under a PER-SLOT advance mask.  The roll leaks
    the next slot's first element across the slot boundary, but the
    garbage front starts at the boundary and moves toward lane 0 by at
    most one lane per advance, while slot ``s``'s head (its lane 0) after
    ``m`` advances reads original element ``m`` with ``m <= len-1 <
    128/pack`` — the head always dies (``i >= la``) before the front can
    reach it, so packed results are bit-identical (asserted in tests
    against the literal walk).  This multiplies pairs-per-roll by PACK —
    the roll over the full lane width was the kernel's dominant cost."""
    G = GR * GQ
    P = pack
    slot = 128 // P
    al = jnp.repeat(al_ref[:], GQ, axis=0)  # [G, 128] (P slots of Sp1<=slot)
    ah = jnp.repeat(ah_ref[:], GQ, axis=0)
    bl = jnp.tile(bl_ref[:], (GR, 1))  # [G, 128]
    bh = jnp.tile(bh_ref[:], (GR, 1))
    # lengths ride lane s*slot of each row's slot s
    laf = jnp.repeat(la_ref[:].astype(jnp.int32), GQ, axis=0)  # [G, 128]
    lbf = jnp.tile(lb_ref[:].astype(jnp.int32), (GR, 1))
    la = [laf[:, s * slot : s * slot + 1] for s in range(P)]  # P x [G, 1]
    lb = [lbf[:, s * slot : s * slot + 1] for s in range(P)]

    zero1 = jnp.zeros((G, 1), jnp.int32)
    one = jnp.int32(1)
    cap = jnp.int32(sketch_size)
    if P > 1:
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
        slot_id = lane >> jnp.int32((slot - 1).bit_length())

    def lane_mask(advs):
        # [G, 128] mask selecting each slot's [G, 1] advance flag.
        # Built in i32 and compared to 0: a select with BOOL operands
        # lowers through an i8->i1 trunci Mosaic cannot compile
        # ("Unsupported target bitwidth for truncation", hit on chip
        # 2026-08-21); i32 operands + an i1 comparison result are fine.
        m = jnp.zeros((G, 128), jnp.int32)
        for s in range(P):
            m = m + jnp.where(
                slot_id == jnp.int32(s),
                jnp.broadcast_to(advs[s].astype(jnp.int32), (G, 128)),
                jnp.zeros((G, 128), jnp.int32),
            )
        return m != jnp.int32(0)

    def body(_, st):
        al_, ah_, bl_, bh_, i, j, common, denom = st
        adv_is, adv_js = [], []
        for s in range(P):
            c0 = s * slot
            live = (denom[s] < cap) & (i[s] < la[s]) & (j[s] < lb[s])  # [G,1]
            a_lo, a_hi = al_[:, c0 : c0 + 1], ah_[:, c0 : c0 + 1]
            b_lo, b_hi = bl_[:, c0 : c0 + 1], bh_[:, c0 : c0 + 1]
            lt = (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))
            gt = (b_hi < a_hi) | ((b_hi == a_hi) & (b_lo < a_lo))
            adv_i = live & ~gt  # a <= b
            adv_j = live & ~lt  # b <= a
            adv_is.append(adv_i)
            adv_js.append(adv_j)
            i[s] = i[s] + jnp.where(adv_i, one, zero1)
            j[s] = j[s] + jnp.where(adv_j, one, zero1)
            common[s] = common[s] + jnp.where(live & ~lt & ~gt, one, zero1)
            denom[s] = denom[s] + jnp.where(live, one, zero1)
        if P == 1:
            mA, mB = adv_is[0], adv_js[0]  # [G, 1] broadcast over lanes
        else:
            mA, mB = lane_mask(adv_is), lane_mask(adv_js)
        al_ = jnp.where(mA, jnp.roll(al_, -1, axis=1), al_)
        ah_ = jnp.where(mA, jnp.roll(ah_, -1, axis=1), ah_)
        bl_ = jnp.where(mB, jnp.roll(bl_, -1, axis=1), bl_)
        bh_ = jnp.where(mB, jnp.roll(bh_, -1, axis=1), bh_)
        return (al_, ah_, bl_, bh_, i, j, common, denom)

    # manual 4x unroll (Mosaic's fori_loop only supports unroll=1 or
    # full): surplus steps are no-ops once ``live`` drops, so rounding the
    # trip count up is safe
    def body4(t, st):
        for _ in range(4):
            st = body(t, st)
        return st

    def zP():
        return [zero1] * P

    init = (al, ah, bl, bh, zP(), zP(), zP(), zP())
    al_, ah_, bl_, bh_, i, j, common, denom = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(-(-steps // 4)), body4, init
    )

    # post-loop fixup (CommandDistance.cpp:392-400)
    for s in range(P):
        short = denom[s] < cap
        rest = jnp.maximum(la[s] - i[s], zero1) + jnp.maximum(lb[s] - j[s], zero1)
        denom[s] = jnp.where(short, jnp.minimum(denom[s] + rest, cap), denom[s])
        out_ref[2 * s * G : (2 * s + 1) * G, :] = jnp.broadcast_to(
            common[s], (G, 128)
        )
        out_ref[(2 * s + 1) * G : (2 * s + 2) * G, :] = jnp.broadcast_to(
            denom[s], (G, 128)
        )


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
    # pair packing: with both lists <= 64 (or 32) lanes, 2 (or 4) query
    # slots share each 128-lane row — same roll work, PACK x pairs
    Smax = max(S1, S2)
    if Smax <= 32:
        P = 4
    elif Smax <= 64:
        P = 2
    else:
        P = 1
    slot = 128 // P
    Sp1 = slot if P > 1 else max(128, -(-S1 // 128) * 128)
    Sp2 = slot if P > 1 else max(128, -(-S2 // 128) * 128)

    # pad Q up to a multiple of GQ*P so packed rows are full
    Qp = -(-Q // (GQ * P)) * (GQ * P)
    if Qp != Q:
        qry = jnp.concatenate(
            [qry, jnp.full((Qp - Q, S2), _U64MAX)], axis=0
        )
        qry_len = jnp.concatenate(
            [qry_len, jnp.zeros((Qp - Q,), qry_len.dtype)], axis=0
        )

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
    la_i = ref_len.astype(jnp.int32)
    lb_i = qry_len.astype(jnp.int32)
    if P > 1:
        # ref row: the same list tiled into every slot; its length likewise
        al = jnp.tile(al, (1, P))
        ah = jnp.tile(ah, (1, P))
        # qry rows fold P consecutive queries into one row's P slots
        bl = bl.reshape(Qp // P, P * Sp2)
        bh = bh.reshape(Qp // P, P * Sp2)
        laf = jnp.broadcast_to(la_i[:, None], (R, 128))
        lbf = jnp.repeat(lb_i.reshape(Qp // P, P), slot, axis=1)
    else:
        laf = jnp.broadcast_to(la_i[:, None], (R, 128))
        lbf = jnp.broadcast_to(lb_i[:, None], (Qp, 128))
    Qrows = Qp // P

    steps = int(min(sketch_size, Sp1 + Sp2))
    if max_steps is not None:
        steps = max(1, min(steps, int(max_steps)))
    Rb, Qb = R // GR, Qrows // GQ
    G = GR * GQ
    W1 = P * Sp1 if P > 1 else Sp1
    W2 = P * Sp2 if P > 1 else Sp2
    Z = np.int32(0)  # np scalar: index maps must not see bare 0 (i64 trap)
    call = pl.pallas_call(
        partial(_walk_kernel, Sp1, Sp2, sketch_size, steps, P),
        grid=(Rb, Qb),
        out_shape=jax.ShapeDtypeStruct((Rb * Qb * 2 * P * G, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec((GR, W1), lambda i, j: (i, Z)),
            pl.BlockSpec((GR, W1), lambda i, j: (i, Z)),
            pl.BlockSpec((GQ, W2), lambda i, j: (j, Z)),
            pl.BlockSpec((GQ, W2), lambda i, j: (j, Z)),
            pl.BlockSpec((GR, 128), lambda i, j: (i, Z)),
            pl.BlockSpec((GQ, 128), lambda i, j: (j, Z)),
        ],
        out_specs=pl.BlockSpec(
            (2 * P * G, 128), lambda i, j, Qb=Qb: (i * Qb + j, Z)
        ),
        interpret=interpret,
    )
    out = call(al, ah, bl, bh, laf, lbf)
    out = out[:, 0].reshape(Rb, Qb, P, 2, GR, GQ)
    # pair (r, q): r = i*GR + gr; q = (j*GQ + gq)*P + s
    c = out[:, :, :, 0, :, :].transpose(0, 3, 1, 4, 2).reshape(R, Qp)
    d = out[:, :, :, 1, :, :].transpose(0, 3, 1, 4, 2).reshape(R, Qp)
    return c[:, :Q], d[:, :Q]
