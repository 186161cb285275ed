"""Pallas all-pairs sketch comparison: fused bitonic merge in VMEM.

The XLA formulation of the capped merge-join (ops/compare.py) is correct
but HBM-bound: each of the ~11 merge stages and the rank cumsum
materializes a [pairs, 2S] temporary, so a 128x128 tile moves gigabytes.
This kernel keeps a block of pairs resident in VMEM end to end:

* layout: 64 pairs (8 ref x 8 qry) per grid step ride the SUBLANE axis;
  the ``2*S2`` merge elements ride the LANES (S=1000 -> S2=1024, 2048
  lanes = 16 lane-tiles).  Hashes are (lo, hi) u32 planes.
* the ref rows arrive ascending, the query rows pre-REVERSED (host), so
  their concatenation is bitonic and a bitonic MERGE network sorts it:
  ``log2(2*S2)`` stages of compare-exchange with partner ``lane ^ d``,
  done with two static lane rotations + masked selects per stage.
* union ranks come from an inclusive prefix sum of run starts —
  ``log2`` shifted adds, again lane rotations.
* ``common`` counts adjacent duplicates (cross-list by the within-list
  distinctness contract) whose value rank is under the cap;
  ``denom = min(|union|, S)``  (CommandDistance.cpp:365-430 semantics).

Parity: asserted against ops/compare.pairwise_common_denom (itself
asserted against the literal walk) in tests and on hardware in
scripts/chip_smoke.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

GR = 8  # ref rows per grid step
GQ = 8  # qry rows per grid step

_U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _compare_kernel(S2: int, sketch_size: int, al_ref, ah_ref, bl_ref, bh_ref,
                    cout_ref, dout_ref):
    G = GR * GQ
    n2 = 2 * S2
    # [GR, S2] -> per-pair rows [G, S2]: ref row repeats over its 8 queries
    al = jnp.repeat(al_ref[:], GQ, axis=0)
    ah = jnp.repeat(ah_ref[:], GQ, axis=0)
    bl = jnp.tile(bl_ref[:], (GR, 1))
    bh = jnp.tile(bh_ref[:], (GR, 1))
    xl = jnp.concatenate([al, bl], axis=1)  # [G, 2*S2] bitonic
    xh = jnp.concatenate([ah, bh], axis=1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (G, n2), 1)

    d = S2
    while d >= 1:
        # partner = lane ^ d: lanes with bit d clear look +d, others -d
        fl = jnp.roll(xl, -d, axis=1)
        fh = jnp.roll(xh, -d, axis=1)
        gl = jnp.roll(xl, d, axis=1)
        gh = jnp.roll(xh, d, axis=1)
        upper = (lane & d) != 0
        ql = jnp.where(upper, gl, fl)
        qh = jnp.where(upper, gh, fh)
        p_less = (qh < xh) | ((qh == xh) & (ql < xl))
        p_greater = (xh < qh) | ((xh == qh) & (xl < ql))
        # no jnp.where over i1 operands — Mosaic lowers bool selects via an
        # i8 trunci it cannot compile; pure boolean algebra instead
        take = (upper & p_greater) | (~upper & p_less)
        xl = jnp.where(take, ql, xl)
        xh = jnp.where(take, qh, xh)
        d //= 2

    prevl = jnp.roll(xl, 1, axis=1)
    prevh = jnp.roll(xh, 1, axis=1)
    eq_prev = (xl == prevl) & (xh == prevh) & (lane > 0)
    live = ~((xl == jnp.uint32(0xFFFFFFFF)) & (xh == jnp.uint32(0xFFFFFFFF)))
    is_start = (~eq_prev) & live

    # inclusive prefix sum of run starts along lanes (log shifted adds)
    s = is_start.astype(jnp.int32)
    sh = 1
    while sh < n2:
        t = jnp.roll(s, sh, axis=1)
        # NB: a Python-int 0 here promotes through int64 under x64 and
        # Mosaic's convert lowering recurses forever on 64->32-bit casts;
        # keep every kernel constant explicitly 32-bit.
        s = s + jnp.where(lane >= sh, t, jnp.zeros_like(t))
        sh *= 2
    rank = s - 1  # 0-based union rank of each element's value

    # dtype pinned: under x64, integer jnp.sum accumulates in int64 (NumPy
    # semantics) and Mosaic rejects 64-bit types in-kernel.
    common = jnp.sum(
        (eq_prev & live & (rank < sketch_size)).astype(jnp.int32),
        axis=1,
        keepdims=True,
        dtype=jnp.int32,
    )
    union = jnp.sum(
        is_start.astype(jnp.int32), axis=1, keepdims=True, dtype=jnp.int32
    )
    denom = jnp.minimum(union, sketch_size)
    cout_ref[:] = jnp.broadcast_to(common, (G, 128))
    dout_ref[:] = jnp.broadcast_to(denom, (G, 128))


@partial(jax.jit, static_argnames=("sketch_size", "interpret"))
def pairwise_common_denom_pallas(
    ref: jax.Array,  # u64[R, S] sorted, U64MAX-padded
    ref_len: jax.Array,  # i32[R]
    qry: jax.Array,  # u64[Q, S]
    qry_len: jax.Array,  # i32[Q]
    *,
    sketch_size: int,
    interpret: bool = False,
):
    """(common i32[R, Q], denom i32[R, Q]) — Pallas tile kernel.

    R and Q must be multiples of 8 (the tile loop in ops/compare.py pads).
    """
    R, S = ref.shape
    Q = qry.shape[0]
    S2 = 1 << (S - 1).bit_length()

    def planes(x, lens, reverse):
        idx = jnp.arange(S, dtype=jnp.int32)
        xm = jnp.where(idx[None, :] < lens[:, None], x, _U64MAX)
        if S2 != S:
            xm = jnp.concatenate(
                [xm, jnp.full((x.shape[0], S2 - S), _U64MAX)], axis=1
            )
        if reverse:
            xm = xm[:, ::-1]
        return (
            (xm & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (xm >> jnp.uint64(32)).astype(jnp.uint32),
        )

    al, ah = planes(ref, ref_len, False)
    bl, bh = planes(qry, qry_len, True)

    Rb, Qb = R // GR, Q // GQ
    G = GR * GQ
    # NB: index maps must not return a bare Python 0 — under x64 the
    # literal promotes to i64 and Mosaic's func.return legalization fails
    # with "failed to legalize 'func.return' (i32, i64)" for every
    # nontrivial grid (grid (1,1) folds the maps away, which is how the
    # bug hid from small-shape smoke tests).  Root-caused 2026-08-21 via
    # scripts/exp_scanfault*.py; keep constants explicitly int32.
    Z = np.int32(0)  # NumPy scalar: index maps must not capture tracers
    call = pl.pallas_call(
        partial(_compare_kernel, S2, sketch_size),
        grid=(Rb, Qb),
        out_shape=[
            jax.ShapeDtypeStruct((Rb * Qb * G, 128), jnp.int32),
            jax.ShapeDtypeStruct((Rb * Qb * G, 128), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((GR, S2), lambda i, j: (i, Z)),
            pl.BlockSpec((GR, S2), lambda i, j: (i, Z)),
            pl.BlockSpec((GQ, S2), lambda i, j: (j, Z)),
            pl.BlockSpec((GQ, S2), lambda i, j: (j, Z)),
        ],
        out_specs=[
            pl.BlockSpec((G, 128), lambda i, j, Qb=Qb: (i * Qb + j, Z)),
            pl.BlockSpec((G, 128), lambda i, j, Qb=Qb: (i * Qb + j, Z)),
        ],
        interpret=interpret,
    )
    c, dn = call(al, ah, bl, bh)
    # block (i, j) rows map to (ref i*8 + r, qry j*8 + q) at row r*8+q
    c = c[:, 0].reshape(Rb, Qb, GR, GQ).transpose(0, 2, 1, 3).reshape(R, Q)
    dn = dn[:, 0].reshape(Rb, Qb, GR, GQ).transpose(0, 2, 1, 3).reshape(R, Q)
    return c, dn
