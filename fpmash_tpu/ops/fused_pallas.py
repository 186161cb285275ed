"""Fused fingerprint kernel: Duval factorization + MurmurHash3 in one pass.

The production ``sketch -fp`` hot path is window -> CFL factor lengths ->
MurmurHash3_x64_128 of the u64 length vector.  The XLA pipeline runs these
as two kernels with an HBM round-trip for the ``[B, L]`` length matrix and
keeps all per-row automaton state in ``[B, 1]`` vectors — on the VPU's
8x128 registers that wastes 128x of each op's lanes.

This Pallas kernel fuses the whole pipe in VMEM with the batch TRANSPOSED:
strings live as ``[L, R]`` tiles (windows along lanes), so every per-row
state vector is ``[1, R]`` — full lane utilization — and character
selection is a masked reduction over the sublane axis.  Factor lengths are
never materialized: each EMIT step of the Duval automaton feeds its factor
length straight into the row's running MurmurHash3 state (64-bit arithmetic
hand-built from u32 pairs, since Mosaic has no native 64-bit vectors).

Character storage is PACKED into u32 words along the sublane axis — 4
bytes per word for arbitrary alphabets (``pack="byte4"``) or 16 bases per
word with order-preserving 2-bit codes A<C<G<T (``pack="dna16"``) — so the
per-step masked select reduces over 32 (or 8) sublane rows instead of 128.
The select is ~85% of the kernel's work at L=100, so packing is a 3-5x
end-to-end win; extraction is one per-lane variable shift on the selected
word.

Semantics: identical to ``cfl_lengths_onehot`` + ``murmur3_u64_batch``
(asserted in tests, CPU interpret mode and on-chip).  Reference chain:
lyn2vec factorizations.py:102 (Duval) -> fingerprint line ->
getHashFingerPrint (hash.cpp:45-73).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# windows per kernel launch (lanes).  FPMASH_ROW_BLOCK overrides — the
# test suite shrinks it so interpret-mode runs don't simulate 2048 lanes
# for a 30-row case (and so multi-chunk paths are actually exercised).
# Default 512 (was 2048): every window in a tile waits for the tile's
# slowest automaton, and narrower tiles have lower max step counts.
# Chip RB sweep (CFL fp Gbases/s, 2026-08-21): 128->7.6, 256->10.2,
# 512->13.1, 1024->12.4, 2048->11.6, 4096->10.1; ICFL_COMB 3.51 at 512
# vs 3.04 at 2048.  The classic kmer kernels (ops/kmers_pallas.py)
# keep their own 2048 default.
import os as _os

ROW_BLOCK = int(_os.environ.get("FPMASH_ROW_BLOCK", "512"))


def _grid_chunk_call(kernel, ins, in_rows, out_rows, interpret):
    """Run ``kernel`` over chunked slab inputs on a sequential pallas grid.

    ``ins`` are ``[C, rows_i, ROW_BLOCK]`` u32 slabs; returns
    ``[C, out_rows, ROW_BLOCK]`` u32.  One launch total — per-chunk
    lax.map dispatch overhead was measurable at production batch sizes.
    Index-map constants are np.int32 (bare Python 0 promotes to i64 under
    x64 and Mosaic fails to legalize the map for any nontrivial grid).
    """
    C = ins[0].shape[0]
    RB = ins[0].shape[2]
    Z = np.int32(0)
    call = pl.pallas_call(
        kernel,
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((C * out_rows, RB), jnp.uint32),
        in_specs=[
            pl.BlockSpec((r, RB), lambda i: (i, Z)) for r in in_rows
        ],
        out_specs=pl.BlockSpec((out_rows, RB), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(*[a.reshape(C * r, RB) for a, r in zip(ins, in_rows)])
    return out.reshape(C, out_rows, RB)

# MurmurHash3_x64_128 constants as (lo32, hi32)
_C1 = (0x114253D5, 0x87C37B91)
_C2 = (0x2745937F, 0x4CF5AD43)
_F1 = (0xED558CCD, 0xFF51AFD7)
_F2 = (0x1A85EC53, 0xC4CEB9FE)
_A1 = 0x52DCE729
_A2 = 0x38495AB5


def _u32(x):
    return jnp.uint32(x)


def _mul32_64(a, b_lo: int):
    """u32 vector a times u32 constant -> (lo32, hi32) of the 64-bit product."""
    b0 = b_lo & 0xFFFF
    b1 = (b_lo >> 16) & 0xFFFF
    a0 = a & _u32(0xFFFF)
    a1 = a >> _u32(16)
    ll = a0 * _u32(b0)
    lh = a0 * _u32(b1)
    hl = a1 * _u32(b0)
    hh = a1 * _u32(b1)
    mid = (ll >> _u32(16)) + (lh & _u32(0xFFFF)) + (hl & _u32(0xFFFF))
    lo = (ll & _u32(0xFFFF)) | (mid << _u32(16))
    hi = hh + (lh >> _u32(16)) + (hl >> _u32(16)) + (mid >> _u32(16))
    return lo, hi


def _mul64_const(xl, xh, c):
    """(xl, xh) * constant c -> low 64 bits as (lo, hi)."""
    c_lo, c_hi = c
    lo, hi = _mul32_64(xl, c_lo)
    hi = hi + xl * _u32(c_hi) + xh * _u32(c_lo)
    return lo, hi


def _add64(al, ah, bl, bh):
    rl = al + bl
    carry = (rl < al).astype(jnp.uint32)
    return rl, ah + bh + carry


def _rotl64(xl, xh, r: int):
    if r == 32:
        return xh, xl
    if r > 32:
        xl, xh = xh, xl
        r -= 32
    return (
        (xl << _u32(r)) | (xh >> _u32(32 - r)),
        (xh << _u32(r)) | (xl >> _u32(32 - r)),
    )


def _shr64_33(xl, xh):
    return xh >> _u32(1), jnp.zeros_like(xh)


def _fmix64(xl, xh):
    sl, sh = _shr64_33(xl, xh)
    xl, xh = xl ^ sl, xh ^ sh
    xl, xh = _mul64_const(xl, xh, _F1)
    sl, sh = _shr64_33(xl, xh)
    xl, xh = xl ^ sl, xh ^ sh
    xl, xh = _mul64_const(xl, xh, _F2)
    sl, sh = _shr64_33(xl, xh)
    return xl ^ sl, xh ^ sh


def _mix_k1_small(p):
    """mix_k1 for a value that fits in u32 (factor lengths): rotl(p*C1,31)*C2."""
    kl, kh = _mul32_64(p, _C1[0])
    kh = kh + p * _u32(_C1[1])
    kl, kh = _rotl64(kl, kh, 31)
    return _mul64_const(kl, kh, _C2)


def _mix_k2_small(p):
    kl, kh = _mul32_64(p, _C2[0])
    kh = kh + p * _u32(_C2[1])
    kl, kh = _rotl64(kl, kh, 33)
    return _mul64_const(kl, kh, _C1)


def _mul5_add(xl, xh, addend: int):
    """x*5 + addend  (h1 = h1*5 + 0x52dce729 steps); x*5 = x + (x << 2)."""
    sl = xl << _u32(2)
    sh = (xh << _u32(2)) | (xl >> _u32(30))
    xl, xh = _add64(xl, xh, sl, sh)
    return _add64(xl, xh, _u32(addend), jnp.zeros_like(xh))


def _block_update(h1l, h1h, h2l, h2h, k1, k2):
    """One 16-byte murmur block where k1/k2 are u32-sized values
    (factor lengths).  Mirrors MurmurHash3.cpp's body loop."""
    m1l, m1h = _mix_k1_small(k1)
    h1l, h1h = h1l ^ m1l, h1h ^ m1h
    h1l, h1h = _rotl64(h1l, h1h, 27)
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h1l, h1h = _mul5_add(h1l, h1h, _A1)

    m2l, m2h = _mix_k2_small(k2)
    h2l, h2h = h2l ^ m2l, h2h ^ m2h
    h2l, h2h = _rotl64(h2l, h2h, 31)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)
    h2l, h2h = _mul5_add(h2l, h2h, _A2)
    return h1l, h1h, h2l, h2h


def _fused_kernel(
    seed: int,
    max_steps: int,
    unroll: int,
    cpw_log2: int,
    bits_log2: int,
    sp_ref,
    n_ref,
    out_ref,
):
    W, R = sp_ref.shape
    sp = sp_ref[:]  # uint32 packed words: char c lives at bit (c % cpw) * bits
    n = n_ref[:].astype(jnp.int32)  # [1, R]
    wiota = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    zero = jnp.int32(0)  # typed: bare ints are weak i64 under x64 and
    # trip a Mosaic lowering recursion
    cmask = jnp.int32((1 << cpw_log2) - 1)
    vmask = jnp.uint32((1 << (1 << bits_log2)) - 1)

    # Mosaic cannot lower reductions over unsigned vectors; the one-hot
    # masked sum is bit-identical in i32 (wrapping add), so keep a signed
    # view of the packed words for the select reduction.
    sp_i = sp.astype(jnp.int32)
    izero = jnp.int32(0)

    def sel(col):  # col [1, R] char index -> code value [1, R] i32
        # dtype pinned: under x64 jnp.sum promotes to 64-bit, which Mosaic
        # cannot lower
        word = jnp.sum(
            jnp.where(wiota == (col >> cpw_log2), sp_i, izero),
            axis=0,
            keepdims=True,
            dtype=jnp.int32,
        ).astype(jnp.uint32)
        sh = ((col & cmask) << bits_log2).astype(jnp.uint32)
        return ((word >> sh) & vmask).astype(jnp.int32)

    zeros = jnp.zeros((1, R), jnp.int32)
    uzeros = jnp.zeros((1, R), jnp.uint32)
    fzeros = jnp.zeros((1, R), jnp.int32)  # flags as i32 0/1
    seedv = jnp.full((1, R), seed, jnp.uint32)

    one = jnp.int32(1)

    def substep(state):
        # flag carries (emitting/parity) ride as i32 0/1: Mosaic cannot
        # round-trip i1 vectors through the while carry (i8->i1 trunc)
        (i, j, k, emitting, parity, cnt, k1p, h1l, h1h, h2l, h2h) = state
        em_b = emitting > zero
        pa_b = parity > zero
        s_k = sel(k)
        s_j = sel(jnp.minimum(j, (W << cpw_log2) - 1))
        done = i >= n

        can_extend = (j < n) & (s_k <= s_j)
        k_scan = jnp.where(s_k < s_j, i, k + 1)

        p = j - k
        emit_now = i <= k
        fire = em_b & jnp.logical_not(done) & emit_now
        pu = p.astype(jnp.uint32)

        # feed the emitted factor length into the murmur chain
        n1l, n1h, n2l, n2h = _block_update(h1l, h1h, h2l, h2h, k1p, pu)
        complete = fire & pa_b
        h1l = jnp.where(complete, n1l, h1l)
        h1h = jnp.where(complete, n1h, h1h)
        h2l = jnp.where(complete, n2l, h2l)
        h2h = jnp.where(complete, n2h, h2h)
        k1p = jnp.where(fire & jnp.logical_not(pa_b), pu, k1p)
        parity = jnp.where(fire, one - parity, parity)
        cnt = cnt + fire.astype(jnp.int32)

        i_emit = jnp.where(emit_now, i + p, i)
        reset = jnp.logical_not(emit_now)
        j_emit = jnp.where(reset, i + 1, j)
        k_emit = jnp.where(reset, i, k)

        scanning = jnp.logical_not(em_b) & jnp.logical_not(done)
        i_next = jnp.where(scanning | done, i, i_emit)
        j_next = jnp.where(scanning, jnp.where(can_extend, j + 1, j), jnp.where(done, j, j_emit))
        k_next = jnp.where(scanning, jnp.where(can_extend, k_scan, k), jnp.where(done, k, k_emit))
        emitting_next = jnp.where(
            scanning,
            jnp.logical_not(can_extend).astype(jnp.int32),
            jnp.where(done, emitting, emit_now.astype(jnp.int32)),
        )
        return (i_next, j_next, k_next, emitting_next, parity, cnt, k1p, h1l, h1h, h2l, h2h)

    def cond(carry):
        t, state = carry
        # reduce-to-scalar must be 32-bit for Mosaic (bool any() widens to
        # f64 under x64 and fails to lower)
        alive = jnp.max(jnp.where(state[0] < n, jnp.int32(1), jnp.int32(0)))
        return (t < max_steps) & (alive > jnp.int32(0))

    def body(carry):
        t, state = carry
        for _ in range(unroll):
            state = substep(state)
        return (t + unroll, state)

    init = (zeros, zeros + 1, zeros, fzeros, fzeros, zeros, uzeros,
            seedv, uzeros, seedv, uzeros)
    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    (_, _, _, _, parity, cnt, k1p, h1l, h1h, h2l, h2h) = state

    # odd tail: one pending u64 mixed into h1 (murmur3_u64_batch semantics)
    pa_b = parity > jnp.int32(0)
    t1l, t1h = _mix_k1_small(k1p)
    h1l = jnp.where(pa_b, h1l ^ t1l, h1l)
    h1h = jnp.where(pa_b, h1h ^ t1h, h1h)

    # finalize with byte_len = 8 * count
    bl = (cnt.astype(jnp.uint32)) << _u32(3)
    h1l, h1h = h1l ^ bl, h1h
    h2l, h2h = h2l ^ bl, h2h
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)
    h1l, h1h = _fmix64(h1l, h1h)
    h2l, h2h = _fmix64(h2l, h2h)
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)

    out_ref[0:1, :] = h1l
    out_ref[1:2, :] = h1h
    out_ref[2:3, :] = h2l
    out_ref[3:4, :] = h2h
    out_ref[4:5, :] = cnt.astype(jnp.uint32)
    pad = jnp.zeros_like(h1l)
    out_ref[5:6, :] = pad
    out_ref[6:7, :] = pad
    out_ref[7:8, :] = pad


def _ctz32(word):
    """Bit index of the lowest set bit of a nonzero u32 vector (binary
    search on shifted masks; no gather, no float tricks)."""
    pos = jnp.zeros(word.shape, jnp.int32)
    t = word
    for sh, m in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        nolow = (t & _u32(m)) == _u32(0)
        pos = pos + jnp.where(nolow, jnp.int32(sh), jnp.int32(0))
        t = jnp.where(nolow, t >> _u32(sh), t)
    return pos


GROUPS = 8  # windows stacked on the sublane axis in the split kernel


def _split_kernel(
    seed: int,
    max_steps: int,
    unroll: int,
    cpw_log2: int,
    bits_log2: int,
    W: int,
    sp_ref,
    n_ref,
    out_ref,
):
    """Two-phase, sublane-grouped variant of :func:`_fused_kernel`.

    Layout: GROUPS=8 windows ride the SUBLANE axis — every per-window
    state vector is ``[8, R]``, so elementwise state math runs at full
    (8x128) vreg occupancy instead of the 1/8 occupancy of a ``[1, R]``
    layout.  The packed words are interleaved as row ``w*8 + s`` = word w
    of window (s, r); character select is a W-iteration loop of
    fully-occupied compare/select/accumulate over vreg-aligned 8-row
    slabs — no cross-sublane reduction, no gathers.

    Phase 1 runs the Duval automaton but records each factor START as one
    bit in a ``ceil(L/32) x u32`` per-lane bitmask instead of paying the
    full 64-bit MurmurHash3 block update on every automaton step.  Phase 2
    walks the set bits in ascending order — max(factor count) iterations,
    typically ~L/5 for DNA — and feeds the successive factor lengths into
    the murmur chain.  Semantics identical to the inline kernel.
    """
    G = GROUPS
    WG, R = sp_ref.shape
    assert WG == W * G
    M = -(-(W << cpw_log2) // 32)  # boundary-bitmask words per window
    n = n_ref[:].astype(jnp.int32)  # [G, R]
    zero = jnp.int32(0)
    cmask = jnp.int32((1 << cpw_log2) - 1)
    vmask = jnp.uint32((1 << (1 << bits_log2)) - 1)

    # Mosaic cannot lower reductions/selects over unsigned cleanly in all
    # versions; accumulate the one-hot select in i32 (bit-identical).
    sp_i = sp_ref[:].astype(jnp.int32)
    izero = jnp.int32(0)

    def sel(col):  # col [G, R] char index -> code value [G, R] i32
        # binary select tree over the W word slabs: W-1 selects + one
        # bit-test per level, vs the linear one-hot sum's 3 ops per word
        # (~40% fewer ops in the per-substep hot path).  Predicates come
        # from integer compares (i1 results are fine; i1 OPERANDS are the
        # Mosaic trap).
        colw = col >> cpw_log2
        nodes = [sp_i[w * G : (w + 1) * G] for w in range(W)]
        while len(nodes) & (len(nodes) - 1):
            nodes.append(nodes[-1])  # pad to a power of two (dead branch)
        level = 0
        while len(nodes) > 1:
            pred = ((colw >> jnp.int32(level)) & jnp.int32(1)) != jnp.int32(0)
            nodes = [
                jnp.where(pred, nodes[2 * i + 1], nodes[2 * i])
                for i in range(len(nodes) // 2)
            ]
            level += 1
        word = nodes[0]
        sh = ((col & cmask) << bits_log2).astype(jnp.uint32)
        return ((word.astype(jnp.uint32) >> sh) & vmask).astype(jnp.int32)

    zeros = jnp.zeros((G, R), jnp.int32)
    uzeros = jnp.zeros((G, R), jnp.uint32)
    fzeros = jnp.zeros((G, R), jnp.int32)
    seedv = jnp.full((G, R), seed, jnp.uint32)
    one = jnp.int32(1)

    # ---- phase 1: Duval automaton, boundary bits only ----
    def substep(state):
        (i, j, k, emitting, cnt, ms) = state
        em_b = emitting > zero
        s_k = sel(k)
        s_j = sel(jnp.minimum(j, (W << cpw_log2) - 1))
        done = i >= n

        can_extend = (j < n) & (s_k <= s_j)
        k_scan = jnp.where(s_k < s_j, i, k + 1)

        p = j - k
        emit_now = i <= k
        fire = em_b & jnp.logical_not(done) & emit_now

        # record factor start bit i
        bitv = _u32(1) << (i & jnp.int32(31)).astype(jnp.uint32)
        iw = i >> jnp.int32(5)
        ms = tuple(
            jnp.where(fire & (iw == jnp.int32(w)), ms[w] | bitv, ms[w])
            for w in range(M)
        )
        cnt = cnt + fire.astype(jnp.int32)

        i_emit = jnp.where(emit_now, i + p, i)
        reset = jnp.logical_not(emit_now)
        j_emit = jnp.where(reset, i + 1, j)
        k_emit = jnp.where(reset, i, k)

        scanning = jnp.logical_not(em_b) & jnp.logical_not(done)
        i_next = jnp.where(scanning | done, i, i_emit)
        j_next = jnp.where(scanning, jnp.where(can_extend, j + 1, j), jnp.where(done, j, j_emit))
        k_next = jnp.where(scanning, jnp.where(can_extend, k_scan, k), jnp.where(done, k, k_emit))
        emitting_next = jnp.where(
            scanning,
            jnp.logical_not(can_extend).astype(jnp.int32),
            jnp.where(done, emitting, emit_now.astype(jnp.int32)),
        )
        return (i_next, j_next, k_next, emitting_next, cnt, ms)

    def cond1(carry):
        t, state = carry
        alive = jnp.max(jnp.where(state[0] < n, jnp.int32(1), jnp.int32(0)))
        return (t < max_steps) & (alive > jnp.int32(0))

    def body1(carry):
        t, state = carry
        for _ in range(unroll):
            state = substep(state)
        return (t + unroll, state)

    init1 = (zeros, zeros + 1, zeros, fzeros, zeros, (uzeros,) * M)
    _, st = jax.lax.while_loop(cond1, body1, (jnp.int32(0), init1))
    (_, _, _, _, cnt, ms) = st

    # ---- phase 2: walk boundary bits, feed lengths into murmur ----
    ms = (ms[0] & _u32(0xFFFFFFFE),) + ms[1:]  # first factor starts at 0

    def cond2(carry):
        t, fidx, *_ = carry
        alive = jnp.max(jnp.where(fidx < cnt, jnp.int32(1), jnp.int32(0)))
        return (t < max_steps) & (alive > jnp.int32(0))

    def body2(carry):
        (t, fidx, prev, parity, k1p, h1l, h1h, h2l, h2h, ms) = carry
        active = fidx < cnt
        nzs = [m != _u32(0) for m in ms]
        anyb = nzs[0]
        for w in range(1, M):
            anyb = anyb | nzs[w]
        # priority select of the lowest nonzero mask word + its bit base
        word = ms[M - 1]
        base = jnp.full((G, R), (M - 1) * 32, jnp.int32)
        for w in range(M - 2, -1, -1):
            word = jnp.where(nzs[w], ms[w], word)
            base = jnp.where(nzs[w], jnp.int32(w * 32), base)
        pos = base + _ctz32(word)
        nxt = jnp.where(anyb, pos, n)  # next factor start, or end of row
        pu = (nxt - prev).astype(jnp.uint32)

        n1l, n1h, n2l, n2h = _block_update(h1l, h1h, h2l, h2h, k1p, pu)
        pa_b = parity > zero
        complete = active & pa_b
        h1l = jnp.where(complete, n1l, h1l)
        h1h = jnp.where(complete, n1h, h1h)
        h2l = jnp.where(complete, n2l, h2l)
        h2h = jnp.where(complete, n2h, h2h)
        k1p = jnp.where(active & jnp.logical_not(pa_b), pu, k1p)
        parity = jnp.where(active, one - parity, parity)

        cleared = word & (word - _u32(1))
        clr = active & anyb
        # clear the bit in the word that was selected (first nonzero)
        first_nz = nzs[0]
        new_ms = [jnp.where(clr & first_nz, cleared, ms[0])]
        none_before = jnp.logical_not(nzs[0])
        for w in range(1, M):
            new_ms.append(jnp.where(clr & none_before & nzs[w], cleared, ms[w]))
            none_before = none_before & jnp.logical_not(nzs[w])
        ms = tuple(new_ms)
        prev = jnp.where(clr, nxt, prev)
        fidx = fidx + active.astype(jnp.int32)
        return (t + 1, fidx, prev, parity, k1p, h1l, h1h, h2l, h2h, ms)

    init2 = (jnp.int32(0), zeros, zeros, fzeros, uzeros, seedv, uzeros, seedv, uzeros,
             ms)
    st2 = jax.lax.while_loop(cond2, body2, init2)
    (_, _, _, parity, k1p, h1l, h1h, h2l, h2h, _) = st2

    # odd tail + finalize (murmur3_u64_batch semantics)
    pa_b = parity > jnp.int32(0)
    t1l, t1h = _mix_k1_small(k1p)
    h1l = jnp.where(pa_b, h1l ^ t1l, h1l)
    h1h = jnp.where(pa_b, h1h ^ t1h, h1h)

    bl = (cnt.astype(jnp.uint32)) << _u32(3)
    h1l, h1h = h1l ^ bl, h1h
    h2l, h2h = h2l ^ bl, h2h
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)
    h1l, h1h = _fmix64(h1l, h1h)
    h2l, h2h = _fmix64(h2l, h2h)
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)

    out_ref[0 * G : 1 * G, :] = h1l
    out_ref[1 * G : 2 * G, :] = h1h
    out_ref[2 * G : 3 * G, :] = h2l
    out_ref[3 * G : 4 * G, :] = h2h
    out_ref[4 * G : 5 * G, :] = cnt.astype(jnp.uint32)


@partial(jax.jit, static_argnames=("seed", "interpret", "pack", "variant"))
def fingerprint_hashes_fused(
    batch: jax.Array,
    lengths: jax.Array,
    seed: int = 42,
    interpret: bool = False,
    pack: str = "byte4",
    variant: str = "split",
):
    """(h1 u64[B], h2 u64[B], fac_count i32[B]): MurmurHash3_x64_128 of each
    row's CFL factor-length vector (and the factor count) — the full
    ``sketch -fp`` per-window computation in one kernel.

    ``pack="byte4"`` handles any byte alphabet; ``pack="dna16"`` requires
    the batch to contain only A/C/G/T (plus padding) and packs 16
    order-preserving 2-bit codes per word for a ~2x faster select.

    ``variant="split"`` (default) records factor boundaries as bits
    (``ceil(L/32)`` mask words per window) during the Duval loop and runs
    the murmur chain afterwards over max(factor count) iterations;
    ``variant="inline"`` hashes inside the automaton loop.  Split avoids
    the ~100-op 64-bit block update on every automaton step, so it is the
    faster kernel whenever factors are longer than ~1 char on average.
    Callers gate L by packing so the word slab + its i32 copy fit VMEM
    (models/sketch.py: dna16 <= 512, byte4 <= 320 at ROW_BLOCK=2048).
    """
    B, L = batch.shape
    if variant not in ("split", "inline"):
        raise ValueError(f"unknown variant {variant!r}")
    if pack == "dna16":
        cpw_log2, bits_log2 = 4, 1
    elif pack == "byte4":
        cpw_log2, bits_log2 = 2, 3
    else:
        raise ValueError(f"unknown pack mode {pack!r}")
    cpw = 1 << cpw_log2
    W = -(-L // cpw)
    if variant == "inline":
        W = ((W + 7) // 8) * 8  # u32 sublane tile multiple

    # mask beyond-length chars to 0, then pack cpw chars per u32 word
    codes = batch.astype(jnp.uint8)
    if pack == "dna16":
        # order-preserving 2-bit codes: A=0 C=1 G=2 T=3  (A<C<G<T as bytes)
        codes = (
            jnp.where(codes == ord("C"), jnp.uint8(1), jnp.uint8(0))
            | jnp.where(codes == ord("G"), jnp.uint8(2), jnp.uint8(0))
            | jnp.where(codes == ord("T"), jnp.uint8(3), jnp.uint8(0))
        )
    codes = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        < lengths.astype(jnp.int32)[:, None],
        codes,
        jnp.uint8(0),
    ).astype(jnp.uint32)
    padded = jnp.zeros((B, W * cpw), jnp.uint32).at[:, :L].set(codes)
    shifts = (jnp.arange(cpw, dtype=jnp.uint32) << bits_log2)[None, None, :]
    words = jnp.sum(
        padded.reshape(B, W, cpw) << shifts, axis=-1, dtype=jnp.uint32
    )  # [B, W]
    return _fused_from_words(
        words, lengths, L=L, cpw_log2=cpw_log2, bits_log2=bits_log2,
        seed=seed, interpret=interpret, variant=variant,
    )


@partial(jax.jit, static_argnames=("L", "seed", "interpret", "variant", "full64"))
def fingerprint_hashes_fused_words(
    words: jax.Array,  # u32[B, ceil(L/16)] dna16-packed window words
    lengths: jax.Array,
    *,
    L: int,
    seed: int = 42,
    interpret: bool = False,
    variant: str = "split",
    full64: bool = True,
):
    """Pre-packed dna16 entry: identical to :func:`fingerprint_hashes_fused`
    with ``pack="dna16"`` fed u8 windows, but takes the packed words
    directly.  Used by the device-side window builder (models/sketch.py):
    shift windows of one read overlap ~100x, so shipping the read once
    and gathering packed words on device cuts host->device transfer by
    ~350x vs uploading u8 window rows."""
    if variant != "split":
        raise ValueError("words entry supports the split variant only")
    return _fused_from_words(
        words, lengths, L=L, cpw_log2=4, bits_log2=1,
        seed=seed, interpret=interpret, variant=variant, full64=full64,
    )


@partial(jax.jit, static_argnames=("nwords", "L"))
def dna16_window_words(
    flat_codes: jax.Array,  # u8[N] 2-bit codes, doubled reads concatenated
    starts: jax.Array,  # i32[B] window start index into flat_codes
    *,
    nwords: int,
    L: int,
):
    """Build dna16-packed window words ON DEVICE from a flat code stream.

    Shift windows overlap ~L x, so the host ships each read once (2-bit
    codes of ``seq + seq[:L-1]``) instead of u8 window rows — ~350x less
    host->device traffic for L=100.  A doubling ladder packs
    ``LE16[p] = sum_m code[p+m] << 2m`` and ``words[b, w] =
    LE16[starts[b] + 16 w]`` (one [B] gather per word), bit-identical to
    :func:`fingerprint_hashes_fused`'s packing of the equivalent u8 rows
    (the final word is masked to the in-window chars; callers pad
    ``flat_codes`` so every gather lands in range).
    """
    N = flat_codes.shape[0]
    le = jnp.concatenate(
        [flat_codes.astype(jnp.uint32), jnp.zeros((16 * nwords + 16,), jnp.uint32)]
    )
    m = 1
    while m < 16:
        shifted = jnp.concatenate([le[m:], jnp.zeros((m,), jnp.uint32)])
        le = le | (shifted << jnp.uint32(2 * m))
        m *= 2
    s = starts.astype(jnp.int32)
    cols = [le[s + jnp.int32(16 * w)] for w in range(nwords)]
    rem = L - 16 * (nwords - 1)
    if rem < 16:
        cols[-1] = cols[-1] & jnp.uint32((1 << (2 * rem)) - 1)
    return jnp.stack(cols, axis=1)


def _fused_from_words(
    words, lengths, *, L, cpw_log2, bits_log2, seed, interpret, variant,
    full64=True,
):
    B = words.shape[0]
    cpw = 1 << cpw_log2
    W = words.shape[1]

    max_steps = 3 * L + 2
    unroll = 8
    max_steps = ((max_steps + unroll - 1) // unroll) * unroll

    # Row chunks ride a SEQUENTIAL pallas grid (one launch for the whole
    # batch).  Round 2 blamed a "failed to legalize 'func.return'" Mosaic
    # error on grid+while_loop and fell back to gridless lax.map chunking
    # (per-chunk launch overhead); the actual culprit was the bare-0
    # index-map i64 promotion under x64, root-caused 2026-08-21 — grids
    # with np.int32 index-map constants compile and validate on chip.
    if variant == "split":
        # sublane-grouped layout: GROUPS windows per lane column; slab row
        # w*G+s holds word w of window (s, r); window index = c*G*R + s*R + r
        G = GROUPS
        per = G * ROW_BLOCK
        Bp = ((B + per - 1) // per) * per
        wordsp = jnp.zeros((Bp, W), jnp.uint32).at[:B].set(words)
        nflat = jnp.zeros((Bp,), jnp.int32).at[:B].set(lengths.astype(jnp.int32))
        chunks = Bp // per
        wc = (
            wordsp.reshape(chunks, G, ROW_BLOCK, W)
            .transpose(0, 3, 1, 2)
            .reshape(chunks, W * G, ROW_BLOCK)
        )
        nc = nflat.reshape(chunks, G, ROW_BLOCK)
        out = _grid_chunk_call(
            partial(_split_kernel, seed, max_steps, unroll, cpw_log2, bits_log2, W),
            (wc, nc),
            (W * G, G),
            5 * G,
            interpret,
        )  # [C, 5G, R]
        comp = [out[:, i * G : (i + 1) * G, :].reshape(Bp) for i in range(5)]
        if not full64:
            # fp-mode hashes are 32-bit (alphabet^k < 2^32): return the
            # low plane as u32 — halves the device->host result transfer
            return comp[0][:B], None, comp[4][:B].astype(jnp.int32)
        h1 = comp[0][:B].astype(jnp.uint64) | (
            comp[1][:B].astype(jnp.uint64) << jnp.uint64(32)
        )
        h2 = comp[2][:B].astype(jnp.uint64) | (
            comp[3][:B].astype(jnp.uint64) << jnp.uint64(32)
        )
        return h1, h2, comp[4][:B].astype(jnp.int32)

    Bp = ((B + ROW_BLOCK - 1) // ROW_BLOCK) * ROW_BLOCK
    n = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(lengths.astype(jnp.int32))
    sT = jnp.zeros((W, Bp), jnp.uint32).at[:, :B].set(words.T)
    chunks = Bp // ROW_BLOCK
    sT_c = sT.reshape(W, chunks, ROW_BLOCK).transpose(1, 0, 2)  # [C, W, R]
    n_c = n.reshape(1, chunks, ROW_BLOCK).transpose(1, 0, 2)  # [C, 1, R]
    out = _grid_chunk_call(
        partial(_fused_kernel, seed, max_steps, unroll, cpw_log2, bits_log2),
        (sT_c, n_c),
        (W, 1),
        8,
        interpret,
    )
    out = out.transpose(1, 0, 2).reshape(8, Bp)
    h1 = out[0, :B].astype(jnp.uint64) | (out[1, :B].astype(jnp.uint64) << jnp.uint64(32))
    h2 = out[2, :B].astype(jnp.uint64) | (out[3, :B].astype(jnp.uint64) << jnp.uint64(32))
    fac_count = out[4, :B].astype(jnp.int32)
    return h1, h2, fac_count
