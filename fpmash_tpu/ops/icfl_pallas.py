"""Pallas ICFL kernels: the inverse-Lyndon automaton in VMEM.

The XLA while_loop version (ops/icfl.py) pays HBM round-trips for its
``st[]`` border array and level records on every automaton step.  Here the
whole automaton runs inside one Pallas kernel with the split-CFL kernel's
layout (ops/fused_pallas.py): GROUPS=8 windows ride the sublane axis, all
per-window state is ``[8, R]`` at full vreg occupancy, and characters are
packed 16-per-word (dna16) or 4-per-word (byte4).

Two storage tricks make the kernel state-minimal:

* **Candidate boundaries as 4 u32 registers.**  Each committed level's
  boundary position (< L <= 128) sets one bit in ``m0..m3`` — the same
  bitmask trick as the split CFL kernel — so there is NO level array and
  NO level-capacity limit.
* **``last`` values live in dead ``st[]`` slots.**  ``st`` is indexed by
  *absolute* position; once a level commits and ``base`` advances, every
  slot below the new base is dead (later scans write at ``base+j, j>=1``
  and later chains read above the new base).  The commit stores its
  bounded-right-extension bound ``last`` into ``st[old base]`` — exactly
  the slot the backward merge reads as ``st[previous boundary]``.

The merge (ICFL_recursive's insert-or-prepend fold) then walks the
candidate bits from highest to lowest: ``plen`` is the gap to the next
lower bit, ``last`` comes from ``st[prev]``, and a level survives as a
real factor boundary iff the running first-factor length exceeds it.

A companion kernel hashes boundary words directly (walk bits ascending,
feed successive factor lengths into the u32-pair MurmurHash3 chain), so
the ICFL / ICFL_COMB fingerprint pipeline never materializes factor
lengths at all:

    fwd words -> [rc words -> flip128] -> OR -> murmur  (all on device)

Parity targets: scalar ICFL model + murmur3_u64_batch semantics
(asserted in tests, interpret mode and on-chip); reference chain
factorizations.py:143-248 / factorizations_comb.py:193 -> getHashFingerPrint
(hash.cpp:45-73).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fpmash_tpu.ops.fused_pallas import (
    GROUPS,
    ROW_BLOCK,
    _grid_chunk_call,
    _add64,
    _block_update,
    _ctz32,
    _fmix64,
    _mix_k1_small,
    _u32,
)


def _fls32(word):
    """Bit index of the HIGHEST set bit of a nonzero u32 vector."""
    pos = jnp.zeros(word.shape, jnp.int32)
    t = word
    for sh in (16, 8, 4, 2, 1):
        big = (t >> _u32(sh)) != _u32(0)
        pos = pos + jnp.where(big, jnp.int32(sh), jnp.int32(0))
        t = jnp.where(big, t >> _u32(sh), t)
    return pos


def _pick_desc(m0, m1, m2, m3):
    """(word, base, any) of the highest-priority nonzero mask word, m3 first."""
    zero = jnp.int32(0)
    nz0 = m0 != _u32(0)
    nz1 = m1 != _u32(0)
    nz2 = m2 != _u32(0)
    nz3 = m3 != _u32(0)
    anyb = nz0 | nz1 | nz2 | nz3
    word = jnp.where(nz3, m3, jnp.where(nz2, m2, jnp.where(nz1, m1, m0)))
    base = jnp.where(
        nz3, jnp.int32(96), jnp.where(nz2, jnp.int32(64), jnp.where(nz1, jnp.int32(32), zero))
    )
    return word, base, anyb


def _icfl_words_kernel(
    max_steps: int,
    unroll: int,
    cpw_log2: int,
    bits_log2: int,
    W: int,
    SW: int,
    L: int,
    sp_ref,
    n_ref,
    out_ref,
):
    G = GROUPS
    R = sp_ref.shape[1]
    n = n_ref[:].astype(jnp.int32)  # [G, R]
    zero = jnp.int32(0)
    one = jnp.int32(1)
    cmask = jnp.int32((1 << cpw_log2) - 1)
    vmask = jnp.uint32((1 << (1 << bits_log2)) - 1)

    sp_i = sp_ref[:].astype(jnp.int32)
    izero = jnp.int32(0)

    def _tree_select(nodes, idx):
        # binary select tree: len(nodes)-1 selects + one bit-test per
        # level vs the linear one-hot sum's 3 ops/word.  i32 operands
        # only (i1 OPERANDS are a Mosaic trap); i1 predicates are fine.
        nodes = list(nodes)
        while len(nodes) & (len(nodes) - 1):
            nodes.append(nodes[-1])  # dead branch padding
        level = 0
        while len(nodes) > 1:
            pred = ((idx >> jnp.int32(level)) & jnp.int32(1)) != jnp.int32(0)
            nodes = [
                jnp.where(pred, nodes[2 * i + 1], nodes[2 * i])
                for i in range(len(nodes) // 2)
            ]
            level += 1
        return nodes[0]

    def sel(col):  # [G, R] char index -> code [G, R] i32
        word = _tree_select(
            [sp_i[w * G : (w + 1) * G] for w in range(W)], col >> cpw_log2
        )
        sh = ((col & cmask) << bits_log2).astype(jnp.uint32)
        return ((word.astype(jnp.uint32) >> sh) & vmask).astype(jnp.int32)

    # st[]: 4 x u8 entries per u32 word, SW static words as carry values
    def st_read(st, pos):
        word = _tree_select(
            [st[w].astype(jnp.int32) for w in range(SW)], pos >> jnp.int32(2)
        )
        sh = ((pos & jnp.int32(3)) << jnp.int32(3)).astype(jnp.uint32)
        return ((word.astype(jnp.uint32) >> sh) & _u32(0xFF)).astype(jnp.int32)

    def st_write(st, pos, val, enable):
        posw = pos >> jnp.int32(2)
        sh = ((pos & jnp.int32(3)) << jnp.int32(3)).astype(jnp.uint32)
        valv = val.astype(jnp.uint32) << sh
        keep = ~(_u32(0xFF) << sh)
        out = []
        for w in range(SW):
            tgt = enable & (posw == jnp.int32(w))
            out.append(jnp.where(tgt, (st[w] & keep) | valv, st[w]))
        return tuple(out)

    zeros = jnp.zeros((G, R), jnp.int32)
    uzeros = jnp.zeros((G, R), jnp.uint32)

    DONE = jnp.int32(2)

    def substep(state):
        (phase, base, i, j, jx, c, b, best, m0, m1, m2, m3, st) = state
        scanning = phase == zero
        chaining = phase == one

        seg_n = n - base
        s_i = sel(base + i)
        s_j = sel(jnp.minimum(base + j, jnp.int32(L - 1)))

        # ---- SCAN ----
        seg_end = j >= seg_n
        ascent = scanning & jnp.logical_not(seg_end) & (s_j > s_i)
        i_scan = jnp.where(s_j == s_i, i + one, zero)
        finish = scanning & seg_end  # row done (single whole-row segment)

        # ---- CHAIN ----
        commit = chaining & (b <= zero)
        walk = chaining & (b > zero)
        b2 = st_read(st, base + b)
        s_b2 = sel(base + b2)
        best_n = jnp.where(
            ascent, i, jnp.where(walk & (s_b2 < c), b2, best)
        )

        # one masked st pass serves both writers (scan: st[base+j]=i;
        # commit: park `last` in the dead slot st[base]=best)
        wpos = jnp.where(commit, base, base + j)
        wval = jnp.where(commit, best, i)
        wen = (scanning & jnp.logical_not(seg_end)) | commit
        st = st_write(st, wpos, wval, wen)

        # commit: candidate boundary bit at base + p_len
        p_len = jx - best
        bpos = base + p_len
        bitv = _u32(1) << (bpos & jnp.int32(31)).astype(jnp.uint32)
        bw = bpos >> jnp.int32(5)
        m0 = jnp.where(commit & (bw == zero), m0 | bitv, m0)
        m1 = jnp.where(commit & (bw == one), m1 | bitv, m1)
        m2 = jnp.where(commit & (bw == jnp.int32(2)), m2 | bitv, m2)
        m3 = jnp.where(commit & (bw == jnp.int32(3)), m3 | bitv, m3)

        # ---- next state ----
        phase_n = jnp.where(
            finish, DONE, jnp.where(commit, zero, jnp.where(ascent, one, phase))
        )
        base_n = jnp.where(commit, bpos, base)
        i_n = jnp.where(commit, zero, jnp.where(scanning & jnp.logical_not(seg_end) & jnp.logical_not(ascent), i_scan, i))
        j_n = jnp.where(commit, one, jnp.where(scanning & jnp.logical_not(seg_end) & jnp.logical_not(ascent), j + one, j))
        jx_n = jnp.where(ascent, j, jx)
        c_n = jnp.where(ascent, s_j, c)
        b_n = jnp.where(ascent, i, jnp.where(walk, b2, b))
        return (phase_n, base_n, i_n, j_n, jx_n, c_n, b_n, best_n, m0, m1, m2, m3, st)

    def cond(carry):
        t, state = carry
        alive = jnp.max(jnp.where(state[0] != DONE, jnp.int32(1), jnp.int32(0)))
        return (t < max_steps) & (alive > jnp.int32(0))

    def body(carry):
        t, state = carry
        for _ in range(unroll):
            state = substep(state)
        return (t + unroll, state)

    st0 = tuple(uzeros for _ in range(SW))
    init = (
        jnp.where(n > zero, zero, DONE),  # phase
        zeros,  # base
        zeros,  # i
        zeros + one,  # j
        zeros,  # jx
        zeros,  # c
        zeros,  # b
        zeros,  # best
        uzeros, uzeros, uzeros, uzeros,  # m0..m3
        st0,
    )
    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    (phase, _, _, _, _, _, _, _, m0, m1, m2, m3, st) = state
    ok = (phase == DONE).astype(jnp.uint32)

    # ---- merge: walk candidate bits highest -> lowest ----
    word, wbase, anyb = _pick_desc(m0, m1, m2, m3)
    rem_start = jnp.where(anyb, wbase + _fls32(word), zero)
    cur_len = n - rem_start

    def mcond(carry):
        t, _, _, m0, m1, m2, m3, _, _, _, _ = carry
        live = (m0 != _u32(0)) | (m1 != _u32(0)) | (m2 != _u32(0)) | (m3 != _u32(0))
        alive = jnp.max(jnp.where(live, jnp.int32(1), jnp.int32(0)))
        return (t < jnp.int32(L + 2)) & (alive > jnp.int32(0))

    def mbody(carry):
        (t, cur_len, _unused, m0, m1, m2, m3, o0, o1, o2, o3) = carry
        word, wbase, anyb = _pick_desc(m0, m1, m2, m3)
        fpos = _fls32(jnp.where(anyb, word, _u32(1)))
        bpos = wbase + fpos
        bitv = _u32(1) << (bpos & jnp.int32(31)).astype(jnp.uint32)
        bw = bpos >> jnp.int32(5)
        zerou = _u32(0)
        c0 = jnp.where(anyb & (bw == jnp.int32(0)), m0 & ~bitv, m0)
        c1 = jnp.where(anyb & (bw == jnp.int32(1)), m1 & ~bitv, m1)
        c2 = jnp.where(anyb & (bw == jnp.int32(2)), m2 & ~bitv, m2)
        c3 = jnp.where(anyb & (bw == jnp.int32(3)), m3 & ~bitv, m3)
        # previous boundary (or 0) after clearing the current bit
        pword, pbase, panyb = _pick_desc(c0, c1, c2, c3)
        prev = jnp.where(panyb, pbase + _fls32(jnp.where(panyb, pword, _u32(1))), jnp.int32(0))
        plen = bpos - prev
        last = st_read(st, prev)
        insert = anyb & (cur_len > last)
        o0 = jnp.where(insert & (bw == jnp.int32(0)), o0 | bitv, o0)
        o1 = jnp.where(insert & (bw == jnp.int32(1)), o1 | bitv, o1)
        o2 = jnp.where(insert & (bw == jnp.int32(2)), o2 | bitv, o2)
        o3 = jnp.where(insert & (bw == jnp.int32(3)), o3 | bitv, o3)
        cur_len = jnp.where(anyb, jnp.where(insert, plen, plen + cur_len), cur_len)
        return (t + jnp.int32(1), cur_len, _unused, c0, c1, c2, c3, o0, o1, o2, o3)

    minit = (jnp.int32(0), cur_len, zeros, m0, m1, m2, m3, uzeros, uzeros, uzeros, uzeros)
    mstate = jax.lax.while_loop(mcond, mbody, minit)
    (_, _, _, _, _, _, _, o0, o1, o2, o3) = mstate

    # the factorization always starts at 0
    o0 = o0 | jnp.where(n > zero, _u32(1), _u32(0))

    G = GROUPS
    out_ref[0 * G : 1 * G, :] = o0
    out_ref[1 * G : 2 * G, :] = o1
    out_ref[2 * G : 3 * G, :] = o2
    out_ref[3 * G : 4 * G, :] = o3
    out_ref[4 * G : 5 * G, :] = ok


def _hash_words_kernel(seed: int, L: int, w_ref, n_ref, out_ref):
    """Boundary words -> MurmurHash3_x64_128 of the factor-length vector.

    Walks the factor-start bits ascending; each gap feeds one u64 into the
    murmur chain (murmur3_u64_batch semantics: u64 pairs per block, odd
    tail, byte_len = 8 * count)."""
    G = GROUPS
    R = w_ref.shape[1]
    n = n_ref[:].astype(jnp.int32)  # [G, R]
    zero = jnp.int32(0)
    one = jnp.int32(1)

    m0 = w_ref[0 * G : 1 * G, :] & _u32(0xFFFFFFFE)  # bit0 = start, not a gap
    m1 = w_ref[1 * G : 2 * G, :]
    m2 = w_ref[2 * G : 3 * G, :]
    m3 = w_ref[3 * G : 4 * G, :]

    zeros = jnp.zeros((G, R), jnp.int32)
    uzeros = jnp.zeros((G, R), jnp.uint32)
    seedv = jnp.full((G, R), seed, jnp.uint32)

    def cond(carry):
        t, done = carry[0], carry[1]
        alive = jnp.max(jnp.where(done == zero, jnp.int32(1), jnp.int32(0)))
        return (t < jnp.int32(L + 2)) & (alive > jnp.int32(0))

    def body(carry):
        (t, done, prev, parity, cnt, k1p, h1l, h1h, h2l, h2h, m0, m1, m2, m3) = carry
        nz0 = m0 != _u32(0)
        nz1 = m1 != _u32(0)
        nz2 = m2 != _u32(0)
        nz3 = m3 != _u32(0)
        anyb = nz0 | nz1 | nz2 | nz3
        word = jnp.where(nz0, m0, jnp.where(nz1, m1, jnp.where(nz2, m2, m3)))
        base = jnp.where(
            nz0, zero,
            jnp.where(nz1, jnp.int32(32), jnp.where(nz2, jnp.int32(64), jnp.int32(96))),
        )
        pos = base + _ctz32(jnp.where(anyb, word, _u32(1)))
        fire = (done == zero) & (n > zero)
        nxt = jnp.where(anyb, pos, n)
        pu = (nxt - prev).astype(jnp.uint32)

        n1l, n1h, n2l, n2h = _block_update(h1l, h1h, h2l, h2h, k1p, pu)
        pa_b = parity > zero
        complete = fire & pa_b
        h1l = jnp.where(complete, n1l, h1l)
        h1h = jnp.where(complete, n1h, h1h)
        h2l = jnp.where(complete, n2l, h2l)
        h2h = jnp.where(complete, n2h, h2h)
        k1p = jnp.where(fire & jnp.logical_not(pa_b), pu, k1p)
        parity = jnp.where(fire, one - parity, parity)
        cnt = cnt + fire.astype(jnp.int32)

        cleared = word & (word - _u32(1))
        clr = fire & anyb
        m0 = jnp.where(clr & nz0, cleared, m0)
        m1 = jnp.where(clr & jnp.logical_not(nz0) & nz1, cleared, m1)
        m2 = jnp.where(clr & jnp.logical_not(nz0) & jnp.logical_not(nz1) & nz2, cleared, m2)
        m3 = jnp.where(
            clr & jnp.logical_not(nz0) & jnp.logical_not(nz1) & jnp.logical_not(nz2),
            cleared, m3,
        )
        prev = jnp.where(clr, nxt, prev)
        done = jnp.where(fire & jnp.logical_not(anyb), one, done)
        return (t + one, done, prev, parity, cnt, k1p, h1l, h1h, h2l, h2h, m0, m1, m2, m3)

    init = (jnp.int32(0), jnp.where(n > zero, zero, one), zeros, zeros, zeros,
            uzeros, seedv, uzeros, seedv, uzeros, m0, m1, m2, m3)
    st = jax.lax.while_loop(cond, body, init)
    (_, _, _, parity, cnt, k1p, h1l, h1h, h2l, h2h, _, _, _, _) = st

    pa_b = parity > zero
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


def _pack_slab(batch, lengths, pack):
    """[B, L] bytes -> per-chunk slab [C, W*G, R] packed words + [C, G, R] n."""
    B, L = batch.shape
    if pack == "dna16":
        cpw_log2, bits_log2 = 4, 1
    elif pack == "byte4":
        cpw_log2, bits_log2 = 2, 3
    else:
        raise ValueError(f"unknown pack mode {pack!r}")
    cpw = 1 << cpw_log2
    W = -(-L // cpw)
    codes = batch.astype(jnp.uint8)
    if pack == "dna16":
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
    words = jnp.sum(padded.reshape(B, W, cpw) << shifts, axis=-1, dtype=jnp.uint32)

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
    return wc, nc, W, cpw_log2, bits_log2, Bp


def _unslab(out, field: int, fields: int, Bp: int):
    """[C, fields*G, R] kernel output -> flat [Bp] for one field slab."""
    G = GROUPS
    return out[:, field * G : (field + 1) * G, :].reshape(Bp)


@partial(jax.jit, static_argnames=("pack", "interpret"))
def icfl_words_fused(
    batch: jax.Array,
    lengths: jax.Array,
    pack: str = "byte4",
    interpret: bool = False,
):
    """ICFL factor-start boundary words for each row: ``(words u32[B, 4],
    ok bool[B])``.  Requires ``L <= 128``."""
    B, L = batch.shape
    if L > 128:
        raise ValueError("icfl_words_fused requires row width <= 128")
    wc, nc, W, cpw_log2, bits_log2, Bp = _pack_slab(batch, lengths, pack)
    SW = -(-L // 4)
    unroll = 8
    max_steps = ((4 * L + 16 + unroll - 1) // unroll) * unroll
    out = _grid_chunk_call(
        partial(_icfl_words_kernel, max_steps, unroll, cpw_log2, bits_log2, W, SW, L),
        (wc, nc),
        (W * GROUPS, GROUPS),
        5 * GROUPS,
        interpret,
    )
    words = jnp.stack([_unslab(out, i, 5, Bp)[:B] for i in range(4)], axis=1)
    ok = _unslab(out, 4, 5, Bp)[:B] > 0
    return words, ok


@partial(jax.jit, static_argnames=("seed", "interpret"))
def hash_from_words_fused(
    words: jax.Array,  # u32[B, 4] factor-start bits (bit0 = position 0)
    lengths: jax.Array,
    seed: int = 42,
    interpret: bool = False,
):
    """MurmurHash3_x64_128 of each row's factor-length vector, straight from
    boundary words: ``(h1 u64[B], h2 u64[B], fac_count i32[B])``."""
    B = words.shape[0]
    L = 128
    G = GROUPS
    per = G * ROW_BLOCK
    Bp = ((B + per - 1) // per) * per
    wp = jnp.zeros((Bp, 4), jnp.uint32).at[:B].set(words)
    nflat = jnp.zeros((Bp,), jnp.int32).at[:B].set(lengths.astype(jnp.int32))
    chunks = Bp // per
    wc = (
        wp.reshape(chunks, G, ROW_BLOCK, 4)
        .transpose(0, 3, 1, 2)
        .reshape(chunks, 4 * G, ROW_BLOCK)
    )
    nc = nflat.reshape(chunks, G, ROW_BLOCK)
    out = _grid_chunk_call(
        partial(_hash_words_kernel, seed, L),
        (wc, nc),
        (4 * G, G),
        5 * G,
        interpret,
    )
    h1 = _unslab(out, 0, 5, Bp)[:B].astype(jnp.uint64) | (
        _unslab(out, 1, 5, Bp)[:B].astype(jnp.uint64) << jnp.uint64(32)
    )
    h2 = _unslab(out, 2, 5, Bp)[:B].astype(jnp.uint64) | (
        _unslab(out, 3, 5, Bp)[:B].astype(jnp.uint64) << jnp.uint64(32)
    )
    cnt = _unslab(out, 4, 5, Bp)[:B].astype(jnp.int32)
    return h1, h2, cnt


def _rev128(words):
    """Reverse the 128 bits of ``u32[B, 4]`` words (bit i <-> bit 127-i)."""
    x = words[:, ::-1]  # reverse word order
    for sh, m in ((1, 0x55555555), (2, 0x33333333), (4, 0x0F0F0F0F),
                  (8, 0x00FF00FF), (16, 0x0000FFFF)):
        lo = x & jnp.uint32(m)
        hi = x & jnp.uint32(~m & 0xFFFFFFFF)
        x = (lo << jnp.uint32(sh)) | (hi >> jnp.uint32(sh))
    return x


def _shr128(words, k: int):
    """Logical right shift of u32[B, 4] little-endian 128-bit words by k<32."""
    if k == 0:
        return words
    lo = words >> jnp.uint32(k)
    carry = jnp.concatenate(
        [words[:, 1:] << jnp.uint32(32 - k), jnp.zeros_like(words[:, :1])], axis=1
    )
    return lo | carry


def flip_words_uniform(words: jax.Array, L: int) -> jax.Array:
    """COMB position flip for full-width rows: rc-coordinate factor starts
    ``c`` become forward cuts ``L - c``; the rc start bit 0 drops out."""
    flipped = _rev128(words)
    sh = 127 - L
    flipped = _shr128(flipped, sh % 32)
    if sh >= 32:  # L < 96: also drop whole words
        drop = sh // 32
        flipped = jnp.concatenate(
            [flipped[:, drop:], jnp.zeros((words.shape[0], drop), jnp.uint32)], axis=1
        )
    # clear bit L (image of rc bit 0) and everything above
    iota = jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(32)
    lim = jnp.uint32(L)
    full = iota + jnp.uint32(32) <= lim
    partial_ = (iota < lim) & ~full
    keep = jnp.where(
        full, jnp.uint32(0xFFFFFFFF),
        jnp.where(partial_, (jnp.uint32(1) << (lim - iota)) - jnp.uint32(1), jnp.uint32(0)),
    )
    return flipped & keep[None, :]


@partial(jax.jit, static_argnames=("family", "seed", "pack", "interpret"))
def icfl_family_hashes_fused(
    batch: jax.Array,
    lengths: jax.Array,
    family: str = "ICFL_COMB",
    seed: int = 42,
    pack: str = "byte4",
    interpret: bool = False,
):
    """Full fused fingerprint hashes for ICFL / ICFL_COMB.

    Rows must be full-width or empty (the production shift-window shape) —
    the COMB flip is the static uniform one.  Returns
    ``(h1 u64[B], h2 u64[B], fac_count i32[B], ok bool[B])``.
    """
    B, L = batch.shape
    words, ok = icfl_words_fused(batch, lengths, pack=pack, interpret=interpret)
    if family == "ICFL_COMB":
        from fpmash_tpu.ops.factorize import _revcomp_batch

        rc = _revcomp_batch(batch, lengths.astype(jnp.int32), uniform=True)
        rc_words, rc_ok = icfl_words_fused(rc, lengths, pack=pack, interpret=interpret)
        words = words | flip_words_uniform(rc_words, L)
        ok = ok & rc_ok
    elif family != "ICFL":
        raise ValueError(f"unsupported fused family {family!r}")
    h1, h2, cnt = hash_from_words_fused(words, lengths, seed=seed, interpret=interpret)
    return h1, h2, cnt, ok
