"""Pallas tail for the classic k-mer path: canonical pick + MurmurHash3.

The XLA front half (:func:`fpmash_tpu.ops.kmers._kmer_hashes_acgt`'s
doubling ladder) packs each window into big-endian 2-bit codes ``F`` and
its reverse-complement ``R`` — ~40 fused vector ops per position.  The
expensive back half (64-bit canonical min, 21 ASCII byte reconstructions,
and the murmur block/tail/finalize chain) is ~500 u32 ops per position
that XLA runs through emulated-u64 temporaries in HBM; this kernel runs
them in VMEM registers on u32 pairs instead.

Layout: positions ride the lanes, GROUPS=8 windows per sublane slab (same
shape discipline as ops/fused_pallas).  Inputs are the (lo, hi) u32 planes
of F and R; output is the (lo, hi) planes of murmur h1.  Everything is
elementwise — no loads besides the block input, no stores besides the
hash planes, no cross-lane traffic.

Parity: asserted against the scalar chain and the XLA formulation in
tests (interpret mode) and in scripts/chip_smoke.py on hardware.
Reference chain: addMinHashes canonical pick (Sketch.cpp:721-723) ->
MurmurHash3_x64_128 (hash.cpp:12-40).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from fpmash_tpu.ops.fused_pallas import (
    _add64,
    _fmix64,
    _mul5_add,
    _mul64_const,
    _rotl64,
    _u32,
    _A1,
    _A2,
    _C1,
    _C2,
)

GROUPS = 8
# FPMASH_ROW_BLOCK override: see ops/fused_pallas.py
import os as _os

ROW_BLOCK = int(_os.environ.get("FPMASH_ROW_BLOCK", "2048"))


def _mix_k1_pair(kl, kh):
    kl, kh = _mul64_const(kl, kh, _C1)
    kl, kh = _rotl64(kl, kh, 31)
    return _mul64_const(kl, kh, _C2)


def _mix_k2_pair(kl, kh):
    kl, kh = _mul64_const(kl, kh, _C2)
    kl, kh = _rotl64(kl, kh, 33)
    return _mul64_const(kl, kh, _C1)


def _block_update_pair(h1l, h1h, h2l, h2h, k1l, k1h, k2l, k2h):
    m1l, m1h = _mix_k1_pair(k1l, k1h)
    h1l, h1h = h1l ^ m1l, h1h ^ m1h
    h1l, h1h = _rotl64(h1l, h1h, 27)
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h1l, h1h = _mul5_add(h1l, h1h, _A1)
    m2l, m2h = _mix_k2_pair(k2l, k2h)
    h2l, h2h = h2l ^ m2l, h2h ^ m2h
    h2l, h2h = _rotl64(h2l, h2h, 31)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)
    h2l, h2h = _mul5_add(h2l, h2h, _A2)
    return h1l, h1h, h2l, h2h


def _canonical_murmur_body(k: int, noncanonical: bool, seed: int, fl, fh, rl, rh):
    """Canonical min + ASCII rebuild + murmur chain on u32-pair planes;
    returns ``(h1l, h1h)``.  Shared by the tail kernel (pre-packed F/R
    inputs) and the fused kernel (in-VMEM ladder)."""
    if noncanonical:
        pl_, ph_ = fl, fh
    else:
        take_r = (rh < fh) | ((rh == fh) & (rl < fl))
        pl_ = jnp.where(take_r, rl, fl)
        ph_ = jnp.where(take_r, rh, fh)

    # ASCII bytes of the canonical window, packed into little-endian u32
    # murmur words.  Byte j holds code d at bit 2*(k-1-j) of the pair;
    # b = 65 + 2d + 2*(d>>1) + 11*(d & (d>>1))  maps 0,1,2,3 -> A,C,G,T.
    nwords = -(-k // 4)
    if nwords % 2:
        nwords += 1
    words = []
    for w in range(nwords):
        acc = jnp.zeros_like(pl_)
        for m in range(4):
            j = w * 4 + m
            if j >= k:
                break
            s = 2 * (k - 1 - j)
            d = ((pl_ >> _u32(s)) if s < 32 else (ph_ >> _u32(s - 32))) & _u32(3)
            d1 = d >> _u32(1)
            b = _u32(65) + (d << _u32(1)) + (d1 << _u32(1)) + (d & d1) * _u32(11)
            acc = acc | (b << _u32(8 * m))
        words.append(acc)
    if len(words) % 2:
        words.append(jnp.zeros_like(pl_))

    seedv = jnp.full_like(pl_, seed)
    h1l, h1h = seedv, jnp.zeros_like(pl_)
    h2l, h2h = seedv, jnp.zeros_like(pl_)
    nblocks = k // 16
    tail = k % 16
    for blk in range(nblocks):
        h1l, h1h, h2l, h2h = _block_update_pair(
            h1l, h1h, h2l, h2h,
            words[4 * blk], words[4 * blk + 1],
            words[4 * blk + 2], words[4 * blk + 3],
        )
    tw = 4 * nblocks
    if tail > 8:
        m2l, m2h = _mix_k2_pair(words[tw + 2], words[tw + 3])
        h2l, h2h = h2l ^ m2l, h2h ^ m2h
    if tail > 0:
        m1l, m1h = _mix_k1_pair(words[tw], words[tw + 1])
        h1l, h1h = h1l ^ m1l, h1h ^ m1h

    blen = _u32(k)
    h1l = h1l ^ blen
    h2l = h2l ^ blen
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)
    h1l, h1h = _fmix64(h1l, h1h)
    h2l, h2h = _fmix64(h2l, h2h)
    h1l, h1h = _add64(h1l, h1h, h2l, h2h)
    h2l, h2h = _add64(h2l, h2h, h1l, h1h)
    return h1l, h1h


def _kernel(k: int, noncanonical: bool, seed: int, fl_ref, fh_ref, rl_ref, rh_ref, out_ref):
    fl, fh = fl_ref[:], fh_ref[:]
    if noncanonical:
        rl = rh = fl  # unused
    else:
        rl, rh = rl_ref[:], rh_ref[:]
    h1l, h1h = _canonical_murmur_body(k, noncanonical, seed, fl, fh, rl, rh)
    G = GROUPS
    out_ref[0 * G : 1 * G, :] = h1l
    out_ref[1 * G : 2 * G, :] = h1h


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def canonical_murmur_pallas(
    F: jax.Array,  # u64[N] big-endian packed window codes
    R: jax.Array,  # u64[N] packed reverse-complement codes
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """h1 u64[N] of the canonical window per position (see module doc)."""
    N = F.shape[0]
    G = GROUPS
    per = G * ROW_BLOCK
    Np = -(-N // per) * per

    def planes(x):
        xp = jnp.zeros((Np,), jnp.uint64).at[:N].set(x)
        lo = (xp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (xp >> jnp.uint64(32)).astype(jnp.uint32)
        return (
            lo.reshape(-1, G, ROW_BLOCK),
            hi.reshape(-1, G, ROW_BLOCK),
        )

    fl, fh = planes(F)
    rl, rh = planes(R)
    chunks = Np // per
    # ONE pallas_call with a sequential grid over chunks: the earlier
    # lax.map of per-chunk launches paid ~tens of µs of launch overhead
    # per 16k-element chunk, capping the whole hash stage at ~0.3 Gbases/s
    # on chip.  NB index-map constants must be np.int32 — a bare Python 0
    # promotes to i64 under x64 and Mosaic fails to legalize the index-map
    # func.return for any nontrivial grid (root-caused 2026-08-21).
    Z = np.int32(0)
    call = pl.pallas_call(
        partial(_kernel, k, noncanonical, seed),
        grid=(chunks,),
        out_shape=jax.ShapeDtypeStruct((chunks * 2 * G, ROW_BLOCK), jnp.uint32),
        in_specs=[
            pl.BlockSpec((G, ROW_BLOCK), lambda i: (i, Z)),
        ]
        * 4,
        out_specs=pl.BlockSpec((2 * G, ROW_BLOCK), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(
        fl.reshape(chunks * G, ROW_BLOCK),
        fh.reshape(chunks * G, ROW_BLOCK),
        rl.reshape(chunks * G, ROW_BLOCK),
        rh.reshape(chunks * G, ROW_BLOCK),
    ).reshape(chunks, 2 * G, ROW_BLOCK)
    h1l = out[:, :G, :].reshape(Np)[:N]
    h1h = out[:, G:, :].reshape(Np)[:N]
    return h1l.astype(jnp.uint64) | (h1h.astype(jnp.uint64) << jnp.uint64(32))


HALO = 128  # lanes of lookahead per row (>= k-1 for k <= 32; lane-tile aligned)


def _shl_pair(lo, hi, s: int):
    """(lo, hi) u32 pair << s  (0 <= s < 64, static)."""
    if s == 0:
        return lo, hi
    if s == 32:
        return jnp.zeros_like(lo), lo
    if s > 32:
        return jnp.zeros_like(lo), lo << _u32(s - 32)
    return lo << _u32(s), (hi << _u32(s)) | (lo >> _u32(32 - s))


def _fused_kernel(k: int, noncanonical: bool, seed: int, code_ref, out_ref):
    """codes [G, ROW_BLOCK+HALO] -> (h1lo, h1hi, valid) [3G, ROW_BLOCK].

    The ENTIRE classic k-mer pipeline in VMEM: the doubling ladder that
    packs each k-window into big-endian 2-bit codes (formerly ~27
    HBM-materialized roll temporaries in XLA — the 0.3 Gbases/s limiter),
    the reverse-complement packing, canonical min, ASCII rebuild and the
    murmur chain.  Lanes are consecutive sequence positions; each row
    carries HALO lookahead lanes (the first HALO positions of the next
    row) so windows never cross a block boundary; ladder rolls are
    circular, and the wraparound garbage front advances at most k-1 < HALO
    lanes from the row end, never reaching the ROW_BLOCK output lanes.

    Reference semantics: addMinHashes window scan + canonical pick
    (Sketch.cpp:664-735) + MurmurHash3_x64_128 (MurmurHash3.cpp), as in
    ops/kmers._kmer_hashes_acgt whose XLA ladder this mirrors (pair
    arithmetic instead of u64).
    """
    code = code_ref[:]
    # validity as i32 0/1, NOT bool: Mosaic cannot roll i1 vregs
    # ("Invalid vector register cast" on tpu.bitcast_vreg i1->i32,
    # hit on chip 2026-08-21)
    vchar = (code < _u32(4)).astype(jnp.int32)
    c = code & _u32(3)

    def roll1(x, m):
        return jnp.roll(x, -m, axis=1)

    # the greedy binary decomposition of k uses only the levels at k's set
    # bit boundaries (k=21 -> m = 16, 4, 1); keep JUST those taps alive
    # instead of every ladder level (halves register/VMEM pressure), and
    # carry a single lo plane while 2m <= 32 bits (hi is provably zero)
    mlist = []
    mm = 1
    while mm * 2 <= k:
        mm *= 2
    b, m2 = 0, mm
    while m2 >= 1:
        if b + m2 <= k:
            mlist.append(m2)
            b += m2
        m2 //= 2
    used = set(mlist)

    zeros = jnp.zeros_like(c)
    taps = {}
    Flo, Fhi = c, None  # hi plane materialized only once 2m > 32
    Glo, Ghi = c ^ _u32(3), None
    Vm = vchar
    m = 1
    while True:
        if m in used:
            taps[m] = (Flo, Fhi, Glo, Ghi, Vm)
        if m * 2 > k:
            break
        if Fhi is None and 2 * (2 * m) > 32:
            Fhi, Ghi = zeros, zeros
        if Fhi is None:
            Flo = (Flo << _u32(2 * m)) | roll1(Flo, m)
            Glo = Glo | (roll1(Glo, m) << _u32(2 * m))
        else:
            sl, sh = _shl_pair(Flo, Fhi, 2 * m)
            Flo = sl | roll1(Flo, m)
            Fhi = sh | roll1(Fhi, m)
            rl_, rh_ = _shl_pair(roll1(Glo, m), roll1(Ghi, m), 2 * m)
            Glo = Glo | rl_
            Ghi = Ghi | rh_
        Vm = Vm & roll1(Vm, m)
        m *= 2

    Flo = Fhi = Glo = Ghi = None
    flo, fhi = zeros, zeros
    glo, ghi = zeros, zeros
    valid = jnp.ones_like(vchar)  # i32 ones
    built = 0
    for m in mlist:  # descending set bits of the decomposition
        Fl, Fh, Gl, Gh, Vv = taps.pop(m)
        if built:
            Fl = roll1(Fl, built)
            Gl = roll1(Gl, built)
            Vv = roll1(Vv, built)
            if Fh is not None:
                Fh, Gh = roll1(Fh, built), roll1(Gh, built)
        if Fh is None:
            Fh, Gh = zeros, zeros
        sl, sh = _shl_pair(flo, fhi, 2 * m)
        flo, fhi = sl | Fl, sh | Fh
        pl2, ph2 = _shl_pair(Gl, Gh, 2 * built)
        glo, ghi = glo | pl2, ghi | ph2
        valid = valid & Vv
        built += m
    assert built == k

    h1l, h1h = _canonical_murmur_body(k, noncanonical, seed, flo, fhi, glo, ghi)

    G = GROUPS
    RB = ROW_BLOCK
    out_ref[0 * G : 1 * G, :] = h1l[:, :RB]
    out_ref[1 * G : 2 * G, :] = h1h[:, :RB]
    out_ref[2 * G : 3 * G, :] = valid[:, :RB].astype(jnp.uint32)


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_fused_pallas(
    codes: jax.Array,  # u32[N] 2-bit codes, 4 = invalid character
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """(h1 u64[N], window_valid bool[N]) — fully fused classic pipeline.

    ``window_valid`` covers character validity of the whole window only;
    the caller must additionally mask positions past ``length - k``.
    """
    N = codes.shape[0]
    G = GROUPS
    RB = ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    rows = jnp.full((Np,), jnp.uint32(4)).at[:N].set(codes.astype(jnp.uint32))
    rows = rows.reshape(-1, RB)  # [C*G, RB]
    halo = jnp.roll(rows, -1, axis=0)[:, :HALO]
    inp = jnp.concatenate([rows, halo], axis=1)  # [C*G, RB+HALO]
    chunks = Np // per

    Z = np.int32(0)  # index maps: np.int32, never a bare 0 (Mosaic x64 trap)
    call = pl.pallas_call(
        partial(_fused_kernel, k, noncanonical, seed),
        grid=(chunks,),
        out_shape=jax.ShapeDtypeStruct((chunks * 3 * G, RB), jnp.uint32),
        in_specs=[pl.BlockSpec((G, RB + HALO), lambda i: (i, Z))],
        out_specs=pl.BlockSpec((3 * G, RB), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(inp).reshape(chunks, 3 * G, RB)
    h1l = out[:, :G, :].reshape(Np)[:N]
    h1h = out[:, G : 2 * G, :].reshape(Np)[:N]
    v = out[:, 2 * G :, :].reshape(Np)[:N]
    h1 = h1l.astype(jnp.uint64) | (h1h.astype(jnp.uint64) << jnp.uint64(32))
    return h1, v != 0


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_fused_pallas_planes(
    codes: jax.Array,  # u32[N] 2-bit codes, 4 = invalid character
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """(h1lo u32[N], h1hi u32[N], window_valid bool[N]) — planes variant.

    Identical kernel; skips the u64 recombine (XLA u64 elementwise is
    ~100x slower than HBM-bound on this TPU — see ops/bottomk.py), so the
    fused hash -> bottom-k classic pipeline never touches u64 width until
    its s output slots.
    """
    N = codes.shape[0]
    G = GROUPS
    RB = ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    rows = jnp.full((Np,), jnp.uint32(4)).at[:N].set(codes.astype(jnp.uint32))
    rows = rows.reshape(-1, RB)
    halo = jnp.roll(rows, -1, axis=0)[:, :HALO]
    inp = jnp.concatenate([rows, halo], axis=1)
    chunks = Np // per
    Z = np.int32(0)
    call = pl.pallas_call(
        partial(_fused_kernel, k, noncanonical, seed),
        grid=(chunks,),
        out_shape=jax.ShapeDtypeStruct((chunks * 3 * G, RB), jnp.uint32),
        in_specs=[pl.BlockSpec((G, RB + HALO), lambda i: (i, Z))],
        out_specs=pl.BlockSpec((3 * G, RB), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(inp).reshape(chunks, 3 * G, RB)
    h1l = out[:, :G, :].reshape(Np)[:N]
    h1h = out[:, G : 2 * G, :].reshape(Np)[:N]
    v = out[:, 2 * G :, :].reshape(Np)[:N]
    return h1l, h1h, v != 0


def _slab_kernel(k: int, noncanonical: bool, seed: int, code_ref, out_ref):
    """Pre-shifted code slabs [k*G, RB] -> (h1lo, h1hi, valid) [3G, RB].

    Roll-free variant of :func:`_fused_kernel`: the wrapper provides the
    k shifted copies of the code vector as separate sublane slabs (row
    j*G+g holds code[pos+j] for group g), so the kernel is PURE
    elementwise — the same structure as the proven fused-CFL kernel,
    which sustains ~1e12 lane-ops/s, while in-kernel lane rolls over
    17-tile rows measured ~3x slower.
    """
    G = GROUPS
    zeros = None
    flo = fhi = glo = ghi = None
    valid = None
    for j in range(k):
        code = code_ref[j * G : (j + 1) * G, :]
        v = (code < _u32(4)).astype(jnp.int32)
        c = code & _u32(3)
        if zeros is None:
            zeros = jnp.zeros_like(c)
        # F: big-endian — code j sits at bit 2*(k-1-j)
        sF = 2 * (k - 1 - j)
        if sF < 32:
            fl_j, fh_j = c << _u32(sF), zeros
        elif sF == 32:
            fl_j, fh_j = zeros, c
        else:
            fl_j, fh_j = zeros, c << _u32(sF - 32)
        # R (packed reverse complement, little-endian): complement at bit 2*j
        g = c ^ _u32(3)
        if 2 * j < 32:
            gl_j, gh_j = g << _u32(2 * j), zeros
        elif 2 * j == 32:
            gl_j, gh_j = zeros, g
        else:
            gl_j, gh_j = zeros, g << _u32(2 * j - 32)
        if flo is None:
            flo, fhi, glo, ghi, valid = fl_j, fh_j, gl_j, gh_j, v
        else:
            flo, fhi = flo | fl_j, fhi | fh_j
            glo, ghi = glo | gl_j, ghi | gh_j
            valid = valid & v

    h1l, h1h = _canonical_murmur_body(k, noncanonical, seed, flo, fhi, glo, ghi)
    G = GROUPS
    out_ref[0 * G : 1 * G, :] = h1l
    out_ref[1 * G : 2 * G, :] = h1h
    out_ref[2 * G : 3 * G, :] = valid.astype(jnp.uint32)


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_slab_pallas_planes(
    codes: jax.Array,  # u32[N] 2-bit codes, 4 = invalid character
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """(h1lo u32[N], h1hi u32[N], window_valid bool[N]) — slab variant.

    The k shifted code copies are built with XLA rolls on the flat [N]
    vector (~20 cheap HBM passes) and fed as sublane slabs; the kernel
    itself has zero cross-lane traffic.  Same contract as
    :func:`kmer_hashes_fused_pallas_planes`.
    """
    N = codes.shape[0]
    G = GROUPS
    RB = ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    flat = jnp.full((Np + k,), jnp.uint32(4)).at[:N].set(codes.astype(jnp.uint32))
    C = Np // per
    # shifted[j] reshaped to [C, G, RB]; stacked -> [C, k*G, RB] slabs
    shifted = jnp.stack(
        [
            jax.lax.dynamic_slice(flat, (j,), (Np,)).reshape(C, G, RB)
            for j in range(k)
        ],
        axis=1,
    )  # [C, k, G, RB]
    slabs = shifted.reshape(C, k * G, RB).reshape(C * k * G, RB)

    Z = np.int32(0)
    call = pl.pallas_call(
        partial(_slab_kernel, k, noncanonical, seed),
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((C * 3 * G, RB), jnp.uint32),
        in_specs=[pl.BlockSpec((k * G, RB), lambda i: (i, Z))],
        out_specs=pl.BlockSpec((3 * G, RB), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(slabs).reshape(C, 3 * G, RB)
    h1l = out[:, :G, :].reshape(Np)[:N]
    h1h = out[:, G : 2 * G, :].reshape(Np)[:N]
    v = out[:, 2 * G :, :].reshape(Np)[:N]
    return h1l, h1h, v != 0


def _packed_slab_kernel(k: int, noncanonical: bool, seed: int,
                        bea_ref, beb_ref, lea_ref, leb_ref, wv_ref, out_ref):
    """Packed-plane variant of :func:`_slab_kernel` for 16 < k <= 32.

    The wrapper pre-packs 16-code words in XLA (doubling ladder on the
    flat code vector): BE16[p] = big-endian codes p..p+15, LE16[p] =
    little-endian complements p..p+15, plus their +16-shifted copies and
    the window-validity plane — 5 u32 planes (20 B/base) instead of k
    one-code-per-u32 slabs (84 B/base at k=21), and the in-kernel window
    assembly is ~10 shifts/ors instead of the ~170-op OR tree."""
    G = GROUPS
    bea, beb = bea_ref[:], beb_ref[:]
    s_hi = 2 * (32 - k)  # 64 - 2k
    s_lo = 2 * k - 32
    if k == 32:
        # s_lo == 32: a full-bit-width u32 shift is implementation-defined
        # (XLA:CPU yields 0, Mosaic may mask the amount) — the window is
        # exactly the two packed words, no shifts needed
        fhi, flo = bea, beb
    else:
        fhi = bea >> _u32(s_hi)
        flo = (bea << _u32(s_lo)) | (beb >> _u32(s_hi))
    if noncanonical:
        rlo = rhi = flo  # unused
    else:
        lea, leb = lea_ref[:], leb_ref[:]
        rlo = lea
        rhi = leb if k == 32 else leb & _u32((1 << s_lo) - 1)
    h1l, h1h = _canonical_murmur_body(k, noncanonical, seed, flo, fhi, rlo, rhi)
    out_ref[0 * G : 1 * G, :] = h1l
    out_ref[1 * G : 2 * G, :] = h1h
    out_ref[2 * G : 3 * G, :] = wv_ref[:]


def _packed_slab_masked_kernel(k: int, noncanonical: bool, seed: int,
                               t_ref, len_ref, bea_ref, beb_ref, lea_ref,
                               leb_ref, wv_ref, out_ref):
    """Threshold-fused variant of :func:`_packed_slab_kernel`: emits the
    hash planes PRE-MASKED (lanes that are invalid, beyond the sequence
    end, or above the bottom-k threshold write U32MAX on both planes),
    so the bottom-k stage starts directly at its row-sort compaction —
    no separate validity plane, no mask/where passes over the pool.

    ``t_ref``/``len_ref`` are SMEM scalars: the hi-plane threshold (u32)
    and the valid sequence length (i32)."""
    G = GROUPS
    bea, beb = bea_ref[:], beb_ref[:]
    s_hi = 2 * (32 - k)
    s_lo = 2 * k - 32
    if k == 32:
        # s_lo == 32 full-width shift guard — see _packed_slab_kernel
        fhi, flo = bea, beb
    else:
        fhi = bea >> _u32(s_hi)
        flo = (bea << _u32(s_lo)) | (beb >> _u32(s_hi))
    if noncanonical:
        rlo = rhi = flo
    else:
        lea, leb = lea_ref[:], leb_ref[:]
        rlo = lea
        rhi = leb if k == 32 else leb & _u32((1 << s_lo) - 1)
    h1l, h1h = _canonical_murmur_body(k, noncanonical, seed, flo, fhi, rlo, rhi)

    t_hi = t_ref[0]
    length = len_ref[0]
    RB = bea.shape[1]
    base = pl.program_id(0) * jnp.int32(G)
    sub = jax.lax.broadcasted_iota(jnp.int32, (G, RB), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, RB), 1)
    pos = (base + sub) * jnp.int32(RB) + lane
    keep = (
        (wv_ref[:] != _u32(0))
        & (pos <= length - jnp.int32(k))
        & (h1h <= t_hi)
    )
    U = _u32(0xFFFFFFFF)
    out_ref[0 * G : 1 * G, :] = jnp.where(keep, h1l, U)
    out_ref[1 * G : 2 * G, :] = jnp.where(keep, h1h, U)


# Batcher odd-even mergesort network for 8 (19 compare-exchanges) and the
# bitonic cleanup for a bitonic 8-sequence (12 CEs, distances 4/2/1)
_NET8 = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6),
    (0, 4), (1, 5), (2, 6), (3, 7),
    (2, 4), (3, 5),
    (1, 2), (3, 4), (5, 6),
)
_BITONIC8 = (
    (0, 4), (1, 5), (2, 6), (3, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (0, 1), (2, 3), (4, 5), (6, 7),
)

#: lanes of the compacted per-tile output (the minimum tile-aligned lane
#: width); each output column aggregates 8 sublanes x RB/W_TOPK lanes
W_TOPK = 128


def _ce_pair(a, b):
    """Lexicographic (hi, lo) compare-exchange of two (lo, hi) slices."""
    swap = (b[1] < a[1]) | ((b[1] == a[1]) & (b[0] < a[0]))
    mn = (jnp.where(swap, b[0], a[0]), jnp.where(swap, b[1], a[1]))
    mx = (jnp.where(swap, a[0], b[0]), jnp.where(swap, a[1], b[1]))
    return mn, mx


def _packed_slab_topk_kernel(k: int, noncanonical: bool, seed: int,
                             t_ref, len_ref, bea_ref, beb_ref, lea_ref,
                             leb_ref, wv_ref, out_ref):
    """Threshold-fused hash kernel WITH in-kernel top-8 compaction.

    Round-5 successor of :func:`_packed_slab_masked_kernel`: every XLA
    reformulation of the bottom-k compaction re-streams the pool through
    HBM and measured at or below the row sort (exp_bk_r5), so the
    selection moves INTO the hash kernel where the values are already in
    vregs.  Per [G, RB] tile: mask (invalid / past-end / above-threshold
    -> U32MAX pads), sort the 8 sublane values of every lane column with
    a Batcher-8 network, then fold lanes by halving (bitonic keep-8
    merges) down to W_TOPK columns — each output column holds the 8
    smallest survivors of its 8 x RB/W_TOPK element group, plus an
    overflow row flagging any group that dropped a real value (the exact
    fallback signal).  Output volume is RB/(2*W_TOPK) of the input with
    ~100 extra VPU ops/element and zero extra HBM traffic.
    """
    G = GROUPS
    bea, beb = bea_ref[:], beb_ref[:]
    s_hi = 2 * (32 - k)
    s_lo = 2 * k - 32
    if k == 32:
        fhi, flo = bea, beb
    else:
        fhi = bea >> _u32(s_hi)
        flo = (bea << _u32(s_lo)) | (beb >> _u32(s_hi))
    if noncanonical:
        rlo = rhi = flo
    else:
        lea, leb = lea_ref[:], leb_ref[:]
        rlo = lea
        rhi = leb if k == 32 else leb & _u32((1 << s_lo) - 1)
    h1l, h1h = _canonical_murmur_body(k, noncanonical, seed, flo, fhi, rlo, rhi)

    t_hi = t_ref[0]
    length = len_ref[0]
    RB = bea.shape[1]
    base = pl.program_id(0) * jnp.int32(G)
    sub = jax.lax.broadcasted_iota(jnp.int32, (G, RB), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, RB), 1)
    pos = (base + sub) * jnp.int32(RB) + lane
    keep = (
        (wv_ref[:] != _u32(0))
        & (pos <= length - jnp.int32(k))
        & (h1h <= t_hi)
    )
    U = _u32(0xFFFFFFFF)
    lo = jnp.where(keep, h1l, U)
    hi = jnp.where(keep, h1h, U)

    # per-lane-column sort of the 8 sublane values (pure elementwise row
    # ops — no cross-lane traffic)
    vals = [(lo[i : i + 1, :], hi[i : i + 1, :]) for i in range(G)]
    for i, j in _NET8:
        mn, mx = _ce_pair(vals[i], vals[j])
        vals[i], vals[j] = mn, mx

    one_i32 = jnp.ones((1, RB), jnp.int32)
    zero_i32 = jnp.zeros((1, RB), jnp.int32)
    ovf = zero_i32
    width = RB
    while width > W_TOPK:
        h = width // 2
        a = [(v[0][:, :h], v[1][:, :h]) for v in vals]
        b = [(v[0][:, h:width], v[1][:, h:width]) for v in vals]
        ovf = ovf[:, :h] | ovf[:, h:width]
        dropped = zero_i32[:, :h]
        z = []
        for i in range(G):
            mn, mx = _ce_pair(a[i], b[G - 1 - i])
            z.append(mn)
            real = ~((mx[0] == U) & (mx[1] == U))
            dropped = dropped | jnp.where(
                real, one_i32[:, :h], zero_i32[:, :h]
            )
        for i, j in _BITONIC8:
            mn, mx = _ce_pair(z[i], z[j])
            z[i], z[j] = mn, mx
        vals = z
        ovf = ovf | dropped
        width = h

    W = W_TOPK
    for i in range(G):
        out_ref[i : i + 1, :] = vals[i][0][:, :W]
        out_ref[G + i : G + i + 1, :] = vals[i][1][:, :W]
    out_ref[2 * G : 2 * G + 1, :] = ovf[:, :W].astype(jnp.uint32)
    # rows 2G+1 .. 3G-1 are don't-care; fill deterministically
    for i in range(2 * G + 1, 3 * G):
        out_ref[i : i + 1, :] = jnp.full((1, W), U)


def _xor_permute(lo, hi, d: int):
    """(lo, hi)[i] -> value at sublane i ^ d (d a power of two <= 4),
    via two sublane rotations + an iota select — full-vreg ops instead
    of [1, RB] slice shuffles."""
    G = lo.shape[0]
    up_lo = jnp.roll(lo, -d, axis=0)
    dn_lo = jnp.roll(lo, d, axis=0)
    up_hi = jnp.roll(hi, -d, axis=0)
    dn_hi = jnp.roll(hi, d, axis=0)
    sub = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 0)
    take_dn = (sub & jnp.int32(d)) != 0
    return (
        jnp.where(take_dn, dn_lo, up_lo),
        jnp.where(take_dn, dn_hi, up_hi),
    )


def _bitonic_sublane_sort8(lo, hi):
    """Ascending-by-sublane bitonic sort of the 8 sublane values of every
    lane column, entirely as [G, RB] full-vreg ops (the slice-based
    Batcher network uses 1/8 of each vreg).  Standard bitonic network:
    stage (k, d) compares i with i^d, ascending iff bit k of i is 0."""
    sub = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 0)
    for kk in (2, 4, 8):
        # merge stage kk: ascending iff bit kk of the index is 0 (always
        # true for the final kk=8 stage -> globally ascending)
        asc = (sub & jnp.int32(kk)) == 0
        d = kk // 2
        while d >= 1:
            plo, phi = _xor_permute(lo, hi, d)
            i_low = (sub & jnp.int32(d)) == 0
            want_min = asc == i_low
            p_less = (phi < hi) | ((phi == hi) & (plo < lo))
            # NOT jnp.where on bool operands: Mosaic i1 select_n fails
            # "Unsupported target bitwidth for truncation" (known trap)
            keep_partner = want_min == p_less
            lo = jnp.where(keep_partner, plo, lo)
            hi = jnp.where(keep_partner, phi, hi)
            d //= 2
    return lo, hi


def _sublane_reverse8(lo, hi):
    """(lo, hi)[i] -> value at sublane 7 - i  (XOR with 7 = composed
    XOR-permutes at d = 1, 2, 4)."""
    for d in (1, 2, 4):
        lo, hi = _xor_permute(lo, hi, d)
    return lo, hi


def _packed_slab_topk8r_kernel(k: int, noncanonical: bool, seed: int,
                               t_ref, len_ref, bea_ref, beb_ref, lea_ref,
                               leb_ref, wv_ref, out_ref):
    """Rotation-variant of :func:`_packed_slab_topk_kernel`: the sort-8
    and keep-8 networks run on [G, RB] slabs via sublane rotations
    (tpu.rotate) + iota selects, instead of [1, RB] slices that leave
    7/8 of every vreg idle.  EXPERIMENTAL — same contract, A/B'd on
    chip before any routing change."""
    G = GROUPS
    bea, beb = bea_ref[:], beb_ref[:]
    s_hi = 2 * (32 - k)
    s_lo = 2 * k - 32
    if k == 32:
        fhi, flo = bea, beb
    else:
        fhi = bea >> _u32(s_hi)
        flo = (bea << _u32(s_lo)) | (beb >> _u32(s_hi))
    if noncanonical:
        rlo = rhi = flo
    else:
        lea, leb = lea_ref[:], leb_ref[:]
        rlo = lea
        rhi = leb if k == 32 else leb & _u32((1 << s_lo) - 1)
    h1l, h1h = _canonical_murmur_body(k, noncanonical, seed, flo, fhi, rlo, rhi)

    t_hi = t_ref[0]
    length = len_ref[0]
    RB = bea.shape[1]
    base = pl.program_id(0) * jnp.int32(G)
    sub = jax.lax.broadcasted_iota(jnp.int32, (G, RB), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, RB), 1)
    pos = (base + sub) * jnp.int32(RB) + lane
    keep = (
        (wv_ref[:] != _u32(0))
        & (pos <= length - jnp.int32(k))
        & (h1h <= t_hi)
    )
    U = _u32(0xFFFFFFFF)
    lo = jnp.where(keep, h1l, U)
    hi = jnp.where(keep, h1h, U)

    lo, hi = _bitonic_sublane_sort8(lo, hi)

    ovf = jnp.zeros((1, RB), jnp.int32)
    width = RB
    while width > W_TOPK:
        h = width // 2
        alo, ahi = lo[:, :h], hi[:, :h]
        blo, bhi = lo[:, h:width], hi[:, h:width]
        ovf = ovf[:, :h] | ovf[:, h:width]
        # bitonic keep-8: z = min(a_i, b_rev_i); dropped = the maxes
        rlo2, rhi2 = _sublane_reverse8(blo, bhi)
        b_less = (rhi2 < ahi) | ((rhi2 == ahi) & (rlo2 < alo))
        zlo = jnp.where(b_less, rlo2, alo)
        zhi = jnp.where(b_less, rhi2, ahi)
        mlo2 = jnp.where(b_less, alo, rlo2)
        mhi2 = jnp.where(b_less, ahi, rhi2)
        real = ~((mlo2 == U) & (mhi2 == U))
        real_i32 = jnp.where(
            real, jnp.ones((G, h), jnp.int32), jnp.zeros((G, h), jnp.int32)
        )
        dropped = jnp.max(real_i32, axis=0, keepdims=True)
        # cleanup: bitonic merge of the bitonic 8-sequence (d = 4, 2, 1,
        # all ascending)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (G, h), 0)
        for d in (4, 2, 1):
            plo, phi = _xor_permute(zlo, zhi, d)
            i_low = (sub8 & jnp.int32(d)) == 0
            p_less = (phi < zhi) | ((phi == zhi) & (plo < zlo))
            keep_p = i_low == p_less  # no bool-operand select (Mosaic trap)
            zlo = jnp.where(keep_p, plo, zlo)
            zhi = jnp.where(keep_p, phi, zhi)
        lo, hi = zlo, zhi
        ovf = ovf | dropped
        width = h

    W = W_TOPK
    out_ref[0:G, :] = lo[:, :W]
    out_ref[G : 2 * G, :] = hi[:, :W]
    out_ref[2 * G : 2 * G + 1, :] = ovf[:, :W].astype(jnp.uint32)
    for i in range(2 * G + 1, 3 * G):
        out_ref[i : i + 1, :] = jnp.full((1, W), U)


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_packed_topk8r_planes(
    codes: jax.Array,
    t_hi: jax.Array,
    length: jax.Array,
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """Rotation-variant wrapper — identical contract to
    :func:`kmer_hashes_packed_topk_planes` (EXPERIMENTAL, un-routed)."""
    from jax.experimental.pallas import tpu as pltpu

    if not (16 < k <= 32):
        raise ValueError("packed topk variant requires 16 < k <= 32")
    N = codes.shape[0]
    G = GROUPS
    RB = ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    C = Np // per
    pad = Np + 48
    flat = jnp.full((pad,), jnp.uint32(4)).at[:N].set(codes.astype(jnp.uint32))
    v = (flat < _u32(4)).astype(jnp.uint32)
    cc = flat & _u32(3)
    g = cc ^ _u32(3)
    be, le, vv = cc, g, v
    m = 1
    while m < 16:
        be = (be << _u32(2 * m)) | jnp.concatenate(
            [be[m:], jnp.zeros((m,), jnp.uint32)]
        )
        le = le | (
            jnp.concatenate([le[m:], jnp.zeros((m,), jnp.uint32)]) << _u32(2 * m)
        )
        vv = vv & jnp.concatenate([vv[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
    wv = vv
    rem = k - 16
    vlev = {1: v}
    x = v
    m = 1
    while m < 16:
        x = x & jnp.concatenate([x[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
        vlev[m] = x
    off = 16
    while rem > 0:
        b = 1 << (rem.bit_length() - 1)
        tap = vlev[b]
        wv = wv & jnp.concatenate([tap[off:], jnp.ones((off,), jnp.uint32)])
        off += b
        rem -= b

    def slabs(x):
        return x[:Np].reshape(C * G, RB)

    beb = jnp.concatenate([be[16:], jnp.zeros((16,), jnp.uint32)])
    leb = jnp.concatenate([le[16:], jnp.zeros((16,), jnp.uint32)])
    t_arr = jnp.reshape(t_hi.astype(jnp.uint32), (1,))
    len_arr = jnp.reshape(length.astype(jnp.int32), (1,))

    W = W_TOPK
    Z = np.int32(0)
    call = pl.pallas_call(
        partial(_packed_slab_topk8r_kernel, k, noncanonical, seed),
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((C * 3 * G, W), jnp.uint32),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
        ],
        out_specs=pl.BlockSpec((3 * G, W), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(
        t_arr, len_arr, slabs(be), slabs(beb), slabs(le), slabs(leb), slabs(wv)
    ).reshape(C, 3 * G, W)
    clo = out[:, :G, :].reshape(C * G * W)
    chi = out[:, G : 2 * G, :].reshape(C * G * W)
    overflow = jnp.any(out[:, 2 * G, :] != 0)
    return clo, chi, overflow


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_packed_topk_planes(
    codes: jax.Array,  # u32[N] 2-bit codes, 4 = invalid character
    t_hi: jax.Array,  # u32 scalar bottom-k threshold (hi plane)
    length: jax.Array,  # i32 scalar valid sequence length
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """(clo u32[N/16], chi u32[N/16], overflow bool) — the in-kernel
    compacted survivor planes: every threshold survivor appears among the
    outputs unless ``overflow`` (some 128-element group held > 8
    survivors — caller falls back).  Value-duplicates within a group are
    PRESERVED (the networks keep copies), so counts-consuming callers may
    use this too as long as overflow is honored.  16 < k <= 32."""
    from jax.experimental.pallas import tpu as pltpu

    if not (16 < k <= 32):
        raise ValueError("packed topk variant requires 16 < k <= 32")
    N = codes.shape[0]
    G = GROUPS
    RB = ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    C = Np // per
    pad = Np + 48
    flat = jnp.full((pad,), jnp.uint32(4)).at[:N].set(codes.astype(jnp.uint32))
    v = (flat < _u32(4)).astype(jnp.uint32)
    cc = flat & _u32(3)
    g = cc ^ _u32(3)
    be, le, vv = cc, g, v
    m = 1
    while m < 16:
        be = (be << _u32(2 * m)) | jnp.concatenate(
            [be[m:], jnp.zeros((m,), jnp.uint32)]
        )
        le = le | (
            jnp.concatenate([le[m:], jnp.zeros((m,), jnp.uint32)]) << _u32(2 * m)
        )
        vv = vv & jnp.concatenate([vv[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
    wv = vv
    rem = k - 16
    vlev = {1: v}
    x = v
    m = 1
    while m < 16:
        x = x & jnp.concatenate([x[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
        vlev[m] = x
    off = 16
    while rem > 0:
        b = 1 << (rem.bit_length() - 1)
        tap = vlev[b]
        wv = wv & jnp.concatenate([tap[off:], jnp.ones((off,), jnp.uint32)])
        off += b
        rem -= b

    def slabs(x):
        return x[:Np].reshape(C * G, RB)

    beb = jnp.concatenate([be[16:], jnp.zeros((16,), jnp.uint32)])
    leb = jnp.concatenate([le[16:], jnp.zeros((16,), jnp.uint32)])
    t_arr = jnp.reshape(t_hi.astype(jnp.uint32), (1,))
    len_arr = jnp.reshape(length.astype(jnp.int32), (1,))

    W = W_TOPK
    Z = np.int32(0)
    call = pl.pallas_call(
        partial(_packed_slab_topk_kernel, k, noncanonical, seed),
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((C * 3 * G, W), jnp.uint32),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
        ],
        out_specs=pl.BlockSpec((3 * G, W), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(
        t_arr, len_arr, slabs(be), slabs(beb), slabs(le), slabs(leb), slabs(wv)
    ).reshape(C, 3 * G, W)
    clo = out[:, :G, :].reshape(C * G * W)
    chi = out[:, G : 2 * G, :].reshape(C * G * W)
    overflow = jnp.any(out[:, 2 * G, :] != 0)
    return clo, chi, overflow


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_packed_masked_planes(
    codes: jax.Array,  # u32[N] 2-bit codes, 4 = invalid character
    t_hi: jax.Array,  # u32 scalar bottom-k threshold (hi plane)
    length: jax.Array,  # i32 scalar valid sequence length
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """(masked_h1lo u32[N], masked_h1hi u32[N]) — windows that are
    invalid, beyond ``length - k``, or with h1hi > t_hi hold U32MAX on
    BOTH planes (the bottom-k pad convention).  16 < k <= 32."""
    from jax.experimental.pallas import tpu as pltpu

    if not (16 < k <= 32):
        raise ValueError("packed planes variant requires 16 < k <= 32")
    N = codes.shape[0]
    G = GROUPS
    RB = ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    C = Np // per
    pad = Np + 48
    flat = jnp.full((pad,), jnp.uint32(4)).at[:N].set(codes.astype(jnp.uint32))
    v = (flat < _u32(4)).astype(jnp.uint32)
    cc = flat & _u32(3)
    g = cc ^ _u32(3)
    be, le, vv = cc, g, v
    m = 1
    while m < 16:
        be = (be << _u32(2 * m)) | jnp.concatenate(
            [be[m:], jnp.zeros((m,), jnp.uint32)]
        )
        le = le | (
            jnp.concatenate([le[m:], jnp.zeros((m,), jnp.uint32)]) << _u32(2 * m)
        )
        vv = vv & jnp.concatenate([vv[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
    wv = vv
    rem = k - 16
    vlev = {1: v}
    x = v
    m = 1
    while m < 16:
        x = x & jnp.concatenate([x[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
        vlev[m] = x
    off = 16
    while rem > 0:
        b = 1 << (rem.bit_length() - 1)
        tap = vlev[b]
        wv = wv & jnp.concatenate([tap[off:], jnp.ones((off,), jnp.uint32)])
        off += b
        rem -= b

    def slabs(x):
        return x[:Np].reshape(C * G, RB)

    beb = jnp.concatenate([be[16:], jnp.zeros((16,), jnp.uint32)])
    leb = jnp.concatenate([le[16:], jnp.zeros((16,), jnp.uint32)])
    t_arr = jnp.reshape(t_hi.astype(jnp.uint32), (1,))
    len_arr = jnp.reshape(length.astype(jnp.int32), (1,))

    Z = np.int32(0)
    call = pl.pallas_call(
        partial(_packed_slab_masked_kernel, k, noncanonical, seed),
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((C * 2 * G, RB), jnp.uint32),
        in_specs=[
            # NB: explicit (1,) block + np.int32 index map — a defaulted
            # SMEM spec's identity map returns the raw grid index, which
            # is i64 under x64 and trips Mosaic's func.return
            # legalization (the index-map trap, caught on chip)
            pl.BlockSpec((1,), lambda i: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
            pl.BlockSpec((G, RB), lambda i: (i, Z)),
        ],
        out_specs=pl.BlockSpec((2 * G, RB), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(
        t_arr, len_arr, slabs(be), slabs(beb), slabs(le), slabs(leb), slabs(wv)
    ).reshape(C, 2 * G, RB)
    h1l = out[:, :G, :].reshape(Np)[:N]
    h1h = out[:, G:, :].reshape(Np)[:N]
    return h1l, h1h


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_packed_pallas_planes(
    codes: jax.Array,  # u32[N] 2-bit codes, 4 = invalid character
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """(h1lo u32[N], h1hi u32[N], window_valid bool[N]) — packed variant.

    Same contract as :func:`kmer_hashes_slab_pallas_planes`; requires
    16 < k <= 32 (two packed words cover the window).  XLA builds the
    BE/LE 16-code ladders and the validity AND-ladder over the flat code
    vector (~9 materialized passes), the kernel assembles each window's
    (lo, hi) planes from two words.
    """
    if not (16 < k <= 32):
        raise ValueError("packed planes variant requires 16 < k <= 32")
    N = codes.shape[0]
    G = GROUPS
    RB = ROW_BLOCK
    per = G * RB
    Np = -(-N // per) * per
    C = Np // per
    pad = Np + 48  # ladder lookahead: max shift 16 + window tail
    flat = jnp.full((pad,), jnp.uint32(4)).at[:N].set(codes.astype(jnp.uint32))
    v = (flat < _u32(4)).astype(jnp.uint32)
    cc = flat & _u32(3)
    g = cc ^ _u32(3)

    # doubling ladders to 16-code words (shift amounts are static)
    be, le, vv = cc, g, v
    m = 1
    while m < 16:
        be = (be << _u32(2 * m)) | jnp.concatenate(
            [be[m:], jnp.zeros((m,), jnp.uint32)]
        )
        le = le | (
            jnp.concatenate([le[m:], jnp.zeros((m,), jnp.uint32)]) << _u32(2 * m)
        )
        vv = vv & jnp.concatenate([vv[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
    # window validity for k: V16[p] & V_{k-16 decomposition}[p+16]
    wv = vv
    rem = k - 16
    # V ladder taps for the remainder bits of k (XLA CSEs the shared
    # prefix with the vv ladder above)
    vlev = {1: v}
    x = v
    m = 1
    while m < 16:
        x = x & jnp.concatenate([x[m:], jnp.ones((m,), jnp.uint32)])
        m *= 2
        vlev[m] = x
    off = 16
    while rem > 0:
        b = 1 << (rem.bit_length() - 1)
        tap = vlev[b]
        wv = wv & jnp.concatenate([tap[off:], jnp.ones((off,), jnp.uint32)])
        off += b
        rem -= b

    def slabs(x):
        return x[:Np].reshape(C * G, RB)

    beb = jnp.concatenate([be[16:], jnp.zeros((16,), jnp.uint32)])
    leb = jnp.concatenate([le[16:], jnp.zeros((16,), jnp.uint32)])

    Z = np.int32(0)
    call = pl.pallas_call(
        partial(_packed_slab_kernel, k, noncanonical, seed),
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((C * 3 * G, RB), jnp.uint32),
        in_specs=[pl.BlockSpec((G, RB), lambda i: (i, Z))] * 5,
        out_specs=pl.BlockSpec((3 * G, RB), lambda i: (i, Z)),
        interpret=interpret,
    )
    out = call(slabs(be), slabs(beb), slabs(le), slabs(leb), slabs(wv)).reshape(
        C, 3 * G, RB
    )
    h1l = out[:, :G, :].reshape(Np)[:N]
    h1h = out[:, G : 2 * G, :].reshape(Np)[:N]
    vwin = out[:, 2 * G :, :].reshape(Np)[:N]
    return h1l, h1h, vwin != 0


def kmer_hashes_route_planes(
    codes: jax.Array,
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """Production route: the packed-plane kernel for 16 < k <= 32 (1.42x
    the slab kernel on chip, 2325 vs 1633 Mbases/s at N=8M), the slab
    kernel otherwise.  Same contract as the variants."""
    fn = (
        kmer_hashes_packed_pallas_planes
        if 16 < k <= 32
        else kmer_hashes_slab_pallas_planes
    )
    return fn(codes, k=k, noncanonical=noncanonical, seed=seed, interpret=interpret)


@partial(jax.jit, static_argnames=("k", "noncanonical", "seed", "interpret"))
def kmer_hashes_slab_pallas(
    codes: jax.Array,
    *,
    k: int,
    noncanonical: bool = False,
    seed: int = 42,
    interpret: bool = False,
):
    """u64 wrapper over the routed kernel (for callers that need combined
    hashes; the combine is one u64-wide pass — planes callers avoid it)."""
    h1l, h1h, vw = kmer_hashes_route_planes(
        codes, k=k, noncanonical=noncanonical, seed=seed, interpret=interpret
    )
    return h1l.astype(jnp.uint64) | (h1h.astype(jnp.uint64) << jnp.uint64(32)), vw
