"""MurmurHash3 with constant-multiplies on the MXU — nibble-limb arithmetic.

Murmur3's only multiplies are by fixed constants (c1, c2, 5, and the two
fmix constants).  On TPU, 64-bit integer multiplies emulate expensively on
the VPU; here the hash STATE is held as 16 nibble (4-bit) limbs in an
``int32[B, 16]`` array and each constant multiply becomes

    raw = limbs @ M_c        (int8 x int8 -> int32 on the MXU)

where ``M_c[i, k] = nibble_{k-i}(c)`` is a fixed 16x16 matrix, followed by
a vectorized carry normalization.  The remaining ops map cheaply onto
limbs:

* xor — elementwise limb xor;
* rotl(r) — a static limb roll (r//4) plus a 1-3 bit intra-limb shift
  blended with the neighbor limb (a permutation, no carries);
* add — limb add + Kogge-Stone style carry settling (log passes);
* shift-right (fmix's x >> 33) — static limb roll + optional 1-bit blend.

Bit-exact against scalar murmur3 (tested); same API as
ops.murmur3.murmur3_u64_batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_F1 = 0xFF51AFD7ED558CCD
_F2 = 0xC4CEB9FE1A85EC53

_NL = 16  # nibble limbs per u64


def _const_matrix(c: int) -> np.ndarray:
    """M[i, k] = nibble_{k-i}(c): limbs @ M = product limbs (pre-carry)."""
    nibbles = [(c >> (4 * j)) & 0xF for j in range(_NL)]
    M = np.zeros((_NL, _NL), np.int8)
    for i in range(_NL):
        for k in range(i, _NL):
            M[i, k] = nibbles[k - i]
    return M


_M_C1 = _const_matrix(_C1)
_M_C2 = _const_matrix(_C2)
_M_F1 = _const_matrix(_F1)
_M_F2 = _const_matrix(_F2)


def _shift_up(x, d):
    """Bring limb k-d to position k (zeros below)."""
    return jnp.concatenate([jnp.zeros_like(x[:, :d]), x[:, :-d]], axis=1)


def _settle(s):
    """Exact carry settling for limb sums <= 31 (one pending carry bit per
    limb) via Kogge-Stone carry-lookahead: generate g = s >> 4 (0/1),
    propagate p = (s & 15 == 15); carry_in[k] = OR_{j<k} g[j] AND prod p.
    """
    g = (s >> 4).astype(jnp.int32)
    p = ((s & 0xF) == 0xF).astype(jnp.int32)
    G, P = g, p
    d = 1
    while d < _NL:
        G = G | (P & _shift_up(G, d))
        P = P & _shift_up(P, d)
        d *= 2
    carry_in = _shift_up(G, 1)
    return (s + carry_in) & 0xF


def _normalize(x):
    """Reduce arbitrary limb values (<= ~3600 from the matmul) to clean
    nibbles: two ripple passes bring limbs under 31, then exact settle."""
    for _ in range(2):
        lo = x & 0xF
        hi = x >> 4
        x = lo + jnp.concatenate([jnp.zeros_like(hi[:, :1]), hi[:, :-1]], axis=1)
    return _settle(x)


def _mul_const(x, M):
    """x (normalized limbs) * constant via MXU matmul, then normalize."""
    raw = jax.lax.dot_general(
        x.astype(jnp.int8),
        jnp.asarray(M),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return _normalize(raw)


def _mul5_add(x, addend_const: int):
    """x*5 + const — x*5 = x + (x << 2), all in limb domain."""
    shifted = ((x << 2) & 0xF) | jnp.concatenate(
        [jnp.zeros_like(x[:, :1]), (x[:, :-1] >> 2)], axis=1
    )
    add_limbs = _to_limbs_const(addend_const)
    return _normalize(x + shifted + add_limbs)


def _to_limbs_const(c: int):
    return jnp.asarray([(c >> (4 * j)) & 0xF for j in range(_NL)], jnp.int32)[None, :]


def _xor(a, b):
    return a ^ b


def _add(a, b):
    return _normalize(a + b)


def _rotl(x, r: int):
    """Rotate left by r bits: limb roll by r//4, then blend a (r%4)-bit
    intra-limb shift with the neighbor's spill."""
    q, s = divmod(r, 4)
    x = jnp.roll(x, q, axis=1)
    if s:
        spill = jnp.roll(x, 1, axis=1) >> (4 - s)
        x = ((x << s) & 0xF) | spill
    return x


def _shr(x, r: int):
    """Logical shift right by r bits (for fmix)."""
    q, s = divmod(r, 4)
    if q:
        x = jnp.concatenate([x[:, q:], jnp.zeros_like(x[:, :q])], axis=1)
    if s:
        upper = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
        x = (x >> s) | ((upper << (4 - s)) & 0xF)
    return x


def _fmix(h, M_a, M_b):
    h = _xor(h, _shr(h, 33))
    h = _mul_const(h, M_a)
    h = _xor(h, _shr(h, 33))
    h = _mul_const(h, M_b)
    h = _xor(h, _shr(h, 33))
    return h


def _u64_to_limbs(v):
    """u64[B] -> int32[B, 16] nibbles."""
    shifts = (jnp.arange(_NL, dtype=jnp.uint64) * jnp.uint64(4))[None, :]
    return ((v[:, None] >> shifts) & jnp.uint64(0xF)).astype(jnp.int32)


def _limbs_to_u64(x):
    shifts = (jnp.arange(_NL, dtype=jnp.uint64) * jnp.uint64(4))[None, :]
    return jnp.sum(x.astype(jnp.uint64) << shifts, axis=1, dtype=jnp.uint64)


@partial(jax.jit, static_argnames=("seed",))
def murmur3_bytes_batch_mxu(data: jax.Array, lengths: jax.Array, seed: int = 42):
    """Drop-in for ops.murmur3.murmur3_bytes_batch with MXU const-multiplies."""
    from fpmash_tpu.ops.murmur3 import _pack_u64

    data = data.astype(jnp.uint8)
    lengths = lengths.astype(jnp.int32)
    B, L = data.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    data = jnp.where(pos < lengths[:, None], data, jnp.uint8(0))
    pad = (-L) % 16
    if pad:
        data = jnp.pad(data, ((0, 0), (0, pad)))
        L += pad
    words = _pack_u64(data)  # [B, L/8]
    nblocks = lengths // 16
    tail_len = lengths % 16

    seed_limbs = jnp.broadcast_to(_to_limbs_const(seed), (B, _NL))
    h1 = seed_limbs
    h2 = seed_limbs
    pairs = words.reshape(B, L // 16, 2).transpose(1, 2, 0)

    def step(carry, xs):
        h1, h2, i = carry
        n1, n2 = _block(h1, h2, xs[0], xs[1])
        full = (i < nblocks)[:, None]
        h1 = jnp.where(full, n1, h1)
        h2 = jnp.where(full, n2, h2)
        return (h1, h2, i + 1), None

    (h1, h2, _), _ = jax.lax.scan(step, (h1, h2, jnp.int32(0)), pairs)

    widx = jnp.minimum((nblocks * 2).astype(jnp.int32), L // 8 - 1)
    k1t = jnp.take_along_axis(words, widx[:, None], axis=1)[:, 0]
    k2t = jnp.take_along_axis(words, jnp.minimum(widx + 1, L // 8 - 1)[:, None], axis=1)[:, 0]

    def _mask_word(w, nbytes):
        nbits = jnp.clip(nbytes, 0, 8).astype(jnp.uint64) * jnp.uint64(8)
        full = nbits >= jnp.uint64(64)
        mask = jnp.where(full, ~jnp.uint64(0), (jnp.uint64(1) << nbits) - jnp.uint64(1))
        return w & mask

    k1t = _mask_word(k1t, tail_len)
    k2t = _mask_word(k2t, tail_len - 8)

    k2 = _u64_to_limbs(k2t)
    k2 = _mul_const(k2, _M_C2)
    k2 = _rotl(k2, 33)
    k2 = _mul_const(k2, _M_C1)
    h2 = jnp.where((tail_len > 8)[:, None], _xor(h2, k2), h2)
    k1 = _u64_to_limbs(k1t)
    k1 = _mul_const(k1, _M_C1)
    k1 = _rotl(k1, 31)
    k1 = _mul_const(k1, _M_C2)
    h1 = jnp.where((tail_len > 0)[:, None], _xor(h1, k1), h1)

    return _finalize(h1, h2, lengths)


def _block(h1, h2, k1v, k2v):
    k1 = _u64_to_limbs(k1v)
    k2 = _u64_to_limbs(k2v)
    k1 = _mul_const(k1, _M_C1)
    k1 = _rotl(k1, 31)
    k1 = _mul_const(k1, _M_C2)
    h1 = _xor(h1, k1)
    h1 = _rotl(h1, 27)
    h1 = _add(h1, h2)
    h1 = _mul5_add(h1, 0x52DCE729)
    k2 = _mul_const(k2, _M_C2)
    k2 = _rotl(k2, 33)
    k2 = _mul_const(k2, _M_C1)
    h2 = _xor(h2, k2)
    h2 = _rotl(h2, 31)
    h2 = _add(h2, h1)
    h2 = _mul5_add(h2, 0x38495AB5)
    return h1, h2


def _finalize(h1, h2, byte_lengths):
    byte_len = _u64_to_limbs(byte_lengths.astype(jnp.uint64))
    h1 = _xor(h1, byte_len)
    h2 = _xor(h2, byte_len)
    h1 = _add(h1, h2)
    h2 = _add(h2, h1)
    h1 = _fmix(h1, _M_F1, _M_F2)
    h2 = _fmix(h2, _M_F1, _M_F2)
    h1 = _add(h1, h2)
    h2 = _add(h2, h1)
    return _limbs_to_u64(h1), _limbs_to_u64(h2)


@partial(jax.jit, static_argnames=("seed",))
def murmur3_u64_batch_mxu(vals: jax.Array, counts: jax.Array, seed: int = 42):
    """Drop-in for ops.murmur3.murmur3_u64_batch with MXU const-multiplies."""
    vals = vals.astype(jnp.uint64)
    counts = counts.astype(jnp.int32)
    B, L = vals.shape

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    vals = jnp.where(lane < counts[:, None], vals, jnp.uint64(0))
    if L % 2:
        vals = jnp.pad(vals, ((0, 0), (0, 1)))
        L += 1

    nblocks = counts // 2
    seed_limbs = jnp.broadcast_to(_to_limbs_const(seed), (B, _NL))
    h1 = seed_limbs
    h2 = seed_limbs

    pairs = vals.reshape(B, L // 2, 2).transpose(1, 2, 0)  # [L/2, 2, B]

    def step(carry, xs):
        h1, h2, i = carry
        n1, n2 = _block(h1, h2, xs[0], xs[1])
        full = (i < nblocks)[:, None]
        h1 = jnp.where(full, n1, h1)
        h2 = jnp.where(full, n2, h2)
        return (h1, h2, i + 1), None

    (h1, h2, _), _ = jax.lax.scan(step, (h1, h2, jnp.int32(0)), pairs)

    # odd tail: one u64 mixed into k1 only
    has_tail = ((counts % 2) == 1)[:, None]
    tail_idx = jnp.maximum(counts - 1, 0)
    k1t = jnp.take_along_axis(vals, tail_idx[:, None].astype(jnp.int32), axis=1)[:, 0]
    k1 = _u64_to_limbs(k1t)
    k1 = _mul_const(k1, _M_C1)
    k1 = _rotl(k1, 31)
    k1 = _mul_const(k1, _M_C2)
    h1 = jnp.where(has_tail, _xor(h1, k1), h1)

    return _finalize(h1, h2, counts * 8)
