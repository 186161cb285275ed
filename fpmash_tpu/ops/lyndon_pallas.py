"""Pallas TPU kernel for batched Duval factorization.

The Duval automaton (same formulation as ops.lyndon.cfl_lengths_onehot)
runs entirely in VMEM: a grid over row-blocks keeps the string block, the
per-row state vectors, and the boundary mask on-chip for the whole
``3L + 2``-step loop, so the sequential scan costs no HBM traffic at all —
only VPU elementwise work on ``[R, L]`` tiles.

Per-row dynamic reads ``s[k]``/``s[j]`` are one-hot masked reductions over
the lane (length) axis; boundary emission is a one-hot OR.  The factor
lengths are recovered from the boundary mask outside the kernel (one sort,
see ops.lyndon.cfl_lengths_sa's tail) where XLA is already efficient.

Falls back transparently to the XLA one-hot kernel where Pallas TPU is
unavailable (tests run it in interpreter mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROW_BLOCK = 256


def _duval_block_kernel(s_ref, n_ref, boundary_ref):
    R, L = s_ref.shape
    s = s_ref[:].astype(jnp.int32)
    n = n_ref[:].astype(jnp.int32)  # [R, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

    zero = jnp.int32(0)  # typed: bare Python ints become weak i64 under
    one = jnp.int32(1)  # x64 and hit a Mosaic convert-lowering recursion

    def body(t, state):
        i, j, k, emitting, boundary = state
        s_k = jnp.sum(jnp.where(iota == k, s, zero), axis=1, keepdims=True, dtype=jnp.int32)
        s_j = jnp.sum(jnp.where(iota == j, s, zero), axis=1, keepdims=True, dtype=jnp.int32)
        done = i >= n

        can_extend = (j < n) & (s_k <= s_j)
        k_scan = jnp.where(s_k < s_j, i, k + 1)

        p = j - k
        emit_now = i <= k
        mark = (emitting & jnp.logical_not(done) & emit_now) & (iota == i)
        boundary = boundary | mark

        i_emit = jnp.where(emit_now, i + p, i)
        reset = jnp.logical_not(emit_now)
        j_emit = jnp.where(reset, i + 1, j)
        k_emit = jnp.where(reset, i, k)

        scanning = jnp.logical_not(emitting) & jnp.logical_not(done)
        i_next = jnp.where(scanning | done, i, i_emit)
        j_next = jnp.where(scanning, jnp.where(can_extend, j + 1, j), jnp.where(done, j, j_emit))
        k_next = jnp.where(scanning, jnp.where(can_extend, k_scan, k), jnp.where(done, k, k_emit))
        emitting_next = jnp.where(scanning, jnp.logical_not(can_extend), jnp.where(done, emitting, emit_now))
        return (i_next, j_next, k_next, emitting_next, boundary)

    zeros = jnp.zeros((R, 1), jnp.int32)
    init = (
        zeros,
        zeros + 1,
        zeros,
        jnp.zeros((R, 1), bool),
        jnp.zeros((R, L), bool),
    )
    state = jax.lax.fori_loop(0, 3 * L + 2, body, init)
    boundary = state[4] & (iota < n)
    boundary_ref[:] = boundary.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def cfl_boundaries_pallas(batch: jax.Array, lengths: jax.Array, interpret: bool = False):
    """Boundary mask [B, L] int32 for each row's Duval factorization."""
    B, L = batch.shape
    # pad rows to a multiple of the block, lanes to a multiple of 128
    Lp = ((L + 127) // 128) * 128
    Bp = ((B + ROW_BLOCK - 1) // ROW_BLOCK) * ROW_BLOCK
    s = jnp.zeros((Bp, Lp), jnp.int32).at[:B, :L].set(batch.astype(jnp.int32))
    n = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(lengths.astype(jnp.int32))

    out = pl.pallas_call(
        _duval_block_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp), jnp.int32),
        grid=(Bp // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, Lp), lambda b: (b, 0)),
            pl.BlockSpec((ROW_BLOCK, 1), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, Lp), lambda b: (b, 0)),
        interpret=interpret,
    )(s, n)
    return out[:B, :L]


@partial(jax.jit, static_argnames=("interpret",))
def cfl_lengths_pallas(batch: jax.Array, lengths: jax.Array, interpret: bool = False):
    """Duval factor lengths via the Pallas boundary kernel.

    Same contract as ops.lyndon.cfl_lengths: returns
    ``(fac_len[B, L] int32, fac_count[B] int32)``.
    """
    B, L = batch.shape
    n = lengths.astype(jnp.int32)
    boundary = cfl_boundaries_pallas(batch, lengths, interpret=interpret) > 0
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    bpos = jnp.where(boundary, pos, L)
    bpos = jnp.sort(bpos, axis=-1)
    nxt = jnp.concatenate([bpos[:, 1:], jnp.full((B, 1), L, jnp.int32)], axis=1)
    fac_len = jnp.maximum(jnp.minimum(nxt, n[:, None]) - jnp.minimum(bpos, n[:, None]), 0)
    fac_count = jnp.sum(boundary, axis=-1, dtype=jnp.int32)
    return fac_len, fac_count
