"""AOT Mosaic lowering of every production Pallas kernel, on CPU.

Interpret-mode tests cannot catch Mosaic-only lowering failures; two bug
classes have actually shipped here:

* a bare Python int literal in a kernel promotes through int64 under x64
  and Mosaic's convert lowering recurses forever (RecursionError at
  compile — compare_pallas, 2026-08-21);
* ``jnp.sum`` over int32 accumulates in int64 under x64 (NumPy
  semantics), and Mosaic rejects 64-bit in-kernel types outright.

``jit(f).trace(args).lower(lowering_platforms=("tpu",))`` runs the full
Mosaic kernel lowering pipeline without TPU hardware, so both classes are
caught in CI.  It does NOT catch Mosaic mis-compiles (wrong values) —
that is scripts/chip_smoke.py's job on the real chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _lower_tpu(fn, *args):
    lowered = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text or "stablehlo" in text
    return text


def test_lower_fused_cfl_kernels():
    from fpmash_tpu.ops.fused_pallas import fingerprint_hashes_fused

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    w = jnp.asarray(lut[rng.integers(0, 4, size=(64, 100))])
    l = jnp.full((64,), 100, jnp.int32)
    for variant in ("inline", "split"):
        for pack in ("byte4", "dna16"):
            _lower_tpu(
                lambda w, l, v=variant, p=pack: fingerprint_hashes_fused(
                    w, l, seed=42, pack=p, variant=v
                ),
                w,
                l,
            )


def test_lower_icfl_kernels():
    from fpmash_tpu.ops.icfl_pallas import icfl_family_hashes_fused

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    w = jnp.asarray(lut[rng.integers(0, 4, size=(64, 100))])
    l = jnp.full((64,), 100, jnp.int32)
    for family in ("ICFL", "ICFL_COMB"):
        _lower_tpu(
            lambda w, l, f=family: icfl_family_hashes_fused(
                w, l, family=f, seed=42, pack="dna16"
            ),
            w,
            l,
        )


def test_lower_kmer_kernel():
    from fpmash_tpu.ops.kmers_pallas import canonical_murmur_pallas

    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.integers(0, 1 << 42, size=(256,), dtype=np.uint64))
    R = jnp.asarray(rng.integers(0, 1 << 42, size=(256,), dtype=np.uint64))
    _lower_tpu(lambda a, b: canonical_murmur_pallas(a, b, k=21), F, R)


@pytest.mark.parametrize("S", [128, 1000])
def test_lower_compare_kernel(S):
    from fpmash_tpu.ops.compare_pallas import pairwise_common_denom_pallas

    rng = np.random.default_rng(0)
    ref = jnp.asarray(
        np.sort(rng.integers(1, 1 << 30, size=(8, S), dtype=np.uint64), axis=1)
    )
    rl = jnp.full((8,), S, jnp.int32)
    _lower_tpu(
        lambda a, al, b, bl: pairwise_common_denom_pallas(
            a, al, b, bl, sketch_size=S
        ),
        ref,
        rl,
        ref,
        rl,
    )


def test_lower_compare_kernel_nontrivial_grid():
    """Grid (2, 2): BlockSpec index maps actually run (grid (1,1) folds
    them away).  Lowering alone cannot catch the x64 index-map i64
    promotion (that fails at Mosaic COMPILE time, chip_smoke's job), but
    this at least exercises the multi-block path end to end."""
    from fpmash_tpu.ops.compare_pallas import pairwise_common_denom_pallas

    rng = np.random.default_rng(0)
    S = 128
    ref = jnp.asarray(
        np.sort(rng.integers(1, 1 << 30, size=(16, S), dtype=np.uint64), axis=1)
    )
    rl = jnp.full((16,), S, jnp.int32)
    _lower_tpu(
        lambda a, al, b, bl: pairwise_common_denom_pallas(
            a, al, b, bl, sketch_size=S
        ),
        ref,
        rl,
        ref,
        rl,
    )


def test_lower_winnow_chunk_kernel():
    from fpmash_tpu.ops.winnow import _make_chunk_jit

    kernel = _make_chunk_jit()
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(1, 1 << 40, size=2048, dtype=np.uint64))
    prev = jnp.asarray(np.full(2048, -1, np.int64))
    _lower_tpu(
        lambda h, p: kernel(h, p, 0, 1985, ws=64, mins=4, C=256), h, prev
    )


def test_lower_positional_compare():
    from fpmash_tpu.ops.compare import pairwise_positional, positional_matches

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, 1 << 30, size=(16, 64), dtype=np.uint64))
    lens = jnp.full((16,), 64, jnp.int32)
    _lower_tpu(pairwise_positional, h, lens)
    _lower_tpu(positional_matches, h, lens, h, lens)


def test_lower_walk_kernel():
    from fpmash_tpu.ops.walk import pairwise_walk_common_denom

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 1 << 30, size=(8, 40), dtype=np.uint64))
    rl = jnp.full((8,), 40, jnp.int32)
    _lower_tpu(
        lambda a, al, b, bl: pairwise_walk_common_denom(
            a, al, b, bl, sketch_size=64
        ),
        ref,
        rl,
        ref,
        rl,
    )


def test_lower_walk_pallas_kernel():
    from fpmash_tpu.ops.walk_pallas import pairwise_walk_pallas

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 1 << 30, size=(16, 40), dtype=np.uint64))
    rl = jnp.full((16,), 40, jnp.int32)
    _lower_tpu(
        lambda a, al, b, bl: pairwise_walk_pallas(
            a, al, b, bl, sketch_size=64
        ),
        ref,
        rl,
        ref,
        rl,
    )


def test_lower_walk_pallas_kernel_packed_tiers():
    """AOT-lower the pair-packed walk layouts (P=4 at S<=32, P=1 at
    S>64) with nontrivial grids — Mosaic shape traps only appear at
    certain widths."""
    from fpmash_tpu.ops.walk_pallas import pairwise_walk_pallas

    rng = np.random.default_rng(0)
    for S in (24, 200):
        ref = jnp.asarray(rng.integers(0, 1 << 30, size=(16, S), dtype=np.uint64))
        rl = jnp.full((16,), S, jnp.int32)
        _lower_tpu(
            lambda a, al, b, bl: pairwise_walk_pallas(
                a, al, b, bl, sketch_size=1000
            ),
            ref,
            rl,
            ref,
            rl,
        )


def test_lower_packed_masked_kernel():
    from fpmash_tpu.ops.kmers_pallas import kmer_hashes_packed_masked_planes

    codes = jnp.asarray(np.random.default_rng(0).integers(0, 4, size=1 << 15).astype(np.uint32))
    _lower_tpu(
        lambda c: kmer_hashes_packed_masked_planes(
            c, jnp.uint32(1 << 20), jnp.int32(30000), k=21
        ),
        codes,
    )


def test_lower_packed_topk_kernel():
    """The in-kernel top-8 compaction adds Batcher/bitonic networks over
    sublane slices and static lane-half slices — new Mosaic surface."""
    from fpmash_tpu.ops.kmers_pallas import kmer_hashes_packed_topk_planes

    codes = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, size=1 << 15).astype(np.uint32)
    )
    _lower_tpu(
        lambda c: kmer_hashes_packed_topk_planes(
            c, jnp.uint32(1 << 20), jnp.int32(30000), k=21
        ),
        codes,
    )


def test_lower_packed_topk8r_kernel():
    from fpmash_tpu.ops.kmers_pallas import kmer_hashes_packed_topk8r_planes

    codes = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, size=1 << 15).astype(np.uint32)
    )
    _lower_tpu(
        lambda c: kmer_hashes_packed_topk8r_planes(
            c, jnp.uint32(1 << 20), jnp.int32(30000), k=21
        ),
        codes,
    )


def test_lower_pallas_row_sort():
    from fpmash_tpu.ops.sort_pallas import row_sort_planes_pallas

    k = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 32, size=(16, 4096), dtype=np.uint64).astype(np.uint32))
    _lower_tpu(lambda a, b: row_sort_planes_pallas(a, b), k, k)
