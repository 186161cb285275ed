"""Unsorted merge-join walk kernel: equivalence with the literal walk.

The reference runs compareSketches' order-dependent merge-join over
fingerprint hash lists in FILE order (CommandDistance.cpp:376-400 fed by
initFromFingerprints, Sketch.cpp:56-151).  ops/walk.py steps the same
automaton for all pairs of a tile in lockstep; these tests pin it to the
literal Python walk (models/distance.py:51) on adversarially unsorted
inputs, and pin the `dist -fp` routing through it.
"""

import random

import numpy as np
import pytest

from fpmash_tpu.models.distance import compare_sketches
from fpmash_tpu.ops.walk import all_pairs_walk, pairwise_walk_common_denom


def _rand_list(rng, n, dup_pool=50):
    # small value pool forces duplicates and equal-element steps
    return rng.integers(0, dup_pool, size=n).astype(np.uint64)


@pytest.mark.parametrize("S", [4, 17, 100])
def test_walk_kernel_equals_literal_walk(S):
    rng = np.random.default_rng(S)
    refs = [_rand_list(rng, int(rng.integers(0, 2 * S + 1))) for _ in range(7)]
    qrys = [_rand_list(rng, int(rng.integers(0, 2 * S + 1))) for _ in range(5)]
    common, denom = all_pairs_walk(refs, qrys, S)
    for ri, A in enumerate(refs):
        for qi, B in enumerate(qrys):
            res = compare_sketches(A, B, 100, 100, S, 21, 4.0**21)
            assert (common[ri, qi], denom[ri, qi]) == (res.numer, res.denom), (ri, qi)


def test_walk_kernel_sorted_inputs_match_sorted_kernel():
    """On sorted distinct lists the walk kernel and the closed-form batch
    kernel must agree (they are the same semantics)."""
    from fpmash_tpu.ops.compare import all_pairs_common_denom

    rng = np.random.default_rng(3)
    S = 64
    refs = [np.sort(rng.choice(10**6, int(rng.integers(1, S + 1)), replace=False).astype(np.uint64)) for _ in range(6)]
    qrys = [np.sort(rng.choice(10**6, int(rng.integers(1, S + 1)), replace=False).astype(np.uint64)) for _ in range(6)]
    c1, d1 = all_pairs_walk(refs, qrys, S)
    c2, d2 = all_pairs_common_denom(refs, qrys, S)
    assert np.array_equal(c1, c2) and np.array_equal(d1, d2)


def test_walk_tiled_matches_untiled():
    rng = np.random.default_rng(11)
    refs = [_rand_list(rng, int(rng.integers(1, 40))) for _ in range(33)]
    qrys = [_rand_list(rng, int(rng.integers(1, 40))) for _ in range(21)]
    c1, d1 = all_pairs_walk(refs, qrys, 30)
    c2, d2 = all_pairs_walk(refs, qrys, 30, tile=8)
    assert np.array_equal(c1, c2) and np.array_equal(d1, d2)


def test_walk_empty_lists():
    refs = [np.array([], np.uint64), np.array([5, 3], np.uint64)]
    qrys = [np.array([3], np.uint64), np.array([], np.uint64)]
    common, denom = all_pairs_walk(refs, qrys, 10)
    for ri, A in enumerate(refs):
        for qi, B in enumerate(qrys):
            res = compare_sketches(A, B, 10, 10, 10, 21, 4.0**21)
            assert (common[ri, qi], denom[ri, qi]) == (res.numer, res.denom)


def test_dist_routes_unsorted_through_walk_kernel(monkeypatch):
    """all_pairs_dist with unsorted sketches must produce byte-identical
    results to the scalar backend AND actually take the device walk path."""
    from fpmash_tpu.models.distance import all_pairs_dist
    from fpmash_tpu.models.sketch import Reference, Sketch, SketchParams

    rng = np.random.default_rng(7)

    def mk_sketch(n):
        sk = Sketch()
        sk.params = SketchParams(
            kmer_size=1, sketch_size=50, alphabet="0123456789", noncanonical=True
        )
        for i in range(n):
            h = _rand_list(rng, int(rng.integers(2, 60)), dup_pool=1000)
            sk.references.append(
                Reference(name=f"r{i}", comment="", length=100, hashes=h)
            )
        return sk

    ref, qry = mk_sketch(9), mk_sketch(10)

    calls = []
    import fpmash_tpu.ops.walk as walk_mod

    orig = walk_mod.all_pairs_walk

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(walk_mod, "all_pairs_walk", spy)

    dev = [(ri, qi, r.numer, r.denom, r.distance, r.pvalue)
           for ri, qi, r in all_pairs_dist(ref, qry, backend="jax")]
    sca = [(ri, qi, r.numer, r.denom, r.distance, r.pvalue)
           for ri, qi, r in all_pairs_dist(ref, qry, backend="scalar")]
    assert dev == sca
    assert calls, "unsorted dist did not route through the walk kernel"


def test_walk_pallas_matches_xla_walk():
    """Shift-register Pallas kernel == lockstep XLA walk (interpret) on
    adversarially unsorted lists with duplicates and varied lengths."""
    import jax.numpy as jnp

    from fpmash_tpu.ops.walk_pallas import pairwise_walk_pallas

    rng = np.random.default_rng(4)
    # S buckets cover the pair-packing tiers: <=32 packs 4 pairs/row,
    # <=64 packs 2, >64 one pair/row; Q=8 with P=4 exercises row padding
    for S, cap in ((40, 30), (150, 1000), (64, 64), (20, 1000), (32, 16)):
        R = Q = 8
        ref = rng.integers(0, 60, size=(R, S)).astype(np.uint64)
        qry = rng.integers(0, 60, size=(Q, S)).astype(np.uint64)
        rl = rng.integers(0, S + 1, size=R).astype(np.int32)
        ql = rng.integers(0, S + 1, size=Q).astype(np.int32)
        c1, d1 = pairwise_walk_pallas(
            jnp.asarray(ref), jnp.asarray(rl), jnp.asarray(qry), jnp.asarray(ql),
            sketch_size=cap, interpret=True,
        )
        c0, d0 = pairwise_walk_common_denom(
            jnp.asarray(ref), jnp.asarray(rl), jnp.asarray(qry), jnp.asarray(ql),
            sketch_size=cap,
        )
        assert np.array_equal(np.asarray(c0), np.asarray(c1)), (S, cap)
        assert np.array_equal(np.asarray(d0), np.asarray(d1)), (S, cap)


def test_walk_route_selects_pallas_on_tpu(monkeypatch):
    import jax

    from fpmash_tpu.ops import walk as walk_mod
    from fpmash_tpu.ops import walk_pallas

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []
    orig = walk_pallas.pairwise_walk_pallas

    def fake(ref, rl, qry, ql, *, sketch_size, max_steps=None):
        calls.append(sketch_size)
        return walk_mod.pairwise_walk_common_denom(
            ref, rl, qry, ql, sketch_size=sketch_size
        )

    monkeypatch.setattr(walk_pallas, "pairwise_walk_pallas", fake)
    rng = np.random.default_rng(5)
    refs = [_rand_list(rng, 20) for _ in range(4)]
    c, d = all_pairs_walk(refs, refs, 30)
    assert calls == [30], "TPU backend did not select the pallas walk tile"
    jax.clear_caches()
