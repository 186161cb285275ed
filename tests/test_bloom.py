"""Memory-bounded Bloom admission (`sketch -b`) vs the reference's
MinHashHeap semantics (MinHashHeap.cpp:19-41,78-95)."""

import numpy as np


def test_bloom_admits_repeats_with_true_counts():
    """Ample memory -> no false positives: singles dropped, repeats kept
    with exact multiplicities (count 2 on admission + 1 per extra sight)."""
    from fpmash_tpu.ops.bloom import bloom_admit_counts

    rng = np.random.default_rng(0)
    singles = np.unique(rng.integers(1, 10**9, size=600, dtype=np.uint64))[:500]
    repeats = np.unique(rng.integers(10**9, 2 * 10**9, size=150, dtype=np.uint64))[:100]
    stream = np.concatenate([singles, np.repeat(repeats, 3)])
    rng.shuffle(stream)

    values, counts = bloom_admit_counts(stream, memory_bytes=1 << 22)
    assert np.array_equal(values, np.sort(repeats))
    assert np.all(counts == 3)
    assert np.all(values[:-1] < values[1:])  # ascending, ready for bottom-k


def test_bloom_memory_bound_causes_false_positives():
    """A tiny filter must admit some singles (count = occurrences + 1) —
    the documented trade of the reference's memory bound."""
    from fpmash_tpu.ops.bloom import bloom_admit_counts

    rng = np.random.default_rng(1)
    singles = np.unique(rng.integers(1, 10**12, size=6000, dtype=np.uint64))[:5000]
    rng.shuffle(singles)
    values, counts = bloom_admit_counts(singles, memory_bytes=64)  # 512 bits
    assert len(values) > 0  # saturated filter -> false positives
    assert np.all(counts == 2)  # 1 occurrence + 1 fp bonus
    assert len(values) < len(singles)  # but not everything


def test_sketch_b_flag_end_to_end():
    """reads-mode sketch with -b equals the exact min_cov=2 sketch when
    memory is ample (no false positives on this input)."""
    import random

    from fpmash_tpu.models.sketch import Sketch, SketchParams

    random.seed(5)
    genome = "".join(random.choice("ACGT") for _ in range(2000))
    # 3x coverage reads + one unique contaminant read
    reads = [("r%d" % i, "", genome[j : j + 400])
             for i, j in enumerate([0, 300, 700, 1100, 1500, 0, 300, 700, 1100, 1500, 0, 300])]
    reads.append(("contam", "", "".join(random.choice("ACGT") for _ in range(400))))

    exact = Sketch(SketchParams(kmer_size=15, sketch_size=200, reads=True, min_cov=2, counts=True))
    exact.init_from_sequences(reads, merge=True, backend="scalar")

    bloom = Sketch(SketchParams(kmer_size=15, sketch_size=200, reads=True, counts=True,
                                bloom_bytes=1 << 22))
    bloom.init_from_sequences(reads, merge=True, backend="scalar")

    assert np.array_equal(exact.references[0].hashes, bloom.references[0].hashes)
    assert np.array_equal(exact.references[0].counts, bloom.references[0].counts)


def test_bloom_10mb_bound_fp_tolerance_at_scale():
    """VERDICT r2 #10: a 10 MB -b on a large synthetic stream stays within
    the memory bound and matches exact -m 2 admission within a QUANTIFIED
    false-positive tolerance (MinHashHeap.cpp:19-41 arithmetic).

    With one probe and D distinct values inserted into m bits, the
    expected false-positive rate on a never-seen value is at most the
    final fill ratio D/m; singles probed earlier in the stream see an
    emptier filter, so D/m upper-bounds the average.  Assert observed
    fp-rate <= 2x that bound (slack for hash clustering) and > 0.1x
    (the filter is actually being exercised, not trivially empty).
    """
    import tracemalloc

    from fpmash_tpu.ops.bloom import bloom_admit_counts

    rng = np.random.default_rng(7)
    n_singles, n_repeats = 1_500_000, 100_000
    singles = np.unique(rng.integers(1, 1 << 62, size=n_singles + n_repeats + 1000,
                                     dtype=np.uint64))
    repeats = singles[:n_repeats]
    singles = singles[n_repeats : n_repeats + n_singles]
    stream = np.concatenate([singles, np.repeat(repeats, 2)])
    rng.shuffle(stream)

    mem = 10 << 20  # 10 MB -b
    tracemalloc.start()
    values, counts = bloom_admit_counts(stream, memory_bytes=mem)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    # memory: the filter is mem bytes; everything else is O(stream) work
    # arrays.  Peak must stay within stream-proportional + ~2x the bound
    # (a heap/table of all 1.6M distinct hashes at 16+ B each would blow
    # well past this).
    assert peak < stream.nbytes * 6 + 2 * mem, peak

    # every true repeat admitted; counts exact (+1 only on fp-first-sight)
    in_repeats = np.isin(values, repeats)
    assert in_repeats.sum() == n_repeats
    rep_counts = counts[in_repeats]
    assert np.all((rep_counts == 2) | (rep_counts == 3))  # 3 = fp bonus

    # quantified fp tolerance vs exact -m 2 admission
    fp_singles = (~in_repeats).sum()
    fp_rate = fp_singles / n_singles
    m_bits = mem * 8
    bound = (n_singles + n_repeats) / m_bits  # final fill ratio
    assert fp_rate <= 2 * bound, (fp_rate, bound)
    assert fp_rate >= 0.1 * bound, (fp_rate, bound)
    assert np.all(counts[~in_repeats] == 2)  # fp singles: 1 occurrence + 1
