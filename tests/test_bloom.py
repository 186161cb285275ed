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
