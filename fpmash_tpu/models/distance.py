"""Distance / containment / screen computations over sketches.

Host-level orchestration of the comparison kernels, mirroring the four
comparison semantics of the reference:

* :func:`compare_sketches` — the Mash distance merge-join with union cap
  (CommandDistance.cpp:365-430).  The walk is replicated literally so that
  the reference's order-dependent behavior on *unsorted* fingerprint lists
  (``dist -fp`` on .txt inputs, SURVEY §2.3.4) is reproduced, not "fixed".
* :func:`compare_fingerprints` — positional equality over unsorted lists,
  ``d = 1 - matches/minSize`` (CommandTriangle.cpp:265-302).
* :func:`contain_sketches` — containment score ``common/j`` with error
  ``1/sqrt(j)`` (CommandContain.cpp:368-415).
* screen — per-reference containment of sketch hashes in a streamed query
  k-mer universe (CommandScreen.cpp:48-257); see commands/screen.py.

Batched all-pairs execution with the vectorized kernel lives in
``fpmash_tpu.ops.compare``; it is verified equivalent to the walk for
sorted inputs (the only case the reference produces meaningful output for).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from fpmash_tpu.scalar.stats import chisq_sf, mash_pvalue


@dataclass
class PairResult:
    passed: bool = False
    numer: int = 0
    denom: int = 0
    distance: float = 1.0
    pvalue: float = 1.0


def mash_distance(jaccard: float, kmer_size: int) -> float:
    """d = -ln(2j/(1+j))/k, clamped (CommandDistance.cpp:403-414)."""
    if jaccard == 1.0:
        return 0.0
    if jaccard == 0.0:
        return 1.0
    d = -math.log(2.0 * jaccard / (1.0 + jaccard)) / kmer_size
    return min(d, 1.0)


def compare_sketches(
    ref_hashes: np.ndarray,
    qry_hashes: np.ndarray,
    ref_length: int,
    qry_length: int,
    sketch_size: int,
    kmer_size: int,
    kmer_space: float,
    max_distance: float = -1.0,
    max_pvalue: float = -1.0,
) -> PairResult:
    """Literal merge-join walk of CommandDistance::compareSketches."""
    out = PairResult()
    A = ref_hashes
    B = qry_hashes
    i = j = 0
    common = 0
    denom = 0
    la, lb = len(A), len(B)
    while denom < sketch_size and i < la and j < lb:
        a, b = A[i], B[j]
        if a < b:
            i += 1
        elif b < a:
            j += 1
        else:
            i += 1
            j += 1
            common += 1
        denom += 1
    if denom < sketch_size:
        if i < la:
            denom += la - i
        if j < lb:
            denom += lb - j
        if denom > sketch_size:
            denom = sketch_size
    jaccard = common / denom if denom else 0.0
    distance = mash_distance(jaccard, kmer_size) if denom else 1.0
    if common == denom:
        distance = 0.0
    if 0 <= max_distance < distance:
        return out
    out.numer = common
    out.denom = denom
    out.distance = distance
    out.pvalue = mash_pvalue(common, ref_length, qry_length, kmer_space, denom)
    if 0 <= max_pvalue < out.pvalue:
        return out
    out.passed = True
    return out


def compare_fingerprints(
    hashes1: np.ndarray,
    hashes2: np.ndarray,
    max_distance: float = 1.0,
    max_pvalue: float = 1.0,
) -> PairResult:
    """Positional fingerprint comparison (CommandTriangle.cpp:265-302):
    matches counted index-by-index over the unsorted lists,
    ``d = 1 - matches/minSize``, p = chisq_Q(matches, 1)."""
    out = PairResult()
    n = min(len(hashes1), len(hashes2))
    matches = int(np.sum(hashes1[:n] == hashes2[:n])) if n else 0
    out.distance = 1.0 - (matches / n) if n else 1.0
    out.pvalue = chisq_sf(matches, 1)
    out.numer = matches
    out.denom = n
    out.passed = out.distance <= max_distance and out.pvalue <= max_pvalue
    return out


def contain_sketches(ref_hashes: np.ndarray, qry_hashes: np.ndarray) -> tuple[float, float]:
    """Containment of query in reference (CommandContain.cpp:368-415):
    returns ``(score, error)`` = ``(common/denom, 1/sqrt(j))``."""
    A, B = ref_hashes, qry_hashes
    denom = min(len(A), len(B))
    i = j = common = 0
    steps = 0
    # Each counted step advances j exactly once, so j <= denom <= len(B);
    # advancing only i is uncounted (steps-- in the reference).
    while steps < denom and i < len(A):
        if A[i] < B[j]:
            i += 1
            continue
        if B[j] < A[i]:
            j += 1
        else:
            i += 1
            j += 1
            common += 1
        steps += 1
    error = 1.0 / math.sqrt(j) if j else 1.0
    return (common / denom if denom else 0.0), error


def all_pairs_dist(
    ref_sketch,
    qry_sketch,
    max_distance: float = -1.0,
    max_pvalue: float = -1.0,
    backend: str = "auto",
):
    """Ref x query pairwise Mash distance (CommandDistance::run semantics).

    Yields ``(ref_index, qry_index, PairResult)`` in output order: queries
    outer, references inner (CommandDistance.cpp:335-360).
    The effective sketch size is the min of the two (CommandDistance.cpp:343).
    """
    sketch_size = min(ref_sketch.params.sketch_size, qry_sketch.params.sketch_size)
    k = ref_sketch.params.kmer_size
    space = ref_sketch.params.kmer_space

    n_pairs = len(ref_sketch) * len(qry_sketch)
    use_device = backend == "jax" or (backend == "auto" and n_pairs >= 64)
    if use_device:
        # sorted lists (every classic sketch) take the closed-form batch
        # kernel; unsorted fingerprint lists take the batched literal-walk
        # kernel (ops/walk.py) — both asserted equivalent to the Python
        # walk in tests
        sorted_ = _all_sorted(ref_sketch) and _all_sorted(qry_sketch)
        yield from _all_pairs_dist_device(
            ref_sketch,
            qry_sketch,
            sketch_size,
            k,
            space,
            max_distance,
            max_pvalue,
            sorted_=sorted_,
        )
        return

    for qi, q in enumerate(qry_sketch.references):
        for ri, r in enumerate(ref_sketch.references):
            res = compare_sketches(
                r.hashes,
                q.hashes,
                r.length,
                q.length,
                sketch_size,
                k,
                space,
                max_distance,
                max_pvalue,
            )
            yield ri, qi, res


def _all_sorted(sketch) -> bool:
    return all(
        len(r.hashes) < 2 or bool(np.all(r.hashes[:-1] <= r.hashes[1:]))
        for r in sketch.references
    )


def _all_pairs_dist_device(
    ref_sketch, qry_sketch, sketch_size, k, space, max_distance, max_pvalue,
    sorted_=True,
):
    refs = [r.hashes for r in ref_sketch.references]
    qrys = [q.hashes for q in qry_sketch.references]
    if sorted_:
        from fpmash_tpu.ops.compare import all_pairs_common_denom

        common, denom = all_pairs_common_denom(refs, qrys, sketch_size)
    else:
        from fpmash_tpu.ops.walk import all_pairs_walk

        common, denom = all_pairs_walk(refs, qrys, sketch_size)
    for qi, q in enumerate(qry_sketch.references):
        for ri, r in enumerate(ref_sketch.references):
            c, d = int(common[ri, qi]), int(denom[ri, qi])
            out = PairResult()
            jaccard = c / d if d else 0.0
            distance = 0.0 if c == d else mash_distance(jaccard, k)
            if 0 <= max_distance < distance:
                yield ri, qi, out
                continue
            out.numer, out.denom, out.distance = c, d, distance
            out.pvalue = mash_pvalue(c, r.length, q.length, space, d)
            if 0 <= max_pvalue < out.pvalue:
                yield ri, qi, out
                continue
            out.passed = True
            yield ri, qi, out
