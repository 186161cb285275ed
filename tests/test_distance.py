"""Distance-path parity: the genomes.dist golden, kernel vs walk."""

import random

import numpy as np
import pytest

from fpmash_tpu.models.distance import (
    all_pairs_dist,
    compare_fingerprints,
    compare_sketches,
    contain_sketches,
)
from fpmash_tpu.models.sketch import Sketch
from fpmash_tpu.scalar.stats import format_g


@pytest.fixture(scope="module")
def genome_sketches(golden_dir):
    ref = Sketch()
    for name in ("genome1.fna.msh", "genome2.fna.msh", "genome3.fna.msh"):
        ref.load_msh(golden_dir / "mash_ref" / name)
    qry = Sketch()
    qry.load_msh(golden_dir / "new_data" / "reads.msh")
    return ref, qry


@pytest.mark.parametrize("backend", ["scalar", "jax"])
def test_dist_matches_golden(golden_dir, genome_sketches, backend):
    """`mash dist genomes.msh reads.msh` == test/ref/genomes.dist, including
    p-values to 6 significant digits (4.48626e-214 etc.)."""
    ref, qry = genome_sketches
    lines = []
    for ri, qi, res in all_pairs_dist(ref, qry, backend=backend):
        name = ref.references[ri].name.split("/")[-1]
        lines.append(
            f"{name}\t{qry.references[qi].name}\t{format_g(res.distance)}"
            f"\t{format_g(res.pvalue)}\t{res.numer}/{res.denom}"
        )
    golden = open(golden_dir / "mash_ref" / "genomes.dist").read().splitlines()
    assert lines == golden


def test_kernel_equals_walk_random():
    """Batched union-rank kernel == literal merge-join on random sorted
    distinct lists, across sizes and caps."""
    from fpmash_tpu.ops.compare import all_pairs_common_denom

    random.seed(17)
    for S in (5, 16, 100):
        refs, qrys = [], []
        for _ in range(6):
            refs.append(
                np.array(sorted(random.sample(range(1000), random.randint(1, S))), np.uint64)
            )
            qrys.append(
                np.array(sorted(random.sample(range(1000), random.randint(1, S))), np.uint64)
            )
        common, denom = all_pairs_common_denom(refs, qrys, S)
        for ri, A in enumerate(refs):
            for qi, B in enumerate(qrys):
                res = compare_sketches(A, B, 100, 100, S, 21, 4.0**21)
                assert (common[ri, qi], denom[ri, qi]) == (res.numer, res.denom), (
                    ri,
                    qi,
                    S,
                )


def test_tiled_all_pairs_matches_untiled():
    """The tiled large-scale path produces identical results to one shot."""
    from fpmash_tpu.ops.compare import all_pairs_common_denom

    rng = np.random.default_rng(9)
    S = 32
    refs = [np.sort(rng.choice(10**6, S, replace=False).astype(np.uint64)) for _ in range(70)]
    qrys = [np.sort(rng.choice(10**6, S, replace=False).astype(np.uint64)) for _ in range(45)]
    c1, d1 = all_pairs_common_denom(refs, qrys, S)  # single shot (<= tile^2)
    c2, d2 = all_pairs_common_denom(refs, qrys, S, tile=16)  # forced tiling
    assert np.array_equal(c1, c2) and np.array_equal(d1, d2)


def test_compare_fingerprints_positional():
    a = np.array([1, 2, 3, 4], np.uint64)
    b = np.array([1, 9, 3], np.uint64)
    res = compare_fingerprints(a, b)
    assert res.numer == 2 and res.denom == 3
    assert res.distance == pytest.approx(1 - 2 / 3)


def test_contain_full_containment():
    a = np.array(sorted(range(0, 100)), np.uint64)
    b = np.array(sorted(range(10, 20)), np.uint64)
    score, err = contain_sketches(a, b)
    assert score == 1.0


def test_triangle_fp_golden(golden_dir):
    """Positional comparison of DNA3's five fingerprint sketches is
    deterministic; spot-check symmetry and self-distance."""
    from fpmash_tpu.models.sketch import SketchParams

    sk = Sketch(SketchParams().for_fingerprint())
    sk.init_from_fingerprints([str(golden_dir / "cfl" / "DNA3-CFL.txt")])
    r = sk.references
    self_res = compare_fingerprints(r[0].hashes, r[0].hashes)
    assert self_res.distance == 0.0 and self_res.numer == len(r[0].hashes)
    ab = compare_fingerprints(r[0].hashes, r[1].hashes)
    ba = compare_fingerprints(r[1].hashes, r[0].hashes)
    assert ab.numer == ba.numer and ab.denom == ba.denom
