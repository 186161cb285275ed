"""End-to-end BASELINE config 1: DNA3 -> CFL fingerprint -> sketch ->
dist vs DNA2, entirely through this framework, checked against the same
computation on the reference's own sketch fixtures."""

import numpy as np
import pytest

from fpmash_tpu.models.distance import all_pairs_dist
from fpmash_tpu.models.sketch import Sketch, SketchParams


@pytest.mark.slow
def test_dna3_vs_dna2_dist_end_to_end(golden_dir):
    from fpmash_tpu.models.fingerprint import extract_reads

    # our pipeline: FASTA -> windows -> factorize -> hash -> sketch
    mine = {}
    for name in ("DNA2", "DNA3"):
        reads = extract_reads(str(golden_dir / "cfl" / f"{name}.fasta"), rev_com=True)
        sk = Sketch(SketchParams().for_fingerprint())
        sk.init_from_reads_fingerprint(reads, "CFL")
        mine[name] = sk

    # reference fixtures
    theirs = {}
    for name in ("DNA2", "DNA3"):
        sk = Sketch()
        sk.load_msh(str(golden_dir / "cfl" / f"{name}-sketch.msh"))
        theirs[name] = sk

    def dist_lines(ref, qry):
        out = []
        for ri, qi, res in all_pairs_dist(ref, qry, backend="scalar"):
            out.append(
                (
                    ref.references[ri].name,
                    qry.references[qi].name,
                    round(res.distance, 10),
                    res.numer,
                    res.denom,
                )
            )
        return out

    # NOTE: loading .msh truncates to sketch_size like the reference; our
    # fresh sketches keep all lines.  Truncate ours the same way before
    # comparing so both sides see what `mash dist` would see.
    for name in ("DNA2", "DNA3"):
        cap = mine[name].params.sketch_size
        for r in mine[name].references:
            r.hashes = r.hashes[:cap]

    got = dist_lines(mine["DNA3"], mine["DNA2"])
    exp = dist_lines(theirs["DNA3"], theirs["DNA2"])
    assert got == exp
    assert len(got) == 25  # 5 x 5 references
