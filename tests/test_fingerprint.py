"""Fingerprint pipeline parity against the vendored lyn2vec goldens.

Fixture history (verified empirically): the goldens in
tests/golden/lyn2vec_basic were generated from successive versions of
``example_transcripts_genes.fa`` — the CFL / CFL_ICFL-10 files cover the 11
ENSG transcripts, the *_COMB files only the first 10, and the later-added
"CIUCCIODIBOSCO" records postdate all of them.  DNA3 fixtures were generated
with ``rev_com=true`` (forward ``_0`` lines only — see
:func:`fpmash_tpu.models.fingerprint.extract_reads`).
"""

import pytest

from fpmash_tpu.models.fingerprint import (
    chunk_split,
    extract_reads,
    fingerprint_reads,
    shift_windows,
)


@pytest.fixture(scope="module")
def ensg_reads(golden_dir):
    reads = extract_reads(
        str(golden_dir / "lyn2vec_basic" / "example_transcripts_genes.fa"),
        rev_com=False,
    )
    return [r for r in reads if r[0].startswith("ENSG")]


def test_shift_windows():
    assert shift_windows("ACGT", 100) == ["ACGT"]
    w = shift_windows("A" * 150, 100)
    assert len(w) == 150 and all(len(x) == 100 for x in w)
    # cyclic wrap: window starting at 140 wraps 90 chars from the front
    s = "".join(chr(65 + i % 26) for i in range(120))
    w = shift_windows(s, 100)
    assert w[30] == s[30:120] + s[:10]


def test_chunk_split():
    assert chunk_split("A" * 299, 300) == ["A" * 299]
    parts = chunk_split("A" * 650, 300)
    assert [len(p) for p in parts] == [300, 300, 50]


@pytest.mark.parametrize(
    "fact,fname,n_reads",
    [
        ("CFL", "fingerprint_CFL.txt", 11),  # full file
        ("CFL_ICFL-10", "fingerprint_CFL_ICFL-10.txt", 3),  # prefix (speed)
        ("ICFL_COMB", "fingerprint_ICFL_COMB.txt", 3),
        ("CFL_ICFL_COMB-20", "fingerprint_CFL_ICFL_COMB-20.txt", 3),
    ],
)
def test_basic_pipeline_matches_goldens(golden_dir, ensg_reads, fact, fname, n_reads):
    fp, fac = fingerprint_reads(
        ensg_reads[:n_reads], fact, backend="scalar", with_factors=True
    )
    golden = open(golden_dir / "lyn2vec_basic" / fname).readlines()
    assert fp == golden[: len(fp)] and len(fp) > 0
    golden_fac = open(golden_dir / "lyn2vec_basic" / ("fact_" + fname)).readlines()
    assert [l.rstrip("\n") for l in fac] == [
        l.rstrip("\n") for l in golden_fac[: len(fac)]
    ]


@pytest.mark.parametrize(
    "fact",
    [
        "ICFL",
        "CFL_COMB",
        "CFL_ICFL-20",
        "CFL_ICFL-30",
        "CFL_ICFL_COMB-10",
        "CFL_ICFL_COMB-30",
    ],
)
def test_all_factorization_families_match_goldens(golden_dir, fact):
    """Byte parity for the 6 families the reference snapshot shipped no
    outputs for.  The fixtures were produced by *running* the reference's
    own lyn2vec (``lyn2vec.py --type basic --rev_comb true`` over
    example_transcripts_genes.fa) and vendoring the result gzipped; together
    with the 4 checked-in reference files this closes the golden matrix over
    all 10 factorization names (lyn2vec.py:47-72)."""
    import gzip

    reads = extract_reads(
        str(golden_dir / "lyn2vec_basic" / "example_transcripts_genes.fa"),
        rev_com=True,
    )
    fp, fac = fingerprint_reads(
        reads, fact, backend="auto", with_factors=(fact == "ICFL")
    )
    with gzip.open(
        golden_dir / "lyn2vec_basic" / f"fingerprint_{fact}.txt.gz", "rt"
    ) as fh:
        golden = fh.readlines()
    assert fp == golden
    if fact == "ICFL":
        with gzip.open(
            golden_dir / "lyn2vec_basic" / "fact_fingerprint_ICFL.txt.gz", "rt"
        ) as fh:
            golden_fac = fh.readlines()
        assert [l.rstrip() for l in fac] == [l.rstrip() for l in golden_fac]


def test_dna3_cfl_matches_golden(golden_dir):
    reads = extract_reads(str(golden_dir / "cfl" / "DNA3.fasta"), rev_com=True)
    fp, _ = fingerprint_reads(reads, "CFL", backend="scalar")
    golden = open(golden_dir / "cfl" / "DNA3-CFL.txt").readlines()
    assert fp == golden


def test_jax_backend_matches_scalar(golden_dir):
    reads = extract_reads(str(golden_dir / "cfl" / "DNA3.fasta"), rev_com=True)[:1]
    fp_s, _ = fingerprint_reads(reads, "CFL", backend="scalar")
    fp_j, _ = fingerprint_reads(reads, "CFL", backend="jax")
    assert fp_s == fp_j


def test_long_pipeline_format():
    """Generalized pipeline byte format (cross-validated against the
    reference's compute_long_fingerprint_by_list at development time):
    double space after the ID, ' | ' after every chunk including the last."""
    from fpmash_tpu.models.fingerprint import fingerprint_long_reads

    reads = [("R0", "GATTACA" * 50), ("R1", "ACGT" * 20)]
    fp, fac = fingerprint_long_reads(reads, "CFL", split=300, backend="scalar", with_factors=True)
    assert fp[0] == (
        "R0  1 3 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 7 "
        "7 7 7 7 7 7 7 7 7 7 7 7 2 | 5 7 7 7 7 7 7 2 1 | \n"
    )
    assert fp[1] == "R1  4 4 4 4 4 4 4 4 4 4 4 4 4 4 4 4 4 4 4 4 | \n"
    assert fac[1] == "R1  " + " ".join(["ACGT"] * 20) + " | \n"


def test_extract_long_reads_revcomp(golden_dir, tmp_path):
    """Long-read extraction emits both _0 and _1 lines with rev_com
    (read_long_fasta_2_steps, fingerprint_utils.py:165-201)."""
    from fpmash_tpu.models.fingerprint import extract_long_reads

    f = tmp_path / "t.fasta"
    f.write_text(">seq1 comment\nAACG\n")
    out = extract_long_reads(str(f), rev_com=True)
    assert out == [("seq1_0", "AACG"), ("seq1_1", "CGTT")]


@pytest.mark.parametrize("fact", ["CFL", "ICFL", "CFL_ICFL-20", "ICFL_COMB", "CFL_ICFL_COMB-10"])
def test_native_backend_matches_scalar(golden_dir, fact):
    import fpmash_tpu.utils.native_lyndon as nl

    if not nl.available():
        pytest.skip("native library not built")
    reads = extract_reads(str(golden_dir / "cfl" / "DNA3.fasta"), rev_com=True)[:1]
    fp_s, fac_s = fingerprint_reads(reads, fact, backend="scalar", with_factors=True)
    fp_n, fac_n = fingerprint_reads(reads, fact, backend="native", with_factors=True)
    assert fp_s == fp_n
    assert fac_s == fac_n
