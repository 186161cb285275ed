"""CLI-level golden tests: the reference's `make test` workflows through
the fpmash CLI (Makefile.in:98-118)."""

import pytest

from fpmash_tpu.cli import main


@pytest.fixture(scope="module")
def genomes_msh(golden_dir, tmp_path_factory):
    """Rebuild the 3-genome reference sketch with the golden's names."""
    from fpmash_tpu.models.sketch import Sketch

    ref = Sketch()
    for name in ("genome1.fna.msh", "genome2.fna.msh", "genome3.fna.msh"):
        ref.load_msh(golden_dir / "mash_ref" / name)
    for r, n in zip(ref.references, ["genome1.fna", "genome2.fna", "genome3.fna"]):
        r.name = n
    out = tmp_path_factory.mktemp("msh") / "genomes.msh"
    ref.write_msh(str(out))
    return str(out)


@pytest.mark.slow
def test_cli_screen_matches_golden(golden_dir, genomes_msh, capsys):
    """`mash screen genomes.msh reads1.fastq reads2.fastq` golden
    (test/ref/screen_ref.txt)."""
    rc = main(
        [
            "screen",
            genomes_msh,
            str(golden_dir / "new_data" / "reads1.fastq"),
            str(golden_dir / "new_data" / "reads2.fastq"),
        ]
    )
    assert rc == 0
    golden = open(golden_dir / "mash_ref" / "screen_ref.txt").read()
    assert capsys.readouterr().out == golden


def test_cli_dist_matches_golden(golden_dir, genomes_msh, capsys):
    """`mash dist genomes.msh reads.msh` golden (test/ref/genomes.dist)."""
    rc = main(["dist", genomes_msh, str(golden_dir / "new_data" / "reads.msh")])
    assert rc == 0
    golden = open(golden_dir / "mash_ref" / "genomes.dist").read()
    assert capsys.readouterr().out == golden


def test_cli_sketch_fp_info_roundtrip(golden_dir, tmp_path, capsys):
    """sketch -fp -> info -d reproduces the DNA3 JSON hash lists."""
    out = tmp_path / "dna3"
    rc = main(
        ["sketch", "-fp", str(golden_dir / "cfl" / "DNA3-CFL.txt"), "-o", str(out)]
    )
    assert rc == 0
    rc = main(["info", str(out) + ".msh", "-d"])
    assert rc == 0
    from fpmash_tpu.utils.info_json import load_info_json

    mine = load_info_json(capsys.readouterr().out)
    golden = load_info_json(str(golden_dir / "cfl" / "DNA3-sketch.json"))
    assert mine["kmer"] == 1 and mine["hashBits"] == 32
    for m, g in zip(mine["sketches"], golden["sketches"]):
        assert m["name"] == g["name"]
        # info -d on OUR load path also truncates to sketch_size on load
        assert m["hashes"][: len(g["hashes"])] == g["hashes"]


def test_cli_paste_fp_requires_sibling(golden_dir, tmp_path, capsys):
    import shutil

    txt = tmp_path / "fp.txt"
    shutil.copy(golden_dir / "cfl" / "DNA3-CFL.txt", txt)
    # no sibling .msh -> error
    rc = main(["paste", "-fp", str(txt), str(tmp_path / "out")])
    assert rc == 1
    # create sibling and retry
    main(["sketch", "-fp", str(txt), "-o", str(tmp_path / "fp")])
    rc = main(["paste", "-fp", str(txt), str(tmp_path / "out"), "-o"])
    assert rc == 0
    from fpmash_tpu.utils.msh import read_msh

    m = read_msh(str(tmp_path / "out.msh"))
    assert len(m.references) == 5


def test_cli_bounds_runs(capsys):
    rc = main(["bounds", "-k", "21", "-p", "0.99"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Mash distance" in out and "Screen distance" in out
    assert "1000000" in out


def test_cli_triangle_fp(golden_dir, capsys):
    rc = main(["triangle", "-fp", str(golden_dir / "cfl" / "DNA3-CFL.txt")])
    assert rc == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines[0] == "\t5"
    assert len(lines) == 6
    # row i has i distances
    assert len(lines[2].split("\t")) == 2


def test_cli_triangle_fp_chisq_pvalues(golden_dir, capsys):
    """Pin triangle -fp's chi-squared p-value (CommandTriangle.cpp:297
    ``gsl_cdf_chisq_Q(matches, 1)``) end-to-end.

    Oracle: for df=1, ``gsl_cdf_chisq_Q(x, 1) == erfc(sqrt(x/2))`` exactly;
    the pinned strings below are that identity evaluated with the C library
    erfc and formatted with the reference's ``%g`` — independent of both
    scipy and fpmash's own stats code.
    """
    import math

    rc = main(
        [
            "triangle",
            "-fp",
            "-E",
            str(golden_dir / "cfl" / "DNA1-CFL.txt"),
            str(golden_dir / "cfl" / "DNA2-CFL.txt"),
            str(golden_dir / "cfl" / "DNA3-CFL.txt"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    lines = {tuple(l.split("\t")[:2]): l.split("\t") for l in out.splitlines()}
    # matches=1 -> p = erfc(sqrt(0.5)) = 0.317311; matches=5 -> 0.0253473
    row = lines[("G00000ME0DIJTL_0", "G00000DFTZD2H0_0")]
    assert row[2:] == ["0.9995", "0.317311", "1/2000"]
    row = lines[("G00000PIKPASEI_0", "G00000K8TOX811_0")]
    assert row[2:] == ["0.9975", "0.0253473", "5/2000"]
    # the analytic identity itself, across the whole small-match range
    from fpmash_tpu.scalar.stats import chisq_sf

    for m in range(0, 12):
        assert chisq_sf(m, 1) == pytest.approx(
            math.erfc(math.sqrt(m / 2.0)), rel=1e-12
        )


def test_cli_generate_fingerprint_mapping(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(
        ["generate", "--path", "dna", "--format", "fasta", "--size", "300",
         "--number_dna_generate", "2", "--gc_content", "0.5", "--seed", "3"]
    )
    assert rc == 0
    rc = main(
        ["fingerprint", "--fasta", "dna.fasta", "--type_factorization", "CFL",
         "--rev_comb", "true", "--backend", "scalar"]
    )
    assert rc == 0
    lines = open("fingerprint_CFL.txt").readlines()
    assert len(lines) == 600  # 2 reads x 300 shifts
    rc = main(["mapping", "--fingerprint", "fingerprint_CFL.txt"])
    assert rc == 0
    mapped = open("mapped_fingerprint_CFL.txt.txt").readlines()
    assert mapped[0].startswith(">")
