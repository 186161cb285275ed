"""Command coverage: taxscreen, contain, dist table/sequence modes,
individual sketching, info listing."""

import numpy as np
import pytest

from fpmash_tpu.cli import main
from fpmash_tpu.models.sketch import Sketch, SketchParams


@pytest.fixture()
def small_world(tmp_path):
    """Two tiny genomes + a read set + sketches, for end-to-end commands."""
    import random

    random.seed(77)
    g1 = "".join(random.choice("ACGT") for _ in range(3000))
    g2 = "".join(random.choice("ACGT") for _ in range(3000))
    (tmp_path / "g1.fasta").write_text(f">g1 taxid 11\n{g1}\n")
    (tmp_path / "g2.fasta").write_text(f">g2 taxid 12\n{g2}\n")
    # reads drawn from g1
    reads = []
    for i in range(80):
        start = random.randint(0, len(g1) - 150)
        reads.append(f"@r{i}\n{g1[start:start+150]}\n+\n{'I'*150}")
    (tmp_path / "reads.fastq").write_text("\n".join(reads) + "\n")
    main(["sketch", str(tmp_path / "g1.fasta"), str(tmp_path / "g2.fasta"),
          "-o", str(tmp_path / "refs"), "-s", "200"])
    return tmp_path


def test_dist_table_mode(small_world, capsys):
    rc = main(["dist", "-t", str(small_world / "refs.msh"), str(small_world / "refs.msh")])
    assert rc == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines[0].startswith("#query\t")
    # self-distance diagonal should be 0
    row1 = lines[1].split("\t")
    assert row1[1] == "0"


def test_dist_sequence_query(small_world, capsys):
    """dist with a raw FASTA query sketches it on the fly with the
    reference sketch's parameters."""
    rc = main(["dist", str(small_world / "refs.msh"), str(small_world / "g1.fasta")])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 2
    first = out[0].split("\t")
    assert first[2] == "0"  # g1 vs itself


def test_contain(small_world, capsys):
    rc = main(["contain", "-e", "1.0",
               str(small_world / "refs.msh"), str(small_world / "refs.msh")])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 4
    # self-containment scores are 1
    scores = {tuple(l.split("\t")[2:4]): l.split("\t")[0] for l in out}
    g1 = str(small_world / "g1.fasta")
    assert scores[(g1, g1)] == "1"


def test_contain_default_error_threshold_filters(small_world, capsys):
    """Default -e is 0.05 (CommandContain.cpp:51): the two unrelated-genome
    cross pairs have high error bounds (1/sqrt(common)) and are suppressed;
    the self pairs (error 1/sqrt(200) ~ 0.07 > 0.05 too at s=200) — so
    check against explicit thresholds instead: default output is a strict
    subset of -e 1.0 output, equal to the -e 0.05 output."""
    main(["contain", str(small_world / "refs.msh"), str(small_world / "refs.msh")])
    default_out = capsys.readouterr().out
    main(["contain", "-e", "0.05",
          str(small_world / "refs.msh"), str(small_world / "refs.msh")])
    explicit_out = capsys.readouterr().out
    main(["contain", "-e", "1.0",
          str(small_world / "refs.msh"), str(small_world / "refs.msh")])
    loose_out = capsys.readouterr().out
    assert default_out == explicit_out
    assert len(default_out.splitlines()) < len(loose_out.splitlines())


def test_screen_fp_saturation(small_world, tmp_path, capsys):
    """-s appends a comma-separated list of one 0 per shared hit
    (CommandScreen.cpp:43, :147, :241-245 — the fork's live code pushes
    literal zeros during counting)."""
    fp = tmp_path / "q.txt"
    fp.write_text("q1 3 4 5\nq1 4 5 6\nq2 9 9\n")
    main(["sketch", "-fp", str(fp), "-o", str(tmp_path / "fpref")])
    rc = main(["screen", "-s", "-fp", str(tmp_path / "fpref.msh"), str(fp)])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 2
    f0 = out[0].split("\t")
    shared = int(f0[1].split("/")[0])
    assert f0[6] == ",".join(["0"] * shared) and shared == 2
    f1 = out[1].split("\t")
    assert f1[6] == "0"  # q2: one shared hash -> single 0


def test_screen_streaming_saturation(small_world, capsys):
    """-s on the streaming path: field count and zero-list length track the
    pre-reallocation shared count."""
    rc = main(["screen", "-s", str(small_world / "refs.msh"),
               str(small_world / "reads.fastq")])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out
    for line in out:
        f = line.split("\t")
        assert len(f) == 7
        shared = int(f[1].split("/")[0])
        assert f[6] == ",".join(["0"] * shared)


def test_sketch_individual(small_world, tmp_path, capsys):
    f = small_world / "multi.fasta"
    f.write_text(">a x\nACGTACGTACGTACGTACGTACGTA\n>b y\nTTTTACGTACGTACGTACGTACGGG\n")
    rc = main(["sketch", "-i", str(f), "-k", "9", "-o", str(tmp_path / "ind")])
    assert rc == 0
    sk = Sketch()
    sk.load_msh(str(tmp_path / "ind.msh"))
    assert [r.name for r in sk.references] == ["a", "b"]


def test_screen_fp_query(small_world, tmp_path, capsys):
    """screen -fp: fingerprint query sketched per the fork's rewrite."""
    fp = tmp_path / "q.txt"
    fp.write_text("q1 3 4 5\nq1 4 5 6\nq2 9 9\n")
    # build a reference sketch from the same fingerprints so hashes overlap
    main(["sketch", "-fp", str(fp), "-o", str(tmp_path / "fpref")])
    rc = main(["screen", "-fp", str(tmp_path / "fpref.msh"), str(fp)])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 2  # q1 and q2 both fully contained
    assert out[0].split("\t")[1] == "2/2"


def test_taxscreen(small_world, tmp_path, capsys):
    # minimal NCBI-style taxonomy: root(1) -> 10 -> {11, 12}
    tax = tmp_path / "tax"
    tax.mkdir()
    (tax / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "10\t|\t1\t|\tgenus\t|\n"
        "11\t|\t10\t|\tspecies\t|\n"
        "12\t|\t10\t|\tspecies\t|\n"
    )
    (tax / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "10\t|\tTestus\t|\t\t|\tscientific name\t|\n"
        "11\t|\tTestus unus\t|\t\t|\tscientific name\t|\n"
        "12\t|\tTestus duo\t|\t\t|\tscientific name\t|\n"
    )
    rc = main(
        ["taxscreen", str(small_world / "refs.msh"), str(small_world / "reads.fastq"),
         "-t", str(tax)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    lines = out.splitlines()
    assert lines[0].startswith("%\thashes")
    assert any("Testus unus" in l for l in lines)
    # g1's reads cover g1's hashes: species 11 should dominate
    unus = [l for l in lines if "Testus unus" in l][0].split("\t")
    duo = [l for l in lines if "Testus duo" in l]
    assert int(unus[1]) > 0


def test_bloom_flag_enables_bounded_admission():
    import argparse

    from fpmash_tpu.commands.common import sketch_params_from_args

    ns = argparse.Namespace(
        kmer=None, sketch_size=None, individual=False, noncanonical=False,
        seed=42, reads=False, min_cov=1, target_cov=0.0, bloom="10M",
        genome=None, preserve_case=False, protein=False, alphabet=None,
    )
    p = sketch_params_from_args(ns)
    assert p.reads and p.counts and p.bloom_bytes == 10_000_000
