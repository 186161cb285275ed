"""6-frame translation and amino-acid screen (CommandScreen translate path)."""

from __future__ import annotations

import random

import pytest

from fpmash_tpu.utils.codon import six_frame_translations, translate

# standard-code spot checks against the reference's aaFromCodon switch
# (CommandScreen.cpp:415-595)
CASES = {
    "AAA": "K", "AAC": "N", "ACG": "T", "AGA": "R", "AGC": "S", "ATG": "M",
    "ATA": "I", "CAA": "Q", "CAC": "H", "CCG": "P", "CGT": "R", "CTA": "L",
    "GAA": "E", "GAC": "D", "GCT": "A", "GGG": "G", "GTC": "V", "TAA": "*",
    "TAG": "*", "TGA": "*", "TAC": "Y", "TGC": "C", "TGG": "W", "TCA": "S",
    "TTT": "F", "TTA": "L",
}


def test_codon_table_matches_reference():
    for codon, aa in CASES.items():
        assert translate(codon) == aa, codon


def test_translate_invalid_and_frames():
    assert translate("ATGNAA") == "M*"  # N invalidates its codon
    assert translate("ATGAAA", 1) == "*"  # TGA AA -> stop (frame 1)
    assert translate("AT") == ""  # too short
    assert translate("atgaaa") == "**"  # lowercase is NOT folded here


def test_six_frames():
    # fold + forward frames 0-2 + reverse-complement frames 0-2
    frames = six_frame_translations("atgAAATTTGGG")
    assert frames[0] == "MKFG"
    # revcomp of ATGAAATTTGGG = CCCAAATTTCAT
    assert frames[3] == translate("CCCAAATTTCAT")
    assert len(frames) == 6


_REV_CODON = {}
for _b1 in "TCAG":
    for _b2 in "TCAG":
        for _b3 in "TCAG":
            _c = _b1 + _b2 + _b3
            _REV_CODON.setdefault(translate(_c), _c)


def test_screen_translated_containment(tmp_path, capsys):
    """A nucleotide mixture containing a protein's coding sequence screens
    against that protein's amino-acid sketch with identity ~1."""
    from fpmash_tpu.cli import main

    rng = random.Random(23)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    prot = "".join(rng.choice(aas) for _ in range(120))
    decoy = "".join(rng.choice(aas) for _ in range(120))

    pfa = tmp_path / "prot.faa"
    pfa.write_text(f">target\n{prot}\n>decoy\n{decoy}\n")
    rc = main(
        ["sketch", str(pfa), "-a", "-i", "-s", "40", "-o", str(tmp_path / "prot")]
    )
    assert rc == 0

    # embed the coding sequence (reverse strand) in random DNA
    cds = "".join(_REV_CODON[a] for a in prot)
    comp = str.maketrans("ACGT", "TGCA")
    rc_cds = cds.translate(comp)[::-1]
    flank = lambda n: "".join(rng.choice("ACGT") for _ in range(n))
    mixture = flank(200) + rc_cds + flank(200)
    mfa = tmp_path / "mix.fna"
    mfa.write_text(f">mix\n{mixture}\n")

    rc = main(["screen", str(tmp_path / "prot.msh"), str(mfa)])
    assert rc == 0
    out = capsys.readouterr()
    assert "Translating from nucleotides..." in out.err
    rows = {l.split("\t")[4]: l.split("\t") for l in out.out.splitlines()}
    assert "target" in rows, out.out
    identity = float(rows["target"][0])
    shared = rows["target"][1]
    assert identity > 0.99
    assert shared.split("/")[0] == shared.split("/")[1]  # all hashes shared
    # the decoy protein must not reach reporting identity
    assert "decoy" not in rows or float(rows["decoy"][0]) < 0.9
