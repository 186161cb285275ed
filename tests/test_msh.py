"""Cap'n Proto .msh codec: reference-file reads, JSON parity, round-trip."""

import numpy as np
import pytest

from fpmash_tpu.utils.info_json import load_info_json
from fpmash_tpu.utils.msh import MshFile, MshReference, read_msh, write_msh


def test_read_dna3_fingerprint_msh(golden_dir):
    m = read_msh(golden_dir / "cfl" / "DNA3-sketch.msh")
    assert (m.kmer_size, m.min_hashes_per_window, m.hash_seed) == (1, 1000, 42)
    assert m.alphabet == "0123456789" and not m.use64
    assert len(m.references) == 5
    doc = load_info_json(str(golden_dir / "cfl" / "DNA3-sketch.json"))
    for r, s in zip(m.references, doc["sketches"]):
        assert r.name == s["name"] and r.length == s["length"]
        # JSON golden was dumped after load-time truncation to 1000
        assert list(map(int, r.hashes32))[:1000] == s["hashes"]
        assert len(r.hashes32) == 2000  # the file itself keeps all lines


def test_read_reads_msh(golden_dir):
    m = read_msh(golden_dir / "new_data" / "reads.msh")
    assert m.use64 and m.kmer_size == 21 and m.alphabet == "ACGT"
    r = m.references[0]
    assert r.name == "reads" and r.length == 502359
    assert len(r.hashes64) == 1000
    assert r.counts32 is not None and r.counts32_sorted
    doc = load_info_json(str(golden_dir / "new_data" / "reads.json"))
    assert list(map(int, r.hashes64)) == doc["sketches"][0]["hashes"]


def test_read_genome_msh(golden_dir):
    m = read_msh(golden_dir / "mash_ref" / "genome1.fna.msh")
    assert m.references[0].name == "data/genome1.fna"
    assert len(m.references[0].hashes64) == 1000


def test_roundtrip():
    m = MshFile(kmer_size=21, alphabet="ACGT", hash_seed=42)
    m.references.append(
        MshReference(
            name="r1",
            comment="c1 with spaces\r",
            length=12345,
            hashes64=np.array([5, 7, 11, 2**63 + 1], np.uint64),
            counts32=np.array([1, 2, 3, 4], np.uint32),
            counts32_sorted=True,
        )
    )
    m.references.append(MshReference(name="empty", comment="", length=0))
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.msh")
        write_msh(path, m)
        back = read_msh(path)
    assert back.kmer_size == 21 and back.hash_seed == 42 and back.alphabet == "ACGT"
    assert back.references[0].name == "r1"
    assert back.references[0].comment == "c1 with spaces\r"
    assert back.references[0].length == 12345
    assert list(back.references[0].hashes64) == [5, 7, 11, 2**63 + 1]
    assert list(back.references[0].counts32) == [1, 2, 3, 4]
    assert back.references[0].counts32_sorted
    assert back.references[1].name == "empty"


def test_roundtrip_nondefault_seed_uses_new_slot():
    m = MshFile(hash_seed=7, alphabet="0123456789", kmer_size=1)
    m.references.append(
        MshReference(name="x", length=3, hashes32=np.array([9, 8], np.uint32))
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.msh")
        write_msh(path, m)
        back = read_msh(path)
    assert back.hash_seed == 7
    assert list(back.references[0].hashes32) == [9, 8]
