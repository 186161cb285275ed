"""Native C++ parsers == Python parsers on the golden fixtures."""

import numpy as np
import pytest

import fpmash_tpu.utils.native as native
from fpmash_tpu.utils.fasta import read_sequences


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library not built")


@pytest.mark.parametrize(
    "rel",
    ["cfl/DNA3.fasta", "new_data/reads1.fastq", "lyn2vec_basic/example_transcripts_genes.fa"],
)
def test_seq_parser_matches_python(golden_dir, rel):
    path = str(golden_dir / rel)
    py = list(read_sequences(path, native=False))
    nat = list(read_sequences(path, native=True))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a == b


def test_fingerprint_parser_matches_python(golden_dir):
    path = str(golden_dir / "cfl" / "DNA3-CFL.txt")
    ids, values, offsets = native.parse_fingerprint_file(path)
    lines = open(path).read().splitlines()
    assert len(ids) == len(lines)
    for i, line in enumerate(lines):
        parts = line.split()
        assert ids[i] == parts[0]
        assert [int(v) for v in values[offsets[i] : offsets[i + 1]]] == [
            int(x) for x in parts[1:]
        ]


def test_fingerprint_parser_line_cap(tmp_path):
    f = tmp_path / "fp.txt"
    f.write_text("a 1\nb 2\nc 3\n")
    ids, values, offsets = native.parse_fingerprint_file(str(f), max_lines=2)
    assert ids == ["a", "b"]


def test_fingerprint_parser_stops_at_non_integer(tmp_path):
    # mirrors `ss >> uint64_t` halting on a non-numeric token
    f = tmp_path / "fp.txt"
    f.write_text("x 1 2 oops 3\n")
    ids, values, offsets = native.parse_fingerprint_file(str(f))
    assert [int(v) for v in values] == [1, 2]
