"""Windowed min-hash (minmer) selection and the `find` command.

The scalar oracle (fpmash_tpu.scalar.winnow) mirrors the reference's
incremental algorithm (getMinHashPositions, Sketch.cpp:737-1047) event for
event; the device kernel (fpmash_tpu.ops.winnow) implements the
declarative bottom-k-per-window formulation.  These tests prove the two
equivalent on randomized inputs and exercise windowed sketching + find
end to end.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from fpmash_tpu.ops.winnow import minmer_positions
from fpmash_tpu.scalar.winnow import minmer_position_hashes


def _brute(hashes, ws, mins):
    """Literal per-window model: bottom-`mins` distinct hashes, earliest
    occurrence in window."""
    n = len(hashes)
    ws = min(ws, n)
    marked = set()
    for w in range(0, n - ws + 1):
        win = hashes[w : w + ws]
        bottom = set(sorted(set(win))[:mins])
        first = {}
        for j, h in enumerate(win):
            first.setdefault(h, w + j)
        marked.update((first[h], h) for h in bottom)
    return sorted(marked)


def test_scalar_oracle_matches_brute_force():
    rng = random.Random(1)
    for _ in range(500):
        n = rng.randint(1, 80)
        alpha = rng.choice([2, 3, 6, 40, 1 << 62])
        hashes = [rng.randrange(alpha) for _ in range(n)]
        ws = rng.randint(1, 90)
        mins = rng.randint(1, 14)
        assert minmer_position_hashes(hashes, ws, mins) == _brute(hashes, ws, mins)


@pytest.mark.parametrize("backend", ["scalar", "jax"])
def test_kernel_matches_scalar_oracle(backend):
    rng = np.random.default_rng(2)
    for _ in range(40):
        n = int(rng.integers(1, 400))
        hashes = rng.integers(0, 9, size=n).astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
        ws = int(rng.integers(1, 64))
        mins = int(rng.integers(1, 8))
        pos, ph = minmer_positions(hashes, ws, mins, backend=backend)
        expect = minmer_position_hashes([int(h) for h in hashes], ws, mins)
        got = list(zip(pos.tolist(), ph.tolist()))
        assert got == expect


def test_kernel_chunking_boundary():
    # force multiple jax chunks by exceeding the chunk budget
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 1 << 48, size=3000).astype(np.uint64)
    ws = 2048
    pos, ph = minmer_positions(hashes, ws, 5, backend="jax")
    expect = minmer_position_hashes([int(h) for h in hashes], ws, 5)
    assert list(zip(pos.tolist(), ph.tolist())) == expect


# --------------------------------------------------------------------- #
# windowed sketching + .msw + find
# --------------------------------------------------------------------- #


def _random_dna(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_windowed_sketch_roundtrip(tmp_path):
    from fpmash_tpu.models.sketch import Sketch, SketchParams

    rng = random.Random(7)
    fa = tmp_path / "ref.fna"
    seqs = {f"chr{i}": _random_dna(rng, 600) for i in range(3)}
    fa.write_text("".join(f">{k}\n{v}\n" for k, v in seqs.items()))

    params = SketchParams(
        kmer_size=15, sketch_size=8, windowed=True, window_size=100, concatenated=False
    )
    sk = Sketch(params)
    sk.init_from_files([str(fa)])
    assert len(sk.references) == 3
    assert sk.references[0].name == "chr0"
    assert len(sk.loci) > 0
    # loci are per-reference ascending positions with 64-bit hashes
    by_ref = {}
    for s, pos, h in sk.loci:
        by_ref.setdefault(s, []).append(pos)
    for positions in by_ref.values():
        assert positions == sorted(positions)

    out = tmp_path / "ref.msw"
    sk.write_msh(str(out))
    sk2 = Sketch()
    sk2.load_msh(str(out))
    assert sk2.loci == sk.loci
    assert sk2.params.window_size == 100
    assert [r.name for r in sk2.references] == ["chr0", "chr1", "chr2"]


def test_find_locates_planted_region(tmp_path, capsys):
    """A query lifted from the middle of chr1 must hit chr1 at the right
    coordinates, on both strands."""
    from fpmash_tpu.cli import main

    rng = random.Random(11)
    chrs = {f"chr{i}": _random_dna(rng, 2000) for i in range(2)}
    fa = tmp_path / "ref.fna"
    fa.write_text("".join(f">{k}\n{v}\n" for k, v in chrs.items()))

    query = chrs["chr1"][700:1100]
    comp = str.maketrans("ACGT", "TGCA")
    qrc = query.translate(comp)[::-1]
    qf = tmp_path / "q.fna"
    qf.write_text(f">fwd\n{query}\n>rev\n{qrc}\n")

    rc = main(
        [
            "find", str(fa), str(qf),
            "-k", "15", "-L", "200", "-f", "20", "-t", "0.3",
        ]
    )
    assert rc == 0
    lines = [l.split("\t") for l in capsys.readouterr().out.splitlines()]
    assert lines, "find produced no hits"
    fwd = [l for l in lines if l[0] == "fwd"]
    rev = [l for l in lines if l[0] == "rev"]
    assert fwd and fwd[0][1] == "chr1" and fwd[0][4] == "+"
    assert rev and rev[0][1] == "chr1" and rev[0][4] == "-"
    # best hit must cover the planted region approximately
    s, e = int(fwd[0][2]), int(fwd[0][3])
    assert 600 <= s <= 800 and 1000 <= e <= 1200
    assert float(fwd[0][5]) > 0.5


def test_find_best_and_self_flags(tmp_path, capsys):
    from fpmash_tpu.cli import main

    rng = random.Random(13)
    seq = _random_dna(rng, 1500)
    fa = tmp_path / "ref.fna"
    fa.write_text(f">ctg\n{seq}\n")
    qf = tmp_path / "q.fna"
    qf.write_text(f">ctg\n{seq[200:800]}\n")

    rc = main(["find", str(fa), str(qf), "-k", "15", "-L", "150", "-f", "15", "-b", "1"])
    assert rc == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 1  # -b 1 keeps only the best hit

    # --self suppresses hits to the reference with the query's own name
    rc = main(["find", str(fa), str(qf), "-k", "15", "-L", "150", "-f", "15", "--self"])
    assert rc == 0
    assert capsys.readouterr().out == ""


def test_find_rejects_msh(tmp_path, capsys):
    from fpmash_tpu.cli import main

    msh = tmp_path / "x.msh"
    msh.write_text("")
    rc = main(["find", str(msh), "whatever.fna"])
    assert rc == 1


def test_sketch_cli_writes_msw(tmp_path, capsys):
    from fpmash_tpu.cli import main
    from fpmash_tpu.models.sketch import Sketch

    rng = random.Random(17)
    fa = tmp_path / "g.fna"
    fa.write_text(f">s1\n{_random_dna(rng, 500)}\n")
    rc = main(
        ["sketch", str(fa), "-W", "-L", "120", "-k", "15", "-s", "6",
         "-o", str(tmp_path / "g")]
    )
    assert rc == 0
    sk = Sketch()
    sk.load_msh(str(tmp_path / "g.msw"))
    assert sk.params.windowed and sk.params.window_size == 120
    assert sk.loci
    # windowed references carry no bottom-k hash list
    assert len(sk.references[0].hashes) == 0
