"""Alphabet / mode coverage: protein, preserve-case, target coverage,
winner-take-all screen."""

import numpy as np
import pytest

from fpmash_tpu.models.sketch import Sketch, SketchParams


def test_protein_mode():
    """-a: alphabet ACDEFGHIKLMNPQRSTVWY, k=9, noncanonical, 64-bit
    (sketchParameterSetup.cpp:85-94)."""
    import random

    from fpmash_tpu.commands.common import ALPHABET_PROTEIN

    random.seed(15)
    p = SketchParams(kmer_size=9, noncanonical=True, alphabet=ALPHABET_PROTEIN)
    assert p.use64  # 20^9 > 2^32
    seq = "".join(random.choice(ALPHABET_PROTEIN) for _ in range(500))
    a = Sketch(p)
    a.init_from_sequences([("p1", "", seq)], merge=True, backend="scalar")
    b = Sketch(p)
    b.init_from_sequences([("p1", "", seq)], merge=True, backend="jax")
    assert list(a.references[0].hashes) == list(b.references[0].hashes)
    assert len(a.references[0].hashes) > 0


def test_preserve_case():
    """-Z: lowercase letters are distinct k-mers and fail the (uppercase)
    alphabet check (Sketch.cpp:676-682)."""
    p = SketchParams(kmer_size=4, preserve_case=True, noncanonical=True)
    seq = "ACGTacgtACGT"
    sk = Sketch(p)
    sk.init_from_sequences([("s", "", seq)], merge=True, backend="scalar")
    # only windows entirely within the uppercase runs are valid:
    # positions 0 and 8 (ACGT each) -> 1 distinct hash
    assert len(sk.references[0].hashes) == 1

    p2 = SketchParams(kmer_size=4, preserve_case=False, noncanonical=True)
    sk2 = Sketch(p2)
    sk2.init_from_sequences([("s", "", seq)], merge=True, backend="scalar")
    # case folded: every window valid, all equal ACGT rotations
    assert len(sk2.references[0].hashes) >= 1
    assert len(sk2.references[0].hashes) > len(sk.references[0].hashes)


def test_target_cov_early_stop():
    """-c: stops consuming reads once mean kept-hash multiplicity reaches
    the target (approximated per chunk; Sketch.cpp:1410-1414)."""
    import random

    random.seed(16)
    genome = "".join(random.choice("ACGT") for _ in range(2000))
    # 2000 identical coverage passes over the same genome
    records = [("r%d" % i, "", genome) for i in range(600)]
    p = SketchParams(kmer_size=15, sketch_size=64, reads=True, counts=True, target_cov=2.0)
    sk = Sketch(p)
    sk.init_from_sequences(records, merge=True, backend="scalar")
    r = sk.references[0]
    # stopped long before consuming all 600 copies
    assert "[600 seqs]" not in r.comment
    assert np.mean(r.counts) >= 2.0


def test_screen_winner_takes_all(tmp_path, capsys):
    from fpmash_tpu.cli import main

    import random

    random.seed(18)
    shared_part = "".join(random.choice("ACGT") for _ in range(800))
    unique1 = "".join(random.choice("ACGT") for _ in range(800))
    g1 = shared_part + unique1
    g2 = shared_part  # subset of g1
    (tmp_path / "g1.fasta").write_text(f">g1 c1\n{g1}\n")
    (tmp_path / "g2.fasta").write_text(f">g2 c2\n{g2}\n")
    main(["sketch", str(tmp_path / "g1.fasta"), str(tmp_path / "g2.fasta"),
          "-o", str(tmp_path / "refs"), "-s", "100", "-k", "15"])
    (tmp_path / "q.fasta").write_text(f">q x\n{g1}\n")

    rc = main(["screen", "-w", str(tmp_path / "refs.msh"), str(tmp_path / "q.fasta")])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    by_name = {l.split("\t")[4].split("/")[-1]: l.split("\t") for l in out}
    # g1 wins all shared hashes; g2 keeps few or none
    shared_g1 = int(by_name["g1.fasta"][1].split("/")[0])
    if "g2.fasta" in by_name:
        shared_g2 = int(by_name["g2.fasta"][1].split("/")[0])
        assert shared_g1 > shared_g2
    else:
        assert shared_g1 > 0


def test_screen_winner_matches_literal_model(tmp_path, capsys):
    """Vectorized winner-take-all == the reference's literal reallocation
    (CommandScreen.cpp:152-200) recomputed hash-by-hash in the test."""
    import numpy as np

    from fpmash_tpu.cli import main
    from fpmash_tpu.commands.screen_cmd import estimate_identity
    from fpmash_tpu.models.sketch import Sketch, _kmer_hash_pool

    rng = np.random.default_rng(23)
    lut = np.array(list("ACGT"))
    base = "".join(rng.choice(lut, 600))
    genomes = []
    for i in range(6):
        # overlapping genomes: shared core + per-genome tail
        tail = "".join(rng.choice(lut, 200 + 37 * i))
        genomes.append(base[: 300 + 50 * i] + tail)
    fastas = []
    for i, g in enumerate(genomes):
        f = tmp_path / f"g{i}.fasta"
        f.write_text(f">g{i} c{i}\n{g}\n")
        fastas.append(str(f))
    main(["sketch", *fastas, "-o", str(tmp_path / "refs"), "-s", "80", "-k", "13"])
    q = tmp_path / "q.fasta"
    q.write_text(f">q x\n{genomes[0] + genomes[3]}\n")

    rc = main(["screen", "-w", str(tmp_path / "refs.msh"), str(q)])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    got = {}
    for l in out:
        f = l.split("\t")
        got[f[4].split("/")[-1]] = (int(f[1].split("/")[0]), int(f[2]))

    # literal model
    ref = Sketch()
    ref.load_msh(str(tmp_path / "refs.msh"))
    p = ref.params
    pool = np.asarray(
        _kmer_hash_pool([genomes[0] + genomes[3]], p, "scalar"), np.uint64
    )
    values, counts = np.unique(pool, return_counts=True)
    qcount = dict(zip(map(int, values), map(int, counts)))
    pre_shared = [
        sum(1 for h in map(int, r.hashes) if h in qcount) for r in ref.references
    ]
    scores = [
        estimate_identity(pre_shared[i], len(r.hashes), p.kmer_size)
        for i, r in enumerate(ref.references)
    ]
    table = {}
    for i, r in enumerate(ref.references):
        for h in map(int, r.hashes):
            table.setdefault(h, []).append(i)
    shared = [0] * len(ref.references)
    depths = [[] for _ in ref.references]
    for h, idxs in table.items():
        if h not in qcount:
            continue
        best = min(idxs, key=lambda i: (-scores[i], -ref.references[i].length, i))
        shared[best] += 1
        depths[best].append(qcount[h])
    for i, r in enumerate(ref.references):
        name = r.name.split("/")[-1]
        if shared[i] == 0:
            assert name not in got
            continue
        med = sorted(depths[i])[shared[i] // 2]
        assert got[name] == (shared[i], med), name


def test_screen_scales_without_per_hash_loop(tmp_path, capsys):
    """A many-reference screen (3k refs x 50 hashes) completes fast —
    guards against reintroducing per-hash Python loops in the table build
    (CommandScreen.cpp:81-102 scale workload)."""
    import time

    import numpy as np

    from fpmash_tpu.cli import main
    from fpmash_tpu.models.sketch import Reference, Sketch, SketchParams

    rng = np.random.default_rng(5)
    sk = Sketch(SketchParams(kmer_size=13, sketch_size=50))
    for i in range(3000):
        h = np.sort(rng.choice(1 << 40, 50, replace=False).astype(np.uint64))
        sk.references.append(
            Reference(name=f"r{i}", comment="", length=1000, hashes=h)
        )
    sk.write_msh(str(tmp_path / "refs.msh"))
    q = tmp_path / "q.fasta"
    q.write_text(">q x\n" + "".join(rng.choice(list("ACGT"), 2000)) + "\n")
    t0 = time.perf_counter()
    rc = main(["screen", "-w", str(tmp_path / "refs.msh"), str(q), "--backend", "scalar"])
    dt = time.perf_counter() - t0
    capsys.readouterr()
    assert rc == 0
    assert dt < 30, f"screen with 3k refs took {dt:.1f}s"
