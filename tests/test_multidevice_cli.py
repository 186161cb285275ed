"""CLI-level multi-chip parity: the same command run on 1 visible device
and on the full 8-device virtual mesh must produce byte-identical output.

``FPMASH_DEVICES`` caps the devices the auto-sharding layer
(parallel.sharded.visible_device_count) may use, so flipping it between
runs toggles the shard_map routing inside the unchanged command path.
"""

import random

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _needs_devices():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _write_fasta(path, n_reads=3, length=300, seed=11):
    random.seed(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            f.write(f">R{i}\n")
            f.write("".join(random.choice("ACGT") for _ in range(length)) + "\n")


def _run(argv, monkeypatch, capsys, devices):
    from fpmash_tpu.cli import main

    monkeypatch.setenv("FPMASH_DEVICES", str(devices))
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out


@pytest.mark.parametrize("fact", ["CFL", "ICFL_COMB"])
def test_sketch_direct_fp_multidevice(tmp_path, monkeypatch, capsys, fact):
    """sketch --direct-fp shards its window batch; .msh must be identical."""
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta)  # 3 x 300 windows >= 256 -> device path
    out1 = tmp_path / "d1"
    out8 = tmp_path / "d8"
    _run(
        ["sketch", "--direct-fp", "--factorization", fact, "-o", str(out1), str(fasta)],
        monkeypatch, capsys, devices=1,
    )
    _run(
        ["sketch", "--direct-fp", "--factorization", fact, "-o", str(out8), str(fasta)],
        monkeypatch, capsys, devices=8,
    )
    b1 = open(str(out1) + ".msh", "rb").read()
    b8 = open(str(out8) + ".msh", "rb").read()
    assert b1 == b8


def test_classic_sketch_multidevice(tmp_path, monkeypatch, capsys):
    """Classic k-mer sketching shards its chunk rows; .msh identical."""
    fasta = tmp_path / "g.fna"
    _write_fasta(fasta, n_reads=2, length=4000, seed=17)
    outs = {}
    for d in (1, 8):
        out = tmp_path / f"g{d}"
        _run(
            ["sketch", str(fasta), "-o", str(out), "--backend", "jax"],
            monkeypatch, capsys, devices=d,
        )
        outs[d] = open(str(out) + ".msh", "rb").read()
    assert outs[1] == outs[8]


def _mk_sketch_msh(tmp_path, name, n_refs, seed):
    """Synthetic classic sketch file with sorted distinct hashes."""
    from fpmash_tpu.models.sketch import Reference, Sketch, SketchParams

    rng = np.random.default_rng(seed)
    sk = Sketch(SketchParams(kmer_size=21, sketch_size=64))  # ACGT^21 -> 64-bit
    pool = rng.choice(
        np.arange(1, 10**6, dtype=np.uint64), size=(n_refs, 200), replace=True
    )
    for i in range(n_refs):
        h = np.unique(pool[i])[:64]
        sk.references.append(
            Reference(name=f"{name}{i}", comment="", length=1000, hashes=h)
        )
    sk._create_index()
    out = tmp_path / f"{name}.msh"
    sk.write_msh(str(out))
    return str(out)


def test_dist_multidevice(tmp_path, monkeypatch, capsys):
    """dist over a grid big enough for the device kernel (>=64 pairs):
    stdout identical between 1 and 8 visible devices."""
    ref = _mk_sketch_msh(tmp_path, "ref", 12, seed=5)
    qry = _mk_sketch_msh(tmp_path, "qry", 9, seed=6)
    out1 = _run(["dist", ref, qry], monkeypatch, capsys, devices=1)
    out8 = _run(["dist", ref, qry], monkeypatch, capsys, devices=8)
    assert out1 == out8
    assert len(out1.splitlines()) == 12 * 9


def test_sketch_direct_fp_no_shift(tmp_path, monkeypatch, capsys):
    """--direct-fp --shift no_shift (whole-read rows, L=300) equals the
    fingerprint-txt round-trip, across device counts."""
    from fpmash_tpu.cli import main

    fasta = tmp_path / "ns.fasta"
    _write_fasta(fasta, n_reads=40, length=300, seed=13)  # >=256 rows? 40 rows -> host route is fine too
    outs = {}
    for d in (1, 8):
        out = tmp_path / f"ns{d}"
        _run(
            ["sketch", "--direct-fp", "--shift", "no_shift", "-o", str(out), str(fasta)],
            monkeypatch, capsys, devices=d,
        )
        outs[d] = open(str(out) + ".msh", "rb").read()
    assert outs[1] == outs[8]

    monkeypatch.setenv("FPMASH_DEVICES", "8")
    rc = main(["fingerprint", "--type", "basic", "--path", str(tmp_path),
               "--fasta", "ns.fasta", "--type_factorization", "CFL",
               "--rev_comb", "true", "--shift", "no_shift", "--backend", "scalar"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["sketch", "-fp", str(tmp_path / "fingerprint_CFL.txt"),
               "-o", str(tmp_path / "nsref")])
    assert rc == 0
    capsys.readouterr()
    assert outs[8] == open(str(tmp_path / "nsref.msh"), "rb").read()


def test_triangle_multidevice(tmp_path, monkeypatch, capsys, golden_dir):
    """triangle -fp (positional comparison) identical across device counts."""
    fp = str(golden_dir / "cfl" / "DNA3-CFL.txt")
    out1 = _run(["triangle", "-fp", fp], monkeypatch, capsys, devices=1)
    out8 = _run(["triangle", "-fp", fp], monkeypatch, capsys, devices=8)
    assert out1 == out8
