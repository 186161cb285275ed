"""Sketch engine parity: fingerprint path, classic path, bottom-k."""

import numpy as np
import pytest

from fpmash_tpu.models.sketch import Sketch, SketchParams
from fpmash_tpu.utils.info_json import load_info_json
from fpmash_tpu.utils.msh import read_msh


def test_fingerprint_sketch_matches_msh(golden_dir):
    """sketch -fp on DNA3-CFL.txt reproduces DNA3-sketch.msh content
    (initFromFingerprints, Sketch.cpp:56-151)."""
    params = SketchParams().for_fingerprint()
    sk = Sketch(params)
    sk.init_from_fingerprints([str(golden_dir / "cfl" / "DNA3-CFL.txt")])
    m = read_msh(golden_dir / "cfl" / "DNA3-sketch.msh")
    assert len(sk.references) == len(m.references) == 5
    for mine, gold in zip(sk.references, m.references):
        assert mine.name == gold.name
        assert mine.comment == gold.comment
        assert mine.length == gold.length  # includes the double-count quirk
        assert list(map(int, mine.hashes)) == list(map(int, gold.hashes32))


def test_fingerprint_grouping_by_consecutive_ids(tmp_path):
    """Non-adjacent duplicate IDs become separate references
    (Sketch.cpp:103-129)."""
    f = tmp_path / "fp.txt"
    f.write_text("a 1 2\na 3 4\nb 5\na 9\n")
    sk = Sketch(SketchParams().for_fingerprint())
    sk.init_from_fingerprints([str(f)])
    assert [r.name for r in sk.references] == ["a", "b", "a"]
    assert [len(r.hashes) for r in sk.references] == [2, 1, 1]
    # length quirk: first line counted twice
    assert sk.references[0].length == 2 + 2 + 2


@pytest.mark.slow
def test_classic_reads_sketch_matches_golden(golden_dir):
    """`mash sketch -r -I reads reads1.fastq reads2.fastq` parity:
    hashes, counts, and the estimateSetSize length (Sketch.cpp:1410-1436)."""
    params = SketchParams(reads=True, counts=True)
    sk = Sketch(params)
    sk.init_from_reads(
        [
            str(golden_dir / "new_data" / "reads1.fastq"),
            str(golden_dir / "new_data" / "reads2.fastq"),
        ],
        name="reads",
        backend="jax",
    )
    m = read_msh(golden_dir / "new_data" / "reads.msh")
    g = m.references[0]
    r = sk.references[0]
    assert r.length == g.length == 502359
    assert list(map(int, r.hashes)) == list(map(int, g.hashes64))
    assert list(map(int, r.counts)) == list(map(int, g.counts32))
    # comment parity modulo the fixture's CRLF-era \r
    assert r.comment == g.comment.replace("\r", "")


def test_bottom_k_matches_heap_model():
    """Batch bottom-k == a literal MinHashHeap streaming model
    (MinHashHeap.cpp:68-146) for min_cov 1 and 2."""
    import random

    from fpmash_tpu.ops.bottomk import bottom_k_host

    random.seed(42)
    for min_cov in (1, 2):
        for _ in range(20):
            stream = [random.randint(0, 40) for _ in range(200)]
            s = 8

            # literal heap model
            admitted: dict[int, int] = {}
            pending: dict[int, int] = {}
            for h in stream:
                top = max(admitted) if len(admitted) >= s else None
                if top is not None and not (h < top):
                    continue
                if h not in admitted:
                    if min_cov == 1 or pending.get(h, 0) == min_cov - 1:
                        admitted[h] = min_cov
                        pending.pop(h, None)
                    else:
                        pending[h] = pending.get(h, 0) + 1
                else:
                    admitted[h] += 1
                if len(admitted) > s:
                    admitted.pop(max(admitted))

            values, counts = bottom_k_host(np.array(stream, np.uint64), s, min_cov)
            assert list(values) == sorted(admitted)
            # counts may legitimately differ for the boundary (top) hash due
            # to the heap's saturation skip; all others must match exactly.
            heap_counts = [admitted[v] for v in sorted(admitted)]
            assert list(counts[:-1]) == heap_counts[:-1]
            assert counts[-1] >= heap_counts[-1] if len(counts) else True


def test_classic_sketch_one_sequence_scalar_vs_jax():
    import random

    random.seed(1)
    seq = "".join(random.choice("ACGTacgtN") for _ in range(3000))
    rec = [("s1", "c", seq)]
    a = Sketch(SketchParams())
    a.init_from_sequences(rec, merge=True, backend="scalar")
    b = Sketch(SketchParams())
    b.init_from_sequences(rec, merge=True, backend="jax")
    assert list(a.references[0].hashes) == list(b.references[0].hashes)


def test_direct_fp_path_equals_txt_path(golden_dir):
    """Integrated reads->sketch device path == lyn2vec txt + sketch -fp."""
    from fpmash_tpu.models.fingerprint import extract_reads

    reads = extract_reads(str(golden_dir / "cfl" / "DNA3.fasta"), rev_com=True)
    a = Sketch(SketchParams().for_fingerprint())
    a.init_from_fingerprints([str(golden_dir / "cfl" / "DNA3-CFL.txt")])
    b = Sketch(SketchParams().for_fingerprint())
    b.init_from_reads_fingerprint(reads, "CFL")
    assert len(a.references) == len(b.references)
    for x, y in zip(a.references, b.references):
        assert x.name == y.name and x.length == y.length
        assert list(map(int, x.hashes)) == list(map(int, y.hashes))


def test_direct_fp_cli(golden_dir, tmp_path):
    from fpmash_tpu.cli import main
    from fpmash_tpu.utils.msh import read_msh

    rc = main(
        ["sketch", "--direct-fp", str(golden_dir / "cfl" / "DNA3.fasta"),
         "-o", str(tmp_path / "direct")]
    )
    assert rc == 0
    mine = read_msh(str(tmp_path / "direct.msh"))
    gold = read_msh(str(golden_dir / "cfl" / "DNA3-sketch.msh"))
    for m, g in zip(mine.references, gold.references):
        assert m.name == g.name
        assert list(map(int, m.hashes32)) == list(map(int, g.hashes32))


def test_info_json_roundtrip(golden_dir):
    from fpmash_tpu.utils.info_json import load_info_json, write_info_json

    sk = Sketch(SketchParams().for_fingerprint())
    sk.init_from_fingerprints([str(golden_dir / "cfl" / "DNA3-CFL.txt")])
    text = write_info_json(sk)
    doc = load_info_json(text)
    golden = load_info_json(str(golden_dir / "cfl" / "DNA3-sketch.json"))
    assert doc["kmer"] == golden["kmer"] == 1
    assert doc["alphabet"] == golden["alphabet"]
    assert doc["hashBits"] == golden["hashBits"] == 32
    for mine, gold in zip(doc["sketches"], golden["sketches"]):
        assert mine["name"] == gold["name"]
        assert mine["length"] == gold["length"]
        assert mine["hashes"][:1000] == gold["hashes"]


def test_bottom_k_threshold_matches_host():
    """Fast threshold bottom-k == full-sort semantics on a realistic pool
    (uniform hashes + duplicates), and flags non-uniform pools for
    fallback instead of returning wrong results."""
    import jax.numpy as jnp
    import numpy as np

    from fpmash_tpu.ops.bottomk import bottom_k_host, bottom_k_threshold

    rng = np.random.default_rng(0)
    base = rng.integers(1, 1 << 63, size=200_000, dtype=np.uint64)
    pool = np.concatenate([base, base[:5000], base[:100]])  # multiplicities
    rng.shuffle(pool)
    valid = np.ones(len(pool), bool)
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool), jnp.asarray(valid), s=1000, min_cov=1
    )
    assert bool(ok)
    wv, wc = bottom_k_host(pool, 1000, 1)
    n = int(n)
    assert np.array_equal(np.asarray(v)[:n], wv)
    assert np.array_equal(np.asarray(c)[:n], wc)

    # min_cov=2 on a pool where only 2.5% of values repeat: eligible values
    # are far sparser than the threshold model assumes -> must flag for
    # fallback, never return a short-but-"ok" result
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool), jnp.asarray(valid), s=1000, min_cov=2
    )
    assert not bool(ok)
    # a denser-duplicate pool (50% repeated, reads-mode-like) succeeds with
    # the boost retry the host wrapper uses
    full = rng.integers(1, (1 << 64) - 1, size=200_000, dtype=np.uint64)
    pool2 = np.concatenate([full, full[: len(full) // 2]])
    rng.shuffle(pool2)
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool2), jnp.asarray(np.ones(len(pool2), bool)),
        s=1000, min_cov=2, boost=8,
    )
    assert bool(ok)
    wv, wc = bottom_k_host(pool2, 1000, 2)
    n = int(n)
    assert np.array_equal(np.asarray(v)[:n], wv)
    assert np.array_equal(np.asarray(c)[:n], wc)

    # non-uniform pool: every value in the top of the hash space, so the
    # threshold collects nothing -> must signal fallback, not lie
    high = rng.integers((1 << 63), (1 << 64) - 1, size=200_000, dtype=np.uint64)
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(high), jnp.asarray(np.ones(len(high), bool)), s=1000
    )
    assert not bool(ok)

    # tiny distinct count below s with saturated threshold is complete
    small = np.repeat(rng.integers(1, 1000, size=50, dtype=np.uint64), 100)
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(small), jnp.asarray(np.ones(len(small), bool)), s=1000
    )
    assert bool(ok)
    wv, wc = bottom_k_host(small, 1000)
    n = int(n)
    assert np.array_equal(np.asarray(v)[:n], wv)
    assert np.array_equal(np.asarray(c)[:n], wc)


def test_bottom_k_compact_path_matches_host():
    """The need_counts=False group-extraction compaction (the round-5
    classic-path fast tail) == full-sort values, with exact overflow
    detection and the all_taken saturation contract."""
    import jax.numpy as jnp

    from fpmash_tpu.ops.bottomk import (
        _compact_supported,
        bottom_k_host,
        bottom_k_threshold,
    )

    rng = np.random.default_rng(7)
    N = 1 << 18
    s = 64  # N >= 2048*s so the density gate admits the compact path
    assert _compact_supported(N, s, 1, 1, False)
    assert not _compact_supported(N, s, 8, 1, False)  # boost>2: row sort
    assert not _compact_supported(N, s, 1, 1, True)  # counts: row sort
    assert not _compact_supported(N, 1000, 1, 1, False)  # too dense

    # uniform pool + duplicates (dup copies land in distinct groups)
    base = rng.integers(1, 1 << 63, size=N - 6000, dtype=np.uint64)
    pool = np.concatenate([base, base[:6000]])
    rng.shuffle(pool)
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool), jnp.ones(N, bool), s=s, need_counts=False, compact=True
    )
    assert bool(ok)
    wv, _ = bottom_k_host(pool, s, 1)
    n = int(n)
    assert np.array_equal(np.asarray(v)[:n], wv)
    assert (np.asarray(c)[:n] == 1).all()  # counts unused -> ones contract

    # partial validity mask
    valid = rng.random(N) < 0.7
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool), jnp.asarray(valid), s=s, need_counts=False, compact=True
    )
    assert bool(ok)
    wv, _ = bottom_k_host(pool[valid], s, 1)
    assert np.array_equal(np.asarray(v)[: int(n)], wv)

    # an adversarial group: >8 distinct survivors packed into one 64-lane
    # group must trip the exact overflow check (ok=False), never drop
    # survivors silently
    pool2 = rng.integers(1 << 40, 1 << 63, size=N, dtype=np.uint64)
    pool2[:16] = np.arange(1, 17, dtype=np.uint64)  # 16 tiny values, group 0
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool2), jnp.ones(N, bool), s=s, need_counts=False, compact=True
    )
    if bool(ok):  # only acceptable if nothing was dropped
        wv, _ = bottom_k_host(pool2, s, 1)
        assert np.array_equal(np.asarray(v)[: int(n)], wv)

    # low-entropy saturation (64 distinct values, huge multiplicity):
    # most groups hold > 8 distinct survivors, so the compact path must
    # conservatively report ok=False (the caller's boost-8 retry takes
    # the exact row-sort path) — and the full _bottom_k ladder must
    # return exact results end to end
    small_vals = rng.integers(1, 2000, size=64, dtype=np.uint64)
    pool3 = np.repeat(small_vals, N // 64)
    rng.shuffle(pool3)
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool3), jnp.ones(N, bool), s=s, need_counts=False, compact=True
    )
    wv, _ = bottom_k_host(pool3, s, 1)
    if bool(ok):
        assert np.array_equal(np.asarray(v)[: int(n)], wv)
    from fpmash_tpu.models.sketch import SketchParams, _bottom_k

    lv, _ = _bottom_k(pool3, SketchParams(sketch_size=s), "jax")
    assert np.array_equal(lv, wv)

    # single-value degenerate pool: duplicates collapse in-group, no
    # overflow, saturation completes
    pool4 = np.full(N, 12345, np.uint64)
    v, c, n, ok = bottom_k_threshold(
        jnp.asarray(pool4), jnp.ones(N, bool), s=s, need_counts=False, compact=True
    )
    assert bool(ok) and int(n) == 1 and int(np.asarray(v)[0]) == 12345
