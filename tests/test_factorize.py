"""Device factorization-family kernels vs the scalar parity models.

The ICFL automaton (ops/icfl.py) and the boundary-mask composition
(ops/factorize.py) must equal the pure-Python models for every family on
random, degenerate, and adversarial inputs — the scalar models themselves
are pinned to the vendored reference goldens in test_fingerprint.py.
"""

from __future__ import annotations

import random

import numpy as np
import pytest


def _words(seed, n=250, alphabets=("ACGT", "ACGT", "AC", "ACGTN")):
    random.seed(seed)
    out = []
    for _ in range(n):
        L = random.randint(1, 120)
        alpha = random.choice(alphabets)
        out.append("".join(random.choice(alpha) for _ in range(L)))
    out += [
        "A" * 100,
        "ACGT" * 25,
        "T" * 99 + "A",
        "A",
        "GATTACA" * 14,
        "N" * 50,
        ("AB" * 50),
        ("BBA" * 33)[:99],
        "CACB" * 25,
    ]
    return out


def test_icfl_kernel_matches_scalar():
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl import icfl_boundary_mask
    from fpmash_tpu.ops.lyndon import encode_batch, lengths_from_boundary
    from fpmash_tpu.scalar.lyndon import icfl

    words = _words(3)
    arr, lens = encode_batch(words)
    mask, ok = icfl_boundary_mask(jnp.asarray(arr), jnp.asarray(lens))
    fl, fc = jax.device_get(lengths_from_boundary(mask, jnp.asarray(lens)))
    assert bool(np.asarray(ok).all())
    for k, w in enumerate(words):
        ref = [len(f) for f in icfl(w)]
        assert ref == list(map(int, fl[k, : fc[k]])), (k, w[:40])


@pytest.mark.parametrize("family", [
    "ICFL",
    "CFL_ICFL-10",
    "CFL_COMB",
    "ICFL_COMB",
    "CFL_ICFL_COMB-10",
    "CFL_ICFL_COMB-30",
])
def test_family_kernels_match_scalar(family):
    from fpmash_tpu.ops.factorize import factorize_windows_device
    from fpmash_tpu.scalar.lyndon import FACTORIZATIONS

    words = _words(hash(family) % 1000)
    got = factorize_windows_device(words, family)
    fn = FACTORIZATIONS[family]
    for w, g in zip(words, got):
        ref = [len(f) for f in fn(w) if f not in ("<<", ">>")]
        assert ref == g, (family, w[:40])


def test_icfl_segmented_matches_per_segment_runs():
    """The multi-segment automaton (used by CFL_ICFL) must equal running
    plain ICFL on each segment independently."""
    import jax
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl import icfl_boundary_words
    from fpmash_tpu.ops.lyndon import encode_batch, unpack_boundary_words
    from fpmash_tpu.scalar.lyndon import icfl

    random.seed(17)
    rows = []
    segs = []
    for _ in range(40):
        parts = ["".join(random.choice("ACGT") for _ in range(random.randint(2, 40)))
                 for _ in range(random.randint(1, 4))]
        rows.append("".join(parts))
        segs.append(parts)
    arr, lens = encode_batch(rows)
    S = max(len(p) for p in segs)
    seg_start = np.zeros((len(rows), S), np.int32)
    seg_len = np.zeros((len(rows), S), np.int32)
    nseg = np.zeros(len(rows), np.int32)
    for b, parts in enumerate(segs):
        pos = 0
        for s, part in enumerate(parts):
            seg_start[b, s] = pos
            seg_len[b, s] = len(part)
            pos += len(part)
        nseg[b] = len(parts)
    words, ok = icfl_boundary_words(
        jnp.asarray(arr), jnp.asarray(lens),
        jnp.asarray(seg_start), jnp.asarray(seg_len), jnp.asarray(nseg),
    )
    mask = np.asarray(
        unpack_boundary_words(words, jnp.asarray(lens))[:, : arr.shape[1]]
    )
    assert bool(np.asarray(ok).all())
    for b, parts in enumerate(segs):
        got = set(np.nonzero(mask[b])[0])
        # expected: interior ICFL cuts per segment (segment-start bits are
        # the caller's responsibility and must NOT be emitted)
        want = set()
        pos = 0
        for part in parts:
            cut = pos
            for f in icfl(part)[:-1]:
                cut += len(f)
                want.add(cut)
            pos += len(part)
        assert got == want, (b, parts)


def test_icfl_level_overflow_flagged(monkeypatch):
    """Rows needing more than ``lv`` levels must report ok=False, not
    corrupt output."""
    import jax.numpy as jnp

    from fpmash_tpu.ops.icfl import icfl_boundary_words
    from fpmash_tpu.ops.lyndon import encode_batch

    # adversarial-ish word with several levels + tiny capacity
    w = "ACACGTGT" * 12
    arr, lens = encode_batch([w])
    n = jnp.asarray(lens)
    _, ok = icfl_boundary_words(
        jnp.asarray(arr), n, n[:, None] * 0, n[:, None],
        jnp.ones(1, jnp.int32), lv=1,
    )
    assert not bool(np.asarray(ok)[0])


def test_sketch_device_path_all_families_matches_txt_pipeline(tmp_path):
    """init_from_reads_fingerprint (all-device) == fingerprint .txt ->
    init_from_fingerprints, for a non-CFL family (ICFL_COMB)."""
    import numpy as np

    from fpmash_tpu.models.fingerprint import fingerprint_reads
    from fpmash_tpu.models.sketch import Sketch, SketchParams

    random.seed(5)
    reads = [
        (f"R{k}", "".join(random.choice("ACGT") for _ in range(random.randint(100, 180))))
        for k in range(4)
    ]
    fp_lines, _ = fingerprint_reads(reads, "ICFL_COMB", backend="scalar")
    txt = tmp_path / "fp.txt"
    txt.write_text("".join(fp_lines))
    ref = Sketch(SketchParams().for_fingerprint())
    ref.init_from_fingerprints([str(txt)])

    dev = Sketch(SketchParams().for_fingerprint())
    dev.init_from_reads_fingerprint(reads, factorization="ICFL_COMB")
    assert len(dev.references) == len(ref.references)
    for a, b in zip(dev.references, ref.references):
        assert a.name == b.name
        assert a.length == b.length
        assert np.array_equal(np.asarray(a.hashes), np.asarray(b.hashes))
