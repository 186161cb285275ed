"""K-finger extractor unit tests (fingerprint_utils.py:9-90 semantics).

The reference implementation was cross-validated at development time on
500 random cases; these tests pin the behavior with hand-checked examples.
(The reference itself crashes on windows whose interior is empty — ours
returns None for the enriched string instead.)
"""

from fpmash_tpu.utils.kfinger import compute_windows, enrich_string, normalize


def test_normalize():
    assert normalize([1, 2, 3]) == [1, 2, 3]
    assert normalize([3, 2, 1]) == [1, 2, 3]
    assert normalize([2, 1, 2]) == [2, 1, 2]
    assert normalize([2, 1, 1]) == [1, 1, 2]


def test_windows_basic():
    out = compute_windows([5, 1, 4, 2], 3)
    # windows [5,1,4] -> normalized [4,1,5]; [1,4,2] -> [1,4,2]
    assert out == [[4, 1, 5], [1, 4, 2]]


def test_windows_extended_padding():
    out = compute_windows([7, 3], 4, extended=True)
    # padded to [7,3,-1,-1]; reversed [-1,-1,3,7] is smaller
    assert out == [[-1, -1, 3, 7]]


def test_enrich_string_single_inner():
    # window of 3 factors: inner = [middle]; short -> reverse complement
    s = enrich_string(["AAA", "ACGT", "TTT"])
    assert s == "ACGT" + "N" * 16  # revcomp(ACGT) == ACGT


def test_enrich_string_long_inner():
    base = "A" * 15 + "C" * 15  # 30 chars -> clip 10+10 then revcomp
    s = enrich_string(["G", base, "T"])
    assert s == ("G" * 10 + "T" * 10) + ""  # revcomp(A*10 + C*10)
    assert len(s) == 20


def test_enrich_string_multiple_inner_picks_longest():
    # inner = [AC, GGGG, T]: longest GGGG; revcomp -> CCCC; short path
    # re-complements back (reference quirk) -> GGGG
    s = enrich_string(["A", "AC", "GGGG", "T", "C"])
    assert s == "GGGG" + "N" * 16


def test_windows_with_facts():
    out = compute_windows([1, 4, 1], 3, facts=["A", "ACGT", "T"])
    assert len(out) == 1
    window = out[0]
    assert window[:3] == [1, 4, 1]
    assert window[3] == "ACGT" + "N" * 16
