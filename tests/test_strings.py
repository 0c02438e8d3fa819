"""Comparator kernel goldens (reference inst/tinytest/test_comparators.R:3-13
and test_comparison_vectors.R:26-35)."""

import pytest

from automatedreclin_spark.functions.strings import (
    jaro_similarity,
    jaro_winkler_similarity,
    levenshtein,
)

GOLDEN_JW_COMPLEMENT = [
    ("Smith", "Smitth", 0.0555555555555556),
    ("James", "Ema", 0.4777777777777778),
    ("James", "Wimliam", 0.5523809523809524),
    ("James", "Olivia", 1.0),
    ("James", "Charlotte", 0.5629629629629630),
    ("Smith", "Johnson", 0.5523809523809524),
    ("Smith", "Bron", 1.0),
    ("Smith", "Tailor", 0.5444444444444445),
    ("Smith", "Moore", 1.0),
]


@pytest.mark.parametrize("x,y,expected", GOLDEN_JW_COMPLEMENT)
def test_jaro_complement_goldens(x, y, expected):
    assert 1.0 - jaro_similarity(x, y) == pytest.approx(expected, abs=1e-12)


def test_jaro_identity_and_empty():
    assert jaro_similarity("abc", "abc") == 1.0
    # DuckDB convention: any empty side -> 0.0
    assert jaro_similarity("", "") == 0.0
    assert jaro_similarity("a", "") == 0.0


def test_jaro_winkler_prefix_boost():
    # DuckDB jaro_winkler_similarity('Smith','Smitth') = 0.9666...
    assert jaro_winkler_similarity("Smith", "Smitth") == pytest.approx(
        0.9666666666666667, abs=1e-12
    )
    # no common prefix -> equals plain jaro
    assert jaro_winkler_similarity("James", "Ema") == pytest.approx(
        jaro_similarity("James", "Ema"), abs=1e-15
    )


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_jaro_matches_duckdb_on_random_strings():
    duckdb = pytest.importorskip("duckdb")
    import random

    rng = random.Random(7)
    con = duckdb.connect()
    alphabet = "abcdefg "
    for _ in range(300):
        x = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))).strip()
        y = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))).strip()
        d = con.execute("select jaro_similarity(?, ?)", [x, y]).fetchone()[0]
        assert jaro_similarity(x, y) == pytest.approx(d, abs=1e-12), (x, y)


def test_jaro_batch_exact_parity_with_scalar():
    """jaro_similarity_batch (the Arrow hot path) must be bit-identical to the
    scalar kernel on every row — goldens, random strings, empties, Nones,
    long-string fallback rows."""
    import random

    import numpy as np

    from automatedreclin_spark.functions.strings import jaro_similarity_batch

    rng = random.Random(42)
    alphabet = "abcdef  "

    def rnd(lo, hi):
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi)))

    cases = [(x, y) for x, y, _ in GOLDEN_JW_COMPLEMENT]
    cases += [("", "x"), ("", ""), ("a", "a"), (None, "x"), ("x", None), (None, None)]
    cases += [(rnd(0, 30), rnd(0, 30)) for _ in range(3000)]
    cases += [(rnd(60, 120), rnd(60, 120)) for _ in range(40)]  # long fallback
    xs = [c[0] for c in cases]
    ys = [c[1] for c in cases]
    got = jaro_similarity_batch(xs, ys)
    for i, (a, b) in enumerate(cases):
        if a is None or b is None:
            assert np.isnan(got[i])
        else:
            assert got[i] == jaro_similarity(a, b), (a, b)
