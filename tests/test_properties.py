"""Property-based robustness tests (hypothesis)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from automatedreclin_spark.functions.strings import (
    _jaro_similarity_long,
    jaro_similarity,
    levenshtein,
)
from automatedreclin_spark.operators.selection import greedy_select_local

short_text = st.text(alphabet="abcde f", max_size=20)


@given(short_text, short_text)
@settings(max_examples=300, deadline=None)
def test_bitparallel_jaro_equals_classic(x, y):
    if len(x) == 0 or len(y) == 0 or x == y:
        return
    assert abs(jaro_similarity(x, y) - _jaro_similarity_long(x, y)) < 1e-15


@given(short_text, short_text)
@settings(max_examples=200, deadline=None)
def test_jaro_symmetric_and_bounded(x, y):
    s = jaro_similarity(x, y)
    assert 0.0 <= s <= 1.0
    assert s == jaro_similarity(y, x)


@given(short_text, short_text)
@settings(max_examples=200, deadline=None)
def test_levenshtein_triangle_via_identity(x, y):
    d = levenshtein(x, y)
    assert d == levenshtein(y, x)
    assert d >= abs(len(x) - len(y))
    assert d <= max(len(x), len(y))


@st.composite
def _pair_instances(draw):
    n = draw(st.integers(1, 40))
    a = draw(st.lists(st.integers(1, 12), min_size=n, max_size=n))
    b = draw(st.lists(st.integers(1, 12), min_size=n, max_size=n))
    ratio = draw(st.lists(
        st.floats(0, 100, allow_nan=False, allow_infinity=False),
        min_size=n, max_size=n))
    # dedup (a, b) pairs like a real pair table
    seen, idx = set(), []
    for i in range(n):
        if (a[i], b[i]) not in seen:
            seen.add((a[i], b[i]))
            idx.append(i)
    sel = lambda xs: np.array([xs[i] for i in idx])
    return sel(a), sel(b), sel(ratio).astype(float)


@given(_pair_instances(), st.floats(0, 20, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_greedy_is_one_to_one_and_budgeted(inst, n_M):
    a, b, ratio = inst
    sel = greedy_select_local(a, b, ratio, n_M)
    # one-to-one and budget
    assert len(set(a[sel])) == len(sel)
    assert len(set(b[sel])) == len(sel)
    assert len(sel) <= round(n_M) if round(n_M) > 0 else len(sel) == 0
    # prefix property: selections are greedy-maximal — every selected pair's
    # ratio is >= any unselected pair that would still have been admissible
    # at that point. Weak check: selected ratios sorted descending.
    ratios = ratio[sel]
    assert all(ratios[i] >= ratios[i + 1] - 1e-12 for i in range(len(ratios) - 1))


@given(_pair_instances())
@settings(max_examples=100, deadline=None)
def test_greedy_budget_monotone(inst):
    """Budget k selection is a prefix of budget k+1 selection."""
    a, b, ratio = inst
    prev = []
    for k in range(0, min(len(a), 6) + 1):
        sel = list(greedy_select_local(a, b, ratio, float(k)))
        assert sel[: len(prev)] == prev
        prev = sel


@given(_pair_instances(), st.floats(0, 20, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_greedy_duplicates_in_A_b_side_free(inst, n_M):
    """duplicates_in_A=True (internals.R:525-533): A ids unique in the
    selection, B ids free to repeat, budget respected, and the selection is
    never smaller than the one-to-one selection under the same budget (a
    relaxed constraint can only admit more pairs)."""
    a, b, ratio = inst
    sel_dup = greedy_select_local(a, b, ratio, n_M, duplicates_in_A=True)
    assert len(set(a[sel_dup])) == len(sel_dup)
    if round(n_M) > 0:
        assert len(sel_dup) <= round(n_M)
    else:
        assert len(sel_dup) == 0
    ratios = ratio[sel_dup]
    assert all(ratios[i] >= ratios[i + 1] - 1e-12 for i in range(len(ratios) - 1))
    sel_one = greedy_select_local(a, b, ratio, n_M)
    assert len(sel_dup) >= len(sel_one)
