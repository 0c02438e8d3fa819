"""Pure-Python string similarity kernels used inside Arrow-batched pandas UDFs.

No rapidfuzz/jellyfish in this environment, so the kernels are implemented
here from the published algorithm definitions. Semantics are pinned to the
reference goldens (``inst/tinytest/test_comparators.R:3-13``):

    jaro_similarity("Smith", "Smitth")  == 0.9444444444444444
    jaro_similarity("James", "Ema")     == 0.5222222222222223

(The reference's ``jarowinkler_complement`` wraps reclin2/stringdist's ``jw``
with default p = 0, i.e. plain Jaro — the Winkler prefix boost is OFF. DuckDB's
``jaro_similarity`` matches these values exactly, which is what the driver's
oracle uses.)

Edge conventions follow DuckDB: if either string is empty the similarity is
0.0 (including both-empty). Null handling lives in the UDF wrappers.
"""

from __future__ import annotations


def jaro_similarity(s1: str, s2: str) -> float:
    """Standard Jaro similarity (no Winkler prefix boost).

    Bit-parallel matcher for strings ≤ 64 chars (~1.8× the classic loop):
    per-character position bitmasks of s2, greedy first-unmatched match via
    ``mask & window & ~matched``, lowest-set-bit extraction. Exact parity with
    the classic algorithm (asserted against DuckDB jaro_similarity in tests).
    """
    len1 = len(s1)
    len2 = len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    if len1 > 64 or len2 > 64:
        return _jaro_similarity_long(s1, s2)

    mw = max(len1, len2) // 2 - 1
    if mw < 0:
        mw = 0
    masks: dict[str, int] = {}
    for j, c in enumerate(s2):
        masks[c] = masks.get(c, 0) | (1 << j)
    full = (1 << len2) - 1
    matched2 = 0
    m1: list[str] = []
    for i, c in enumerate(s1):
        mk = masks.get(c)
        if mk is None:
            continue
        lo = i - mw
        if lo < 0:
            lo = 0
        win = ((1 << (i + mw + 1)) - 1) & full
        if lo:
            win &= ~((1 << lo) - 1)
        avail = mk & win & ~matched2
        if avail:
            matched2 |= avail & (-avail)   # take the lowest unmatched position
            m1.append(c)
    matches = len(m1)
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    mm = matched2
    while mm:
        j = (mm & -mm).bit_length() - 1
        if s2[j] != m1[k]:
            transpositions += 1
        k += 1
        mm &= mm - 1
    transpositions //= 2
    m = float(matches)
    return (m / len1 + m / len2 + (m - transpositions) / m) / 3.0


def _jaro_similarity_long(s1: str, s2: str) -> float:
    """Classic O(n·window) Jaro for strings longer than 64 chars."""
    len1 = len(s1)
    len2 = len(s2)
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0

    matched1 = [False] * len1
    matched2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = i - match_window
        if lo < 0:
            lo = 0
        hi = i + match_window + 1
        if hi > len2:
            hi = len2
        for j in range(lo, hi):
            if not matched2[j] and s2[j] == c:
                matched1[i] = True
                matched2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0

    transpositions = 0
    j = 0
    for i in range(len1):
        if matched1[i]:
            while not matched2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    transpositions //= 2

    m = float(matches)
    return (m / len1 + m / len2 + (m - transpositions) / m) / 3.0


def jaro_winkler_similarity(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler similarity with prefix scaling factor ``p`` (default 0.1).

    Matches DuckDB's ``jaro_winkler_similarity``. Note the reference package's
    "jarowinkler" comparator is plain Jaro (p=0) — see module docstring.
    """
    jaro = jaro_similarity(s1, s2)
    if jaro <= 0.0:
        return jaro
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * p * (1.0 - jaro)


def levenshtein(s1: str, s2: str) -> int:
    """Plain edit distance (insert/delete/substitute, unit costs).

    Spark has a native ``F.levenshtein`` — this Python kernel exists only for
    unit tests and non-Spark callers.
    """
    if s1 == s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if len(s2) == 0:
        return len(s1)
    previous = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        current = [i + 1]
        for j, c2 in enumerate(s2):
            current.append(min(previous[j + 1] + 1, current[j] + 1, previous[j] + (c1 != c2)))
        previous = current
    return previous[-1]


# --------------------------------------------------------------------------
# Batch-vectorized Jaro (numpy) — the Arrow hot path.
# --------------------------------------------------------------------------

import numpy as np  # noqa: E402

# Pad sentinels: valid Unicode codepoints stop at 0x10FFFF, so these can never
# equal a real character — and they differ between sides, so padding never
# matches padding.
_PAD_A = np.uint32(0xFFFFFFFE)
_PAD_B = np.uint32(0xFFFFFFFF)


def _encode_padded(strs: list, lens: np.ndarray, width: int, pad: np.uint32) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, right-padded with ``pad``.

    One ``''.join`` + one utf-32 encode + one frombuffer for the whole batch,
    scattered into the matrix with fancy indexing — no per-string Python."""
    n = len(strs)
    out = np.full((n, width), pad, dtype=np.uint32)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    idx_row = np.repeat(np.arange(n), lens)
    idx_col = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    out[idx_row, idx_col] = flat
    return out


def jaro_similarity_batch(xs, ys, long_cutoff: int = 64) -> np.ndarray:
    """Jaro similarity for a whole Arrow batch at once, vectorized across the
    batch with numpy (the per-row kernel above is exact but Python-loop bound;
    this computes the identical IEEE-double result ~10× faster inside pandas
    UDFs — the difference between the cv_jaro and cv_levenshtein rows of
    BENCH).

    The greedy matcher runs one numpy pass per s1 position (≤ max len1 in the
    batch): ``eq = (B == A[:, i]) & window & ~used`` then first-set-column via
    argmax — O(L · batch · L) elementwise ops, all C loops. Transpositions
    come from cumsum-scatter of the matched characters on both sides.

    None/NaN inputs yield NaN. Rows with either side longer than
    ``long_cutoff`` fall back to the scalar kernel (keeps the batch matrices
    small when a stray long string appears).
    """
    n = len(xs)
    out = np.zeros(n, dtype=np.float64)
    xs = list(xs)
    ys = list(ys)
    len1 = np.array([len(s) if isinstance(s, str) else -1 for s in xs], dtype=np.int64)
    len2 = np.array([len(s) if isinstance(s, str) else -1 for s in ys], dtype=np.int64)

    null = (len1 < 0) | (len2 < 0)
    empty = ~null & ((len1 == 0) | (len2 == 0))
    equal = ~null & ~empty & np.array(
        [a == b for a, b in zip(xs, ys)], dtype=bool
    )
    long = ~null & ~empty & ~equal & ((len1 > long_cutoff) | (len2 > long_cutoff))
    out[null] = np.nan
    out[equal] = 1.0
    for i in np.nonzero(long)[0]:
        out[i] = jaro_similarity(xs[i], ys[i])

    act = ~(null | empty | equal | long)
    m = int(act.sum())
    if m == 0:
        return out
    rows = np.nonzero(act)[0]
    l1 = len1[rows]
    l2 = len2[rows]
    L1 = int(l1.max())
    L2 = int(l2.max())
    A = _encode_padded([xs[i] for i in rows], l1, L1, _PAD_A)
    B = _encode_padded([ys[i] for i in rows], l2, L2, _PAD_B)

    mw = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    jpos = np.arange(L2, dtype=np.int64)
    used2 = np.zeros((m, L2), dtype=bool)
    matched = np.zeros(m, dtype=np.int64)
    m1 = np.full((m, min(L1, L2)), _PAD_A, dtype=np.uint32)
    ar = np.arange(m)
    for i in range(L1):
        lo = np.maximum(i - mw, 0)
        hi = np.minimum(i + mw + 1, l2)
        eq = (B == A[:, i : i + 1]) & (jpos >= lo[:, None]) & (jpos < hi[:, None]) & ~used2
        if not eq.any():
            continue
        j = eq.argmax(axis=1)
        has = eq[ar, j]
        hr = ar[has]
        used2[hr, j[has]] = True
        m1[hr, matched[has]] = A[has, i]
        matched[has] += 1

    # s2's matched characters compacted in position order via cumsum-scatter.
    k2 = np.cumsum(used2, axis=1) - 1
    seq2 = np.full_like(m1, _PAD_B)
    r2, c2 = np.nonzero(used2)
    seq2[r2, k2[r2, c2]] = B[r2, c2]

    valid = np.arange(m1.shape[1])[None, :] < matched[:, None]
    trans = ((m1 != seq2) & valid).sum(axis=1) // 2

    sim = np.zeros(m, dtype=np.float64)
    nz = matched > 0
    mc = matched[nz].astype(np.float64)
    sim[nz] = (
        mc / l1[nz] + mc / l2[nz] + (mc - trans[nz].astype(np.float64)) / mc
    ) / 3.0
    out[rows] = sim
    return out
