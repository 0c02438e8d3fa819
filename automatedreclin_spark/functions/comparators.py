"""Comparator registry: pluggable column-pair → gamma-column functions.

Mirrors the reference's user-pluggable comparator surface
(``comparison_vectors.R:78-88``, ``comparators.R:15-42``) as a Spark-first
design: a comparator is a callable ``(Column, Column) -> Column`` producing a
DoubleType "gamma" where 0 ⇔ exact agreement (semi-metric axioms,
``unsupervised_learning.R:60-66``).

Catalyst-native comparators (equality, abs distance, Levenshtein, token
Jaccard) stay entirely JVM-side inside whole-stage codegen. String-similarity
comparators with no Spark builtin (Jaro) are Arrow-batched pandas UDFs — whole
``pd.Series`` in, whole ``pd.Series`` out, no row-at-a-time Spark UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from automatedreclin_spark.functions import strings as _str


class Comparator:
    """Base comparator: callable (left Column, right Column) -> gamma Column."""

    #: True when the gamma is {0,1}-valued (usable by the `binary` method family).
    is_binary = False

    def __call__(self, left: Column, right: Column) -> Column:  # pragma: no cover
        raise NotImplementedError


class cmp_identical(Comparator):
    """Binary agreement: 1 if equal, 0 otherwise.

    Note the reference convention (via reclin2 ``cmp_identical``): gamma is an
    *agreement* indicator there (1 = equal). The reference's binary MEC treats
    gamma=1 as agreement (``theta = mean(gamma|M)`` ≈ 1 for matches,
    ``internals.R:17-23``), so we keep 1 = agreement for binary comparators and
    0 ⇔ agreement for distance comparators — exactly the reference's mixed
    convention (``comparison_vectors.R:86``, ``unsupervised_learning.R:72-73``).
    """

    is_binary = True

    def __call__(self, left: Column, right: Column) -> Column:
        # NULL on either side propagates to NULL and is caught by the
        # non-finite gamma guard (comparison_vectors.R:153-172 semantics).
        return (left == right).cast("double")


class abs_distance(Comparator):
    """|x - y| for numeric variables (comparators.R:15-19)."""

    def __call__(self, left: Column, right: Column) -> Column:
        return F.abs(left.cast("double") - right.cast("double"))


class jarowinkler_complement(Comparator):
    """1 − Jaro similarity (the reference's ``jarowinkler_complement()``,
    comparators.R:37-42 — stringdist ``jw`` with default p=0).

    Arrow-batched pandas UDF; NULL in → NULL out (then the gamma guard fires).

    NOTE: gamma is NOT a faithful equality witness — the DuckDB empty-string
    convention scores ("", "") as similarity 0 (gamma 1), while "" == "" is
    true. Exact-agreement seeds therefore come from the raw-equality seed
    flag built by comparison_vectors(seed_flag_variables=...), never from a
    gamma-value predicate.
    """

    def __call__(self, left: Column, right: Column) -> Column:
        @pandas_udf("double")
        def _jw_complement(x: pd.Series, y: pd.Series) -> pd.Series:
            # Batch-vectorized numpy kernel (strings.jaro_similarity_batch):
            # one numpy pass per s1 position over the whole Arrow batch — no
            # per-row Python in the hot path. None → NaN → gamma guard.
            sim = _str.jaro_similarity_batch(x.to_numpy(dtype=object),
                                             y.to_numpy(dtype=object))
            return pd.Series(1.0 - sim, dtype="float64")

        return _jw_complement(left, right)


class jaro_winkler(Comparator):
    """1 − Jaro-Winkler similarity (p=0.1 prefix boost; DuckDB-compatible)."""

    def __init__(self, p: float = 0.1, max_prefix: int = 4):
        self.p = p
        self.max_prefix = max_prefix

    def __call__(self, left: Column, right: Column) -> Column:
        p, max_prefix = self.p, self.max_prefix

        @pandas_udf("double")
        def _jw(x: pd.Series, y: pd.Series) -> pd.Series:
            sim = _str.jaro_winkler_similarity
            out = [
                None if (a is None or b is None) else 1.0 - sim(a, b, p, max_prefix)
                for a, b in zip(x, y)
            ]
            return pd.Series(out, dtype="float64")

        return _jw(left, right)


class levenshtein_norm(Comparator):
    """Levenshtein distance normalized by max length → [0,1]. Pure Catalyst
    (native ``F.levenshtein``), 0 ⇔ exact agreement (distance is an integer
    ≥ 1 for distinct strings, and the maxlen==0 branch means both empty)."""

    def __call__(self, left: Column, right: Column) -> Column:
        maxlen = F.greatest(F.length(left), F.length(right))
        return F.when(maxlen == 0, F.lit(0.0)).otherwise(
            F.levenshtein(left, right).cast("double") / maxlen.cast("double")
        )


class token_jaccard(Comparator):
    """1 − Jaccard similarity of distinct token sets. Pure Catalyst:
    split → array_distinct → array_intersect/array_union sizes.

    ``pattern`` is the split regex (default: whitespace)."""

    def __init__(self, pattern: str = r"\s+"):
        self.pattern = pattern

    def __call__(self, left: Column, right: Column) -> Column:
        la = F.array_distinct(F.split(left, self.pattern))
        lb = F.array_distinct(F.split(right, self.pattern))
        union = F.size(F.array_union(la, lb))
        inter = F.size(F.array_intersect(la, lb))
        return F.when(union == 0, F.lit(0.0)).otherwise(
            1.0 - inter.cast("double") / union.cast("double")
        )


#: name → constructor, the user-facing registry (mirrors the named-list
#: comparator surface of comparison_vectors.R:78-88).
COMPARATOR_REGISTRY: dict[str, type[Comparator]] = {
    "identical": cmp_identical,
    "abs_distance": abs_distance,
    "jarowinkler_complement": jarowinkler_complement,
    "jaro_winkler": jaro_winkler,
    "levenshtein_norm": levenshtein_norm,
    "token_jaccard": token_jaccard,
}
