"""Text analysis operators for corpus curation: language ID, quality scoring,
token counting, document fingerprinting. All pure Catalyst except language ID
(vectorized pandas UDF with a driver-built n-gram profile table).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from automatedreclin_spark.operators.blocking import MERSENNE_61, token_hash_expr

# Tiny public stopword seeds per language for the heuristic language ID.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "de", "que", "los", "en", "una", "es", "por", "con"],
}


def token_count_expr(text_col, pattern: str = r"\s+") -> Column:
    """Whitespace token count (0 for empty strings)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), pattern))
    )


def bpe_ish_token_count_expr(text_col) -> Column:
    """A BPE-ish subword count: words + digits + punctuation runs, counting a
    long word as ceil(len/4) subwords (the usual ~4 chars/token rule)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    pieces = F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    return F.aggregate(
        pieces, F.lit(0), lambda acc, p: acc + F.ceil(F.length(p) / 4.0).cast("int")
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality signals: length, token stats, punctuation /
    digit / uppercase ratios, lexical diversity, mean word length — the usual
    corpus-filter features, all whole-stage-codegen expressions."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    n_chars = F.length(t)
    n_tokens = token_count_expr(text_col)
    distinct_tokens = F.size(F.array_distinct(toks))
    punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        distinct_tokens.alias("n_distinct_tokens"),
        F.when(n_tokens > 0, distinct_tokens / n_tokens).otherwise(0.0)
        .alias("lexical_diversity"),
        F.when(n_chars > 0, punct / n_chars).otherwise(0.0).alias("punct_ratio"),
        F.when(n_chars > 0, digits / n_chars).otherwise(0.0).alias("digit_ratio"),
        F.when(n_chars > 0, upper / n_chars).otherwise(0.0).alias("upper_ratio"),
        F.when(n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens).otherwise(0.0)
        .alias("mean_word_len"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str,
                  min_tokens: int = 10, max_mean_word_len: float = 12.0) -> DataFrame:
    """Composite [0,1] quality score + keep verdict (heuristic corpus filter)."""
    feats = quality_features(df, id_col, text_col)
    score = (
        F.least(F.lit(1.0), F.col("n_tokens") / 64.0) * 0.4
        + F.col("lexical_diversity") * 0.3
        + (1.0 - F.least(F.lit(1.0), F.col("punct_ratio") * 5)) * 0.15
        + (1.0 - F.least(F.lit(1.0), F.col("digit_ratio") * 5)) * 0.15
    )
    return feats.withColumn("quality", F.round(score, 6)).withColumn(
        "keep",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("mean_word_len") <= max_mean_word_len),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: stopword-marker hit counts per language, CJK
    codepoint share for zh. Vectorized pandas UDF (pure pandas string ops),
    profiles built on the driver. Returns (id, lang_pred, lang_conf)."""
    markers = {k: set(v) for k, v in _LANG_MARKERS.items()}

    @pandas_udf("struct<lang_pred: string, lang_conf: double>")
    def _langid(text: pd.Series) -> pd.DataFrame:
        out_lang, out_conf = [], []
        for s in text:
            if s is None or not s.strip():
                out_lang.append("und"); out_conf.append(0.0)
                continue
            cjk = sum(1 for ch in s if "一" <= ch <= "鿿")
            if cjk / max(1, len(s)) > 0.2:
                out_lang.append("zh"); out_conf.append(round(cjk / len(s), 6))
                continue
            toks = s.lower().split()
            scores = {
                lang: sum(1 for t in toks if t in mk) / max(1, len(toks))
                for lang, mk in markers.items()
            }
            best = max(scores, key=scores.get)
            if scores[best] == 0.0:
                out_lang.append("und"); out_conf.append(0.0)
            else:
                out_lang.append(best); out_conf.append(round(scores[best], 6))
        return pd.DataFrame({"lang_pred": out_lang, "lang_conf": out_conf})

    res = df.select(F.col(id_col).alias("id"), _langid(F.col(text_col)).alias("r"))
    return res.select("id", "r.lang_pred", "r.lang_conf")


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03): k-gram
    rolling hashes → per-window minimum → distinct fingerprint set. Pure
    Catalyst: the k-gram hashes reuse the shared md5-derived token hash, the
    window minimum is a transform over a sliding index sequence. Returns
    (id, fingerprints array<long>, n_fingerprints)."""
    # Stage each array as a materialized column: a nested lambda that
    # references an un-staged array expression makes Catalyst re-evaluate the
    # whole producer (md5 per k-gram) PER OUTER INDEX — O(m²) hashing. With
    # staging it is computed once per row.
    staged = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_text"))
        .withColumn("_toks", F.split(F.lower(F.col("_text")), r"\s+"))
        .withColumn(
            "_kg",
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("_toks") - k, F.lit(0))),
                lambda i: (
                    token_hash_expr(F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k)))
                    % F.lit(MERSENNE_61)
                ).cast("long"),
            ),
        )
        .withColumn(
            "_mins",
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("_kg") - window, F.lit(0))),
                lambda i: F.array_min(F.slice(F.col("_kg"), i + 1, window)),
            ),
        )
        .withColumn("fingerprints", F.array_distinct("_mins"))
    )
    return staged.select(
        "id", "fingerprints", F.size("fingerprints").alias("n_fingerprints")
    )
