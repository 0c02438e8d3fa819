"""Similarity search over embedding columns (array<float/double>).

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small) query
  side, narrow per-row dot products via zip_with/aggregate, window top-k.
  The exactness baseline.
- :func:`lsh_topk` — the scale path: random-hyperplane (signed random
  projection) signatures computed by a vectorized pandas UDF (one matmul per
  Arrow batch), bucket join on signature prefixes (multi-table), exact rerank
  within buckets. Deterministic hyperplanes from a seeded numpy RNG on the
  driver, broadcast to executors.
- :func:`ivf_topk` — IVF-style variant: k-means-lite centroids (sampled,
  driver-side Lloyd iterations in numpy), assign every vector to its nearest
  centroid (vectorized UDF), probe the ``n_probe`` nearest centroids per
  query, exact rerank within probed cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from automatedreclin_spark.operators.util import ensure_parallelism


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_expr(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of every query against the corpus. Query side is
    broadcast (queries are few); the corpus is scanned once, no shuffle until
    the final per-query top-k."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = ensure_parallelism(corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_bits))


def _signature_udf(planes: np.ndarray):
    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())              # (batch, dim) one matmul/batch
        bits = (mat @ planes) > 0                 # (batch, n_bits)
        weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
        return pd.Series(bits.astype(np.int64) @ weights)
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k: per table, signed-random-projection signature
    → equi-join on (table, signature) → exact cosine rerank of the union of
    bucket mates. Recall grows with n_tables; bucket size shrinks with n_bits.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])

    def with_sigs(df: DataFrame, ident: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(ident), _as_double(F.col(vec_col)).alias(f"_v_{ident}"))
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_bits, seed + t)
            out = out.withColumn(f"sig_{t}", _signature_udf(planes)(F.col(f"_v_{ident}")))
        return out

    q = with_sigs(queries, "query_id")
    c = with_sigs(corpus, "neighbor_id")

    cands = None
    for t in range(n_tables):
        qt = q.select("query_id", F.col(f"sig_{t}").alias("sig"))
        ct = c.select("neighbor_id", F.col(f"sig_{t}").alias("sig"))
        pair = qt.join(ct, "sig").select("query_id", "neighbor_id")
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.distinct()

    scored = (
        cands.join(q.select("query_id", "_v_query_id"), "query_id")
        .join(c.select("neighbor_id", "_v_neighbor_id"), "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            cosine_expr(F.col("_v_query_id"), F.col("_v_neighbor_id")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 10_000,
    lloyd_iters: int = 10,
    seed: int = 7,
) -> DataFrame:
    """IVF: train centroids on a driver-side sample (numpy Lloyd), assign
    corpus vectors to cells (vectorized UDF argmax), probe the n_probe
    nearest cells per query, exact rerank inside probed cells. The standard
    trade: recall vs the fraction of the corpus touched (n_probe/n_centroids).
    """
    sample = np.stack(
        corpus.select(_as_double(F.col(vec_col)).alias("v"))
        .limit(sample_size).toPandas()["v"].to_numpy()
    )
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(lloyd_iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(centroids)):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(0)

    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("int")
    def cell_of(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series((mat @ cnorm.T).argmax(1).astype(np.int32))

    @pandas_udf("array<int>")
    def probes_of(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(-(mat @ cnorm.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cell", cell_of("cv"))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("cell", F.explode(probes_of("qv")))

    scored = q.join(c, "cell").select(
        "query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
