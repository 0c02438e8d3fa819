"""Transitive clustering: connected components on a pair/edge DataFrame.

The north rule's final stage: accepted match pairs → entity clusters by
transitive closure, via the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
a pure-DataFrame iteration, checkpointed per round so lineage stays bounded
and any round can resume from its last materialized state.

Algorithm (on undirected edges (u, v), node ids are longs):
- large-star: for each node u, connect every strictly-larger neighbor v > u
  to u's minimum neighbor (including u itself);
- small-star: for each node u, connect every neighbor ≤ u (and u) to the
  minimum such neighbor.
Iterate until the edge set is stable; final edges (u → root) give
``component = min node id`` per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from automatedreclin_spark.operators.util import cut_lineage


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set, self-loops dropped, canonical (min, max) order."""
    return (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    # Neighborhoods over both directions; emit (v, m) for v > u where
    # m = min(neighbors(u) ∪ {u}).
    nbrs = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn")).withColumn(
        "m", F.least("mn", F.col("u"))
    ).select("u", "m")
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # Orient edges so u >= v; for each u connect all small neighbors and u to
    # the minimum small neighbor.
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    to_min = oriented.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_to_min = mins.select(F.col("u"), F.col("m").alias("v"))
    return to_min.unionAll(self_to_min)


def connected_components(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns (id, component) for every node appearing in ``edges``;
    component = minimum node id in the cluster.

    Each round = two shuffles (groupBy min + join) per star step; lineage is
    cut every round via localCheckpoint (or a parquet round-trip when
    ``checkpoint_dir`` is given, which is also the resume point at scale).
    Converges in O(log n) rounds.
    """
    spark = edges.sparkSession
    e = _canonical(edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v")))
    all_nodes = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .distinct()
    ).persist()
    all_nodes.count()

    for i in range(max_iter):
        e2 = _canonical(_small_star(_large_star(e)))
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/cc_iter_{i}"
            e2.write.mode("overwrite").parquet(path)
            e2 = spark.read.parquet(path)
        else:
            # localCheckpoint single-JVM; reliable checkpoint when the
            # cluster sets sc.setCheckpointDir (operators/util.cut_lineage)
            e2 = cut_lineage(e2)
        # Convergence: identical edge sets (both canonical) — two anti-joins.
        diff = e2.exceptAll(e).limit(1).count() + e.exceptAll(e2).limit(1).count()
        e = e2
        if diff == 0:
            break

    # Converged canonical edges are (root=u, member=v) with root = min id.
    roots = (
        e.select(F.col("v").alias("id"), F.col("u").alias("component"))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    out = (
        all_nodes.join(roots, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    all_nodes.unpersist()
    return out


def cluster_matches(
    matched_pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    a_namespace: int = 0,
    b_namespace: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Entity clusters from accepted match pairs of TWO record sets: A ids and
    B ids live in different namespaces, so encode node = id * 2 + namespace
    before the closure. Returns (side, id, entity_id)."""
    edges = matched_pairs.select(
        (F.col(a_col) * 2 + a_namespace).alias("u"),
        (F.col(b_col) * 2 + b_namespace).alias("v"),
    )
    comp = connected_components(edges, checkpoint_dir=checkpoint_dir)
    return comp.select(
        (F.col("id") % 2).cast("int").alias("side"),
        ((F.col("id") - F.col("id") % 2) / 2).cast("long").alias("id"),
        F.col("component").alias("entity_id"),
    )
