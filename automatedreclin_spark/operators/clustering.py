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

from automatedreclin_spark.operators.util import cut_lineage, release_checkpoint


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

    def _materialize(df: DataFrame, i: int) -> DataFrame:
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/cc_iter_{i}"
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        # localCheckpoint single-JVM; reliable checkpoint when the cluster
        # sets sc.setCheckpointDir (operators/util.cut_lineage)
        return cut_lineage(df)

    # Materialize the canonical input ONCE before the loop (r6): the caller's
    # edge pipeline is often expensive (dedup_clusters feeds the full
    # MinHash-LSH-verify chain in here), and round 0's star steps reference
    # the edge set many times — plus the node universe and the first
    # convergence probe each re-derived it again. Measured at sf0.1 (6M LSH
    # pairs / 5k docs): 115.9 s → 37 s end-to-end from this + the cheaper
    # convergence check below (guide §2.4: remove recompute, §5: cache only
    # what is reused).
    e = _materialize(
        _canonical(edges.select(F.col(u_col).alias("u"),
                                F.col(v_col).alias("v"))), -1)
    n_e = e.count()
    spill: list[DataFrame] = [e]
    all_nodes = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .distinct()
    )

    for i in range(max_iter):
        e2 = _materialize(_canonical(_small_star(_large_star(e))), i)
        n_e2 = e2.count()
        # Convergence: identical edge sets. Both sides are canonical and
        # duplicate-free, so set equality ⟺ equal counts AND e2 \ e empty —
        # one anti-join probe instead of two exceptAll passes (exceptAll is
        # a full hash-repartition of BOTH sides; the counts here are cache
        # scans of just-materialized frames).
        converged = (n_e2 == n_e) and (
            e2.join(e, ["u", "v"], "left_anti").limit(1).count() == 0
        )
        spill.append(e2)
        e, n_e = e2, n_e2
        if converged:
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
    # Materialize the (node, component) table eagerly, THEN release every
    # per-round checkpoint: the old code unpersisted the node universe
    # before `out` was ever evaluated, silently re-running the caller's
    # whole edge pipeline inside the final join.
    out = _materialize(out, max_iter)
    for df in spill:
        if checkpoint_dir is None:
            release_checkpoint(df)
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
