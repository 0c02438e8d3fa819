"""Structured Streaming surface for incremental corpus ingestion.

The reference is batch-only (SURVEY.md §2.10 — no streaming surface exists),
but a 100 TB training-data pipeline ingests continuously; these operators
extend the engine with the standard incremental pieces:

- :func:`stream_files` — file-source readStream over a landing directory
  (parquet), the incremental analogue of the S1 ingest.
- :func:`streaming_exact_dedup` — drop exact duplicates across micro-batches
  with ``dropDuplicatesWithinWatermark`` on sha256(content) (state bounded by
  the watermark; at-least-once semantics on replays).
- :func:`streaming_minhash_signatures` — per-record minhash signatures
  computed incrementally (narrow, stateless) so downstream LSH bucketing can
  run as periodic batch jobs over the signature table.
- :func:`streaming_quality_stats` — windowed corpus-quality aggregates with
  late-data handling (watermark + event-time window).

All sinks here are parquet/memory for testability; in production they are
Iceberg table commits (same contract as checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILES_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("event_time", T.TimestampType()),
])


def stream_files(spark: SparkSession, landing_dir: str,
                 max_files_per_trigger: int = 16) -> DataFrame:
    """Incremental ingest of the repo-file table from a landing directory."""
    return (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def streaming_exact_dedup(stream: DataFrame, content_col: str = "content",
                          watermark: str = "1 hour") -> DataFrame:
    """Exact dedup across micro-batches: key = sha256(content); state is
    bounded by the event-time watermark (duplicates older than the watermark
    horizon can reappear — the batch dedup pass downstream catches those)."""
    keyed = stream.withColumn("content_sha", F.sha2(F.col(content_col), 256))
    return keyed.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )


def streaming_minhash_signatures(stream: DataFrame, text_col: str = "content",
                                 n_hashes: int = 8) -> DataFrame:
    """Stateless per-record minhash signatures — reuses the exact batch
    expressions (ops/dedup.py), so streamed signatures are bit-identical to a
    batch backfill over the same rows."""
    from automatedreclin_spark.operators.blocking import MERSENNE_61, token_hash_expr
    from automatedreclin_spark.ops.dedup import MINHASH_PERMS_16

    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    staged = stream.withColumn("_hashed", F.transform(toks, lambda t: token_hash_expr(t)))
    for i, (a, b) in enumerate(MINHASH_PERMS_16[:n_hashes]):
        staged = staged.withColumn(
            f"mh_{i}",
            F.array_min(
                F.transform("_hashed", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_61))
            ).cast("long"),
        )
    return staged.drop("_hashed")


def streaming_quality_stats(stream: DataFrame, text_col: str = "content",
                            window: str = "10 minutes",
                            watermark: str = "30 minutes") -> DataFrame:
    """Windowed corpus quality: docs/tokens per lang per event-time window,
    late rows beyond the watermark dropped (standard watermark semantics)."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.avg(F.length(text_col)).alias("avg_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang", "n_docs", "n_tokens",
            F.round("avg_chars", 6).alias("avg_chars"),
        )
    )


def streaming_incremental_link(
    stream: DataFrame,
    reference_records: "pd.DataFrame",
    key_col: str = "content",
    id_col: str = "commit",
    timeout_minutes: int = 60,
):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    incrementally link arriving records against a (small, driver-collected)
    reference table with a ONE-TO-ONE constraint maintained in state.

    Group key = lang; per-group state = the set of reference ids already
    claimed by earlier micro-batches. An arriving record matches the first
    unclaimed reference record with equal sha256(key_col); once claimed, a
    reference id never matches again — the streaming analogue of the greedy
    one-to-one sweep, with state bounded by the reference size.

    NB: GroupStateTimeout.ProcessingTimeTimeout crashes the Python worker in
    this Spark 4.1 dev build (EOF in PythonArrowOutput on the timeout path),
    so the operator runs with NoTimeout; state stays bounded by |reference|.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ref = reference_records.copy()
    ref["_sha"] = ref[key_col].map(lambda s: hashlib.sha256(str(s).encode()).hexdigest())
    ref_by_lang: dict[str, list[tuple[str, str]]] = {}
    for lang, sha, rid in zip(ref["lang"], ref["_sha"], ref[id_col]):
        ref_by_lang.setdefault(lang, []).append((sha, rid))

    output_schema = "lang string, stream_commit string, ref_id string, content_sha string"
    state_schema = "claimed array<string>"

    def link(key, pdfs, state: GroupState):
        (lang,) = key
        claimed = set(state.get[0]) if state.exists else set()
        candidates = ref_by_lang.get(lang, [])
        out = []
        for pdf in pdfs:
            for row in pdf.itertuples():
                sha = hashlib.sha256(str(getattr(row, key_col)).encode()).hexdigest()
                for ref_sha, ref_id in candidates:
                    if ref_sha == sha and ref_id not in claimed:
                        claimed.add(ref_id)
                        out.append({
                            "lang": lang,
                            "stream_commit": getattr(row, "commit"),
                            "ref_id": ref_id,
                            "content_sha": sha,
                        })
                        break
        state.update((list(claimed),))
        yield pd.DataFrame(out, columns=["lang", "stream_commit", "ref_id", "content_sha"])

    return stream.groupBy("lang").applyInPandasWithState(
        link,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
