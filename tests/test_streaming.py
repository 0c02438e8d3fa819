"""Structured Streaming surface: incremental dedup / signatures / windowed
stats driven with real micro-batches via the file source + memory sink."""

import time
from datetime import datetime, timedelta

import pandas as pd
import pytest

from automatedreclin_spark.streaming import (
    stream_files,
    streaming_exact_dedup,
    streaming_minhash_signatures,
    streaming_quality_stats,
)


def _write_batch(spark, landing, rows, batch_id):
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(landing)


def _rows(i0, n, content_fn, t0):
    return [
        {
            "repo": "org/x", "path": f"f{i}.py", "commit": f"{i:040x}",
            "lang": "python", "content": content_fn(i),
            "event_time": t0 + timedelta(seconds=i),
        }
        for i in range(i0, i0 + n)
    ]


def _run_until(q, pred, timeout=60):
    end = time.time() + timeout
    while time.time() < end:
        q.processAllAvailable()
        if pred():
            return True
        time.sleep(0.5)
    return False


def test_streaming_exact_dedup(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    t0 = datetime(2026, 1, 1)
    # batch 1: 6 docs, 3 distinct contents; batch 2 repeats batch-1 contents
    _write_batch(spark, landing, _rows(0, 6, lambda i: f"text {i % 3}", t0), 1)

    stream = stream_files(spark, landing, max_files_per_trigger=1)
    deduped = streaming_exact_dedup(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_sink")
        .option("checkpointLocation", ck).outputMode("append").start()
    )
    try:
        assert _run_until(q, lambda: spark.sql("select * from dedup_sink").count() >= 3)
        first = spark.sql("select distinct content_sha from dedup_sink").count()
        assert first == 3
        total_after_b1 = spark.sql("select * from dedup_sink").count()
        assert total_after_b1 == 3  # in-batch duplicates dropped too

        _write_batch(spark, landing, _rows(6, 4, lambda i: f"text {i % 3}", t0), 2)
        q.processAllAvailable()
        # repeated contents within the watermark horizon stay deduped
        assert spark.sql("select * from dedup_sink").count() == 3
    finally:
        q.stop()


def test_streaming_minhash_matches_batch(spark, tmp_path):
    from automatedreclin_spark.ops.dedup import minhash_signature
    from pyspark.sql import functions as F

    landing = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    t0 = datetime(2026, 1, 1)
    rows = _rows(0, 12, lambda i: f"alpha beta gamma doc{i} token{i % 4}", t0)
    _write_batch(spark, landing, rows, 1)

    stream = stream_files(spark, landing)
    sigs = streaming_minhash_signatures(stream, n_hashes=4)
    q = (
        sigs.selectExpr("path", "mh_0", "mh_1", "mh_2", "mh_3")
        .writeStream.format("memory").queryName("sig_sink")
        .option("checkpointLocation", ck).outputMode("append").start()
    )
    try:
        assert _run_until(q, lambda: spark.sql("select * from sig_sink").count() >= 12)
    finally:
        q.stop()
    streamed = spark.sql("select * from sig_sink").orderBy("path").toPandas()

    batch_df = spark.createDataFrame(pd.DataFrame(rows))
    batch = (
        minhash_signature(batch_df.withColumn("id", F.col("path")), "id", "content", n_hashes=4)
        .orderBy("id").toPandas()
    )
    for k in range(4):
        assert list(streamed[f"mh_{k}"]) == list(batch[f"mh_{k}"]), k


def test_streaming_windowed_quality(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    t0 = datetime(2026, 1, 1)
    _write_batch(spark, landing, _rows(0, 20, lambda i: "w1 w2 w3", t0), 1)

    stream = stream_files(spark, landing)
    stats = streaming_quality_stats(stream, window="10 minutes", watermark="5 minutes")
    q = (
        stats.writeStream.format("memory").queryName("quality_sink")
        .option("checkpointLocation", ck).outputMode("complete").start()
    )
    try:
        assert _run_until(q, lambda: spark.sql("select * from quality_sink").count() >= 1)
        out = spark.sql("select * from quality_sink").toPandas()
        assert out["n_docs"].sum() == 20
        assert (out["n_tokens"] == out["n_docs"] * 3).all()
    finally:
        q.stop()


def test_stateful_incremental_link(spark, tmp_path):
    """applyInPandasWithState one-to-one linkage: a reference id is claimed
    at most once across micro-batches."""
    from automatedreclin_spark.streaming import streaming_incremental_link

    landing = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    t0 = datetime(2026, 1, 1)
    ref = pd.DataFrame({
        "lang": ["python", "python", "java"],
        "content": ["ref one", "ref two", "ref three"],
        "commit": ["r1", "r2", "r3"],
    })
    # batch 1: two stream records matching ref one (only first may claim r1)
    rows = [
        {"repo": "o/x", "path": "a.py", "commit": "s1", "lang": "python",
         "content": "ref one", "event_time": t0},
        {"repo": "o/x", "path": "b.py", "commit": "s2", "lang": "python",
         "content": "ref one", "event_time": t0 + timedelta(seconds=1)},
        {"repo": "o/x", "path": "c.py", "commit": "s3", "lang": "python",
         "content": "ref two", "event_time": t0 + timedelta(seconds=2)},
    ]
    _write_batch(spark, landing, rows, 1)
    stream = stream_files(spark, landing)
    linked = streaming_incremental_link(stream, ref)
    q = (
        linked.writeStream.format("memory").queryName("link_sink")
        .option("checkpointLocation", ck).outputMode("append").start()
    )
    try:
        assert _run_until(q, lambda: spark.sql("select * from link_sink").count() >= 2)
        out1 = spark.sql("select * from link_sink").toPandas()
        assert set(out1["ref_id"]) == {"r1", "r2"}
        assert len(out1) == 2  # r1 claimed once despite two matching records

        # batch 2: another "ref one" record — r1 already claimed in STATE
        _write_batch(spark, landing, [
            {"repo": "o/x", "path": "d.py", "commit": "s4", "lang": "python",
             "content": "ref one", "event_time": t0 + timedelta(seconds=9)},
        ], 2)
        q.processAllAvailable()
        out2 = spark.sql("select * from link_sink").toPandas()
        assert len(out2) == 2, "claimed ref ids must persist across micro-batches"
    finally:
        q.stop()
