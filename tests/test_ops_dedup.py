import pandas as pd
import pytest
from pyspark.sql import functions as F

from automatedreclin_spark.ops.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    simhash_dedup,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),                                        # exact dup of 0
        (2, base.replace("quick", "swift")),              # near dup of 0
        (3, base.replace("fox", "cat").replace("dog", "bird")),  # near-ish
        (4, "completely different text about spark dataframes and shuffles"),
        (5, "completely different text about spark dataframes and shuffles plus extra"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark):
    df = _docs(spark)
    out = exact_dedup(df, "doc_id", "text").toPandas().set_index("id")
    assert out.loc[1, "canonical_id"] == 0 and bool(out.loc[1, "is_duplicate"])
    assert not bool(out.loc[0, "is_duplicate"])
    assert not bool(out.loc[4, "is_duplicate"])


def test_minhash_signature_deterministic(spark):
    df = _docs(spark)
    s1 = minhash_signature(df, "doc_id", "text").orderBy("id").toPandas()
    s2 = minhash_signature(df.repartition(7), "doc_id", "text").orderBy("id").toPandas()
    assert s1.equals(s2)
    # identical docs → identical signatures
    assert (s1.iloc[0, 1:] == s1.iloc[1, 1:]).all()


def test_minhash_lsh_finds_near_dups(spark):
    df = _docs(spark)
    out = minhash_dedup(df, "doc_id", "text", threshold=0.7)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (0, 1) in got            # exact dup always collides
    assert (0, 2) in got or (1, 2) in got  # near dup (1 token changed)
    # dissimilar docs never pass verification
    assert all(not (a in (0, 1, 2) and b in (4, 5)) for a, b in got)


def test_jaccard_verify_threshold(spark):
    df = _docs(spark)
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": [0, 0], "id_b": [1, 4]}))
    out = jaccard_verify(pairs, df, "doc_id", "text", threshold=0.5).toPandas()
    assert list(out["id_a"]) == [0] and list(out["id_b"]) == [1]
    assert out["jaccard"].iloc[0] == 1.0


def test_simhash_dedup(spark):
    df = _docs(spark)
    out = simhash_dedup(df, "doc_id", "text", max_hamming=10)
    got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    assert got.get((0, 1)) == 0     # identical text → identical simhash
    # near dup within a few bits
    assert any(k in got for k in [(0, 2), (1, 2)])


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidates must recover every pair the exact O(n²) Jaccard finds
    at the working threshold (on a corpus where signatures are informative)."""
    import numpy as np
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(60):
        toks = list(rng.choice(vocab, size=40, replace=False))
        docs.append((2 * i, " ".join(toks)))
        edited = toks.copy()
        for j in range(3):
            edited[int(rng.integers(0, 40))] = str(rng.choice(vocab))
        docs.append((2 * i + 1, " ".join(edited)))
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))

    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_verify(
            df.select(F.col("doc_id").alias("id_a")).crossJoin(
                df.select(F.col("doc_id").alias("id_b"))
            ).filter(F.col("id_a") < F.col("id_b")),
            df, "doc_id", "text", threshold=0.8,
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_dedup(df, "doc_id", "text", threshold=0.8).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall} ({len(exact)} true pairs)"
    assert lsh <= exact | lsh  # verification keeps precision exact ≥ threshold


def test_embedding_cosine_dedup_lsh_vs_exact(spark):
    """LSH-bucketed embedding dedup must recover the exact pairs at a high
    threshold (planted near-duplicate vectors)."""
    import numpy as np
    from automatedreclin_spark.ops.dedup import embedding_cosine_dedup

    rng = np.random.default_rng(13)
    dim = 32
    base = rng.standard_normal((60, dim))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(60)]
    # plant 10 near-duplicates (2% noise)
    for j in range(10):
        rows.append({"vec_id": 100 + j,
                     "embedding": (base[j] + 0.02 * rng.standard_normal(dim)).tolist()})
    df = spark.createDataFrame(pd.DataFrame(rows))
    exact = {(r.id_a, r.id_b)
             for r in embedding_cosine_dedup(df, "vec_id", "embedding",
                                             threshold=0.95, exact=True).collect()}
    approx = {(r.id_a, r.id_b)
              for r in embedding_cosine_dedup(df, "vec_id", "embedding",
                                              threshold=0.95, n_tables=8,
                                              n_bits=10, dim=dim).collect()}
    planted = {(j, 100 + j) for j in range(10)}
    assert planted <= exact
    assert len(exact & approx) / len(exact) >= 0.9
    assert approx <= exact  # rescoring keeps precision exact
