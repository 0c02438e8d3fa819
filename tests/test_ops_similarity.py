import numpy as np
import pandas as pd
import pytest

from automatedreclin_spark.ops.similarity import brute_force_topk, ivf_topk, lsh_topk


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(4)
    dim = 32
    base = rng.standard_normal((80, dim))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(80)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    return df, base


def _truth_topk(base, qids, cids, k):
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = norm[cids] @ norm[q]
        order = np.lexsort((np.array(cids), -sims))
        out[q] = [cids[i] for i in order[:k]]
    return out


def test_brute_force_matches_numpy(vectors, spark):
    df, base = vectors
    queries = df.filter("vec_id < 5")
    corpus = df.filter("vec_id >= 5")
    got = brute_force_topk(queries, corpus, k=5).toPandas()
    truth = _truth_topk(base, range(5), list(range(5, 80)), 5)
    for q in range(5):
        mine = list(got[got.query_id == q].sort_values("rank")["neighbor_id"])
        assert mine == truth[q]


def test_lsh_topk_recall_planted(spark):
    """LSH must recover PLANTED near neighbors (random Gaussian data has no
    neighbor structure, so recall is measured on queries that are noisy
    copies of corpus points)."""
    rng = np.random.default_rng(11)
    dim = 32
    corpus_vecs = rng.standard_normal((100, dim))
    rows = [{"vec_id": 100 + i, "embedding": corpus_vecs[i].tolist()} for i in range(100)]
    corpus = spark.createDataFrame(pd.DataFrame(rows))
    # queries = corpus points 0..9 + 5% noise → true NN is the source point
    qrows = [
        {"vec_id": i,
         "embedding": (corpus_vecs[i] + 0.05 * rng.standard_normal(dim)).tolist()}
        for i in range(10)
    ]
    queries = spark.createDataFrame(pd.DataFrame(qrows))
    approx = lsh_topk(queries, corpus, k=3, n_bits=8, n_tables=8, dim=dim).toPandas()
    hits = sum(
        1 for q in range(10)
        if 100 + q in set(approx[approx.query_id == q]["neighbor_id"])
    )
    assert hits >= 8, f"planted-NN recall {hits}/10"


def test_ivf_topk_recall(vectors, spark):
    df, base = vectors
    queries = df.filter("vec_id < 5")
    corpus = df.filter("vec_id >= 5")
    exact = brute_force_topk(queries, corpus, k=3).toPandas()
    approx = ivf_topk(queries, corpus, k=3, n_centroids=8, n_probe=4).toPandas()
    hits = total = 0
    for q in range(5):
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.6, f"IVF recall {hits}/{total}"


def test_lsh_deterministic(vectors, spark):
    df, _ = vectors
    queries = df.filter("vec_id < 3")
    corpus = df.filter("vec_id >= 3")
    r1 = lsh_topk(queries, corpus, k=3, dim=32).orderBy("query_id", "rank").toPandas()
    r2 = lsh_topk(queries.repartition(5), corpus.repartition(9), k=3, dim=32) \
        .orderBy("query_id", "rank").toPandas()
    assert r1.equals(r2)
