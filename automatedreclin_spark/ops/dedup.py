"""Corpus deduplication operators — first-class training-data-pipeline ops.

All variants return a verdict-style DataFrame so a 100 TB pipeline can chain
them: exact (hash groupBy), MinHash+LSH banding (shingle → signature → band
bucket → bucket join → verify), SimHash (Hamming-ball near-dup), n-gram
Jaccard (exact pairwise within a partition key), and embedding-cosine via
ops/similarity.py.

Determinism: every hash derives from md5 of the token (the shared 60-bit
token hash, see operators/blocking.py) and fixed permutation constants — no
RNG on executors, identical output across partition counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.storagelevel import StorageLevel

from automatedreclin_spark.operators.blocking import MERSENNE_61, token_hash_expr
from automatedreclin_spark.operators.util import ensure_parallelism

#: 16 fixed universal-hash permutations (a, b) for minhash signatures.
MINHASH_PERMS_16 = [
    (1_000_003, 12_345), (999_983, 54_321), (1_000_033, 77_777), (999_979, 13_579),
    (1_000_037, 24_680), (1_000_039, 98_765), (1_000_081, 11_111), (1_000_099, 22_222),
    (1_000_117, 33_333), (1_000_121, 44_444), (1_000_133, 55_555), (1_000_151, 66_666),
    (1_000_159, 88_888), (1_000_171, 99_999), (1_000_183, 10_101), (1_000_187, 20_202),
]


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact duplicates by sha256(content): per-row verdict
    (id, content_sha, canonical_id, is_duplicate). One shuffle (window by
    hash), map-side-combinable."""
    from pyspark.sql.window import Window

    sha = F.sha2(F.col(content_col), 256)
    w = Window.partitionBy("content_sha")
    return (
        df.select(F.col(id_col).alias("id"), sha.alias("content_sha"))
        .withColumn("canonical_id", F.min("id").over(w))
        .withColumn("is_duplicate", F.col("id") != F.col("canonical_id"))
    )


def _tokens(text_col, lowercase: bool = True):
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        t = F.lower(t)
    return F.array_distinct(F.split(t, r"\s+"))


def shingles_expr(text_col, k: int = 3, lowercase: bool = True):
    """Word k-shingles as an array column — pure Catalyst via transform over
    a token-index sequence (no explode)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        t = F.lower(t)
    toks = F.split(t, r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
        )
    )


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      n_hashes: int = 16, shingle_k: int = 1) -> DataFrame:
    """MinHash signature columns mh_0..mh_{n-1} over word shingles. Narrow:
    array_min(transform(...)) per permutation — no explode, no shuffle."""
    assert n_hashes <= len(MINHASH_PERMS_16)
    sh = shingles_expr(text_col, k=shingle_k) if shingle_k > 1 else _tokens(text_col)
    # Stage the md5-derived hash array once — without staging, each of the
    # n_hashes array_min(transform(...)) re-evaluates every md5 — and spread
    # the CPU-heavy hashing across the cluster.
    staged = ensure_parallelism(
        df.select(F.col(id_col).alias("id"), sh.alias("_sh"))
    ).withColumn(
        "_hashed", F.transform("_sh", lambda tok: token_hash_expr(tok))
    )
    cols = {}
    for i, (a, b) in enumerate(MINHASH_PERMS_16[:n_hashes]):
        cols[f"mh_{i}"] = F.array_min(
            F.transform("_hashed", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_61))
        ).cast("long")
    return staged.select("id", *[v.alias(k) for k, v in cols.items()])


def minhash_lsh_pairs(
    signatures: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    partition_col: str | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows of
    ``n_hashes/bands`` values; docs sharing any full band land in one bucket
    → self-join within buckets. Returns distinct candidate pairs
    (id_a < id_b). The band bucket join is the ONLY shuffle; candidate count
    is controlled by band width (rows-per-band ↑ → precision ↑)."""
    rows_per_band = n_hashes // bands
    # The bucket join is a SELF-join: without materialization Spark computes
    # the whole signature subplan (tokenize + 16 minhash transforms) once per
    # side. Signatures are tiny (id + n_hashes longs per doc) — persist them.
    signatures = signatures.persist(StorageLevel.MEMORY_AND_DISK)
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket"))
        )
    exploded = signatures.select(
        "id",
        *( [F.col(partition_col)] if partition_col else [] ),
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select(
        "id",
        *( [F.col(partition_col)] if partition_col else [] ),
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    join_keys = ["band", "bucket"] + ([partition_col] if partition_col else [])
    left = exploded.select(*join_keys, F.col("id").alias("id_a"))
    right = exploded.select(*join_keys, F.col("id").alias("id_b"))
    return (
        left.join(right, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, df: DataFrame, id_col: str, text_col: str,
                   threshold: float = 0.8, shingle_k: int = 1) -> DataFrame:
    """Verify candidate pairs with the true token-set Jaccard; keeps pairs
    ≥ threshold. Two hash joins + a narrow array intersection."""
    sh = shingles_expr(text_col, k=shingle_k) if shingle_k > 1 else _tokens(text_col)
    toks = ensure_parallelism(df.select(F.col(id_col).alias("id"), sh.alias("toks")))
    joined = (
        pairs.join(toks.withColumnsRenamed({"id": "id_a", "toks": "toks_a"}), "id_a")
        .join(toks.withColumnsRenamed({"id": "id_b", "toks": "toks_b"}), "id_b")
    )
    jac = F.size(F.array_intersect("toks_a", "toks_b")).cast("double") / F.size(
        F.array_union("toks_a", "toks_b")
    )
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  n_hashes: int = 16, bands: int = 4,
                  threshold: float = 0.8,
                  partition_col: str | None = None) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signature → banding → bucket join
    → Jaccard verification. Returns (id_a, id_b, jaccard)."""
    sigs = minhash_signature(df, id_col, text_col, n_hashes=n_hashes)
    if partition_col:
        sigs = sigs.join(
            df.select(F.col(id_col).alias("id"), partition_col), "id"
        )
    cand = minhash_lsh_pairs(sigs, n_hashes=n_hashes, bands=bands,
                             partition_col=partition_col)
    return jaccard_verify(cand, df, id_col, text_col, threshold=threshold)


# ------------------------------------------------------------------ simhash --

def simhash_udf():
    """64-bit SimHash over distinct word tokens as an Arrow-batched pandas
    UDF: per-token md5-derived 64-bit hash, ±1 majority vote per bit
    (Charikar, STOC'02). numpy bit unpacking per batch; deterministic across
    engines and partitionings (md5-based, no RNG)."""

    @pandas_udf("long")
    def _simhash(text: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        # Batch-level token vocabulary: real corpora share most tokens across
        # documents, so md5 runs once per DISTINCT token in the Arrow batch
        # (not once per (doc, token)), and the ±1 bit votes become one numpy
        # gather+sum per document. Bit-identical to the per-row loop.
        toksets = [set(s.lower().split()) if s is not None else set()
                   for s in text]
        vocab: dict[str, int] = {}
        for ts in toksets:
            for t in ts:
                if t not in vocab:
                    vocab[t] = len(vocab)
        if vocab:
            hs = np.fromiter(
                (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                 for t in vocab),
                dtype=np.uint64, count=len(vocab),
            )
            votes = (((hs[:, None] >> shifts) & np.uint64(1))
                     .astype(np.int8) * 2 - 1)          # (V, 64) in {-1, +1}
        out = np.zeros(len(toksets), dtype=np.int64)
        pow2 = (np.uint64(1) << shifts)
        for r, ts in enumerate(toksets):
            if not ts:
                continue
            rows = np.fromiter((vocab[t] for t in ts), dtype=np.int64,
                               count=len(ts))
            acc = votes[rows].sum(axis=0, dtype=np.int64)
            val = int(((acc > 0).astype(np.uint64) * pow2).sum(dtype=np.uint64))
            if val >= 1 << 63:
                val -= 1 << 64
            out[r] = val
        return pd.Series(out, dtype="int64")

    return _simhash


def simhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: bucket on (max_hamming+1) bit-slices of the
    64-bit simhash — pigeonhole guarantees that any pair within the Hamming
    ball shares at least one identical slice — then verify with the exact
    Hamming distance via bit_count(xor). Smaller max_hamming → wider slices →
    tighter buckets; verification keeps precision exact either way."""
    if not 0 <= max_hamming <= 31:
        raise ValueError("max_hamming must be in [0, 31].")
    n_tables = max_hamming + 1
    slice_bits = 64 // n_tables
    sh = ensure_parallelism(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))) \
        .select("id", simhash_udf()(F.col("_t")).alias("simhash"))
    # shiftrightUNSIGNED: the arithmetic shift would sign-extend, folding the
    # sign bit (bit 63) into EVERY slice's remainder class — a pair differing
    # in bit 63 would then share no bucket and the pigeonhole cover breaks
    # (caught by the brute-force DuckDB oracle: 481/19032 pairs missed at
    # sf0.01). With the logical shift slice t is exactly bits
    # [t·w, t·w+w): ≤ max_hamming in-slice diffs + possibly one bit-63 diff
    # still leave ≥1 of the max_hamming+1 slices clean.
    slices = [
        F.struct(F.lit(t).alias("t"),
                 (F.shiftrightunsigned("simhash", t * slice_bits) % (1 << slice_bits)).alias("s"))
        for t in range(n_tables)
    ]
    exploded = sh.select("id", "simhash", F.explode(F.array(*slices)).alias("sl")) \
        .select("id", "simhash", F.col("sl.t").alias("t"), F.col("sl.s").alias("s"))
    left = exploded.select("t", "s", F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    right = exploded.select("t", "s", F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    cand = (
        left.join(right, ["t", "s"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_cosine_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_bits: int = 12,
    n_tables: int = 4,
    exact: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space near-duplicate pairs: cosine ≥ threshold.

    ``exact=True`` scores all id_a < id_b pairs (the O(n²) baseline, oracle-
    checkable); the default routes through random-hyperplane LSH buckets
    (ops/similarity.py) and rescores only bucket mates — the scale path."""
    from automatedreclin_spark.ops.similarity import (
        _as_double,
        _hyperplanes,
        _signature_udf,
        cosine_expr,
    )

    vecs = ensure_parallelism(df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ))
    if exact:
        left = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        right = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = left.join(right, F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        sigged = vecs
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_bits, seed=7 + t)
            sigged = sigged.withColumn(f"sig_{t}", _signature_udf(planes)(F.col("v")))
        cands = None
        for t in range(n_tables):
            lt = sigged.select(F.col(f"sig_{t}").alias("sig"), F.col("id").alias("id_a"))
            rt = sigged.select(F.col(f"sig_{t}").alias("sig"), F.col("id").alias("id_b"))
            p = lt.join(rt, "sig").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
            cands = p if cands is None else cands.unionByName(p)
        base = vecs
        pairs = (
            cands.distinct()
            .join(base.withColumnsRenamed({"id": "id_a", "v": "va"}), "id_a")
            .join(base.withColumnsRenamed({"id": "id_b", "v": "vb"}), "id_b")
        )
    return (
        pairs.withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
