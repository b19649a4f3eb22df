"""Deduplication operators over a corpus DataFrame — the training-data
pipeline layer a 100 TB webtext engine needs in front of indexing.

All operators are pure DataFrame/SQL expressions (JVM, codegen'd) — hashing
uses md5 so every result is reproducible in ANSI SQL by the DuckDB oracle.
At cluster scale each is shuffle-shaped as noted.

Operators:
- exact_dups        — hash-groupBy on full content (one shuffle on a
                      64-hex key; count via window, no row explosion)
- minhash_signatures— word-shingle MinHash (k lexicographic-min md5s; the
                      hex-string min is order-isomorphic to the numeric min)
- lsh_band_buckets  — band signatures → bucket sizes (the LSH bucket-join
                      key; pairs only ever form inside a bucket, so the
                      candidate join is |bucket|², never |corpus|²)
- jaccard_pairs     — exact n-gram Jaccard verification over LSH candidates
- simhash           — 16-bit SimHash from per-token md5 bits (distinct
                      tokens, ±1 votes per bit)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .tokenize import SIMPLE_SPLIT_RE

N_MINHASHES = 4
SIMHASH_BITS = 16


def _toks(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), SIMPLE_SPLIT_RE), lambda x: x != "")


def _md5(col: Column) -> Column:
    return F.md5(F.encode(col, "UTF-8"))


def exact_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, content md5, duplicate-group size)."""
    h = _md5(F.col(text_col)).alias("text_md5")
    w = Window.partitionBy("text_md5")
    return (
        df.select(F.col(id_col).cast("long").alias("docid"), h)
        .withColumn("n_dupes", F.count("*").over(w).cast("long"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles from simple tokens; empty array when < n tokens."""
    toks = _toks(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = N_MINHASHES
) -> DataFrame:
    """(docid, mh0..mh{k-1}) — min over shingles of md5('<seed>|'||shingle).

    Hex-string min == numeric min (fixed-length hex), so this is a true
    MinHash family with k independent permutations, reproducible in SQL.
    """
    sh = word_shingles(F.col(text_col)).alias("sh")
    out = df.select(F.col(id_col).cast("long").alias("docid"), sh)
    for seed in range(k):
        out = out.withColumn(
            f"mh{seed}",
            F.array_min(
                F.transform(F.col("sh"), lambda x: _md5(F.concat(F.lit(f"{seed}|"), x)))
            ),
        )
    return out.drop("sh")


def lsh_band_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", rows_per_band: int = 2
) -> DataFrame:
    """(band_key, n_docs) — bucket histogram for band 0 (mh0..mh{r-1}).
    Near-duplicate candidates are exactly the docs sharing a band_key."""
    sig = minhash_signatures(df, id_col, text_col)
    band = F.concat_ws("_", *[F.col(f"mh{i}") for i in range(rows_per_band)])
    return (
        sig.select("docid", band.alias("band_key"))
        .groupBy("band_key")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs sharing minhash mh0.

    The self-join key is mh0 (an LSH bucket) — at scale this is the standard
    verify step after banding: the shuffle joins |bucket|-sized groups, not
    the corpus."""
    sig = minhash_signatures(df, id_col, text_col)
    toks = df.select(
        F.col(id_col).cast("long").alias("docid"),
        F.array_distinct(_toks(F.col(text_col))).alias("ts"),
    )
    side = sig.select("docid", "mh0").join(toks, "docid")
    a = side.select(
        F.col("docid").alias("a_docid"), F.col("mh0"), F.col("ts").alias("a_ts")
    )
    b = side.select(
        F.col("docid").alias("b_docid"), F.col("mh0"), F.col("ts").alias("b_ts")
    )
    inter = F.size(F.array_intersect("a_ts", "b_ts"))
    union = F.size("a_ts") + F.size("b_ts") - inter
    return (
        a.join(b, "mh0")
        .filter(F.col("a_docid") < F.col("b_docid"))
        .select(
            "a_docid",
            "b_docid",
            F.round(inter.cast("double") / union.cast("double"), 4).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(docid, simhash) — 16-bit SimHash: bit j set iff the ±1 vote sum of
    bit j of md5(token) over DISTINCT tokens is > 0."""
    tok = (
        df.select(F.col(id_col).cast("long").alias("docid"), F.explode(_toks(F.col(text_col))).alias("term"))
        .distinct()
        .withColumn("h", _md5(F.col("term")))
    )
    votes = [
        F.sum(
            F.when(F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int") % 2 == 1, 1)
            .otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("docid").agg(*votes)
    sim = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("docid", sim.cast("long").alias("simhash"))
