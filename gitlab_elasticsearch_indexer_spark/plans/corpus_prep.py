"""End-to-end training-data corpus preparation — the composed pipeline a
large-scale LLM-data curation job runs over webtext, built entirely from this
repo's operators:

    documents
      → quality gate        (JVM column exprs: token count, alpha ratio)
      → language gate       (stopword-vote langid, SQL-reproducible)
      → exact dedup         (md5 window, keep lowest docid per group)
      → near-dup dedup      (b×r MinHash-LSH banding → exact Jaccard verify
                             → greedy drop of the higher docid per pair)
      → token budget        (BPE-ish pretoken count per surviving doc)

Scale shape (the 100 TB audit, stage by stage):
- quality/language gates are pure whole-stage-codegen filters — no shuffle,
  pushed onto the scan where the source format allows;
- exact dedup is ONE hash shuffle on text_md5 (window min), skew-free by
  construction (md5 is uniform);
- the near-dup stage inherits `lsh_verified_pairs`'s bounded shape: banding
  keys on (band_id, band_key) with an optional bucket cap, verification
  joins the candidate-PAIR set (delta-sized) back to token sets — no
  all-pairs stage anywhere, no driver-side state;
- the drop set (`greatest(a,b)` of each verified pair) applies as a
  broadcast-or-shuffle left_anti join chosen by AQE from its actual size.

Every stage is ANSI-SQL-expressible; tests/test_pipeline.py carries a DuckDB
twin that replays the whole pipeline and must match row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import _md5, lsh_verified_pairs
from ..operators.textstats import bpe_token_counts, language_id, quality_scores


def corpus_prep(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    min_quality: float = 0.5,
    languages: tuple[str, ...] | None = None,
    n_bands: int = 16,
    rows_per_band: int = 8,
    min_jaccard: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """→ (docid, pred_lang, n_tokens, quality, text_md5, bpe_tokens) for
    every document that survives all gates — deterministic: ties are always
    broken toward the LOWEST docid, so the output is stable across
    partitionings and cluster sizes."""
    base = docs.select(
        F.col(id_col).cast("long").alias("docid"), F.col(text_col).alias("text")
    )

    stats = quality_scores(base, id_col="docid", text_col="text").select(
        "docid", "n_tokens", "quality"
    )
    langs = language_id(base, id_col="docid", text_col="text").select(
        "docid", "pred_lang"
    )
    gated = (
        base.join(stats, "docid")
        .join(langs, "docid")
        .filter(
            (F.col("n_tokens") >= F.lit(min_tokens))
            & (F.col("quality") >= F.lit(min_quality))
        )
    )
    if languages is not None:
        gated = gated.filter(F.col("pred_lang").isin(*languages))

    # exact dedup: canonical representative = lowest docid per content hash
    gated = gated.withColumn("text_md5", _md5(F.col("text")))
    keeper = Window.partitionBy("text_md5")
    exact = gated.withColumn("min_docid", F.min("docid").over(keeper)).filter(
        F.col("docid") == F.col("min_docid")
    ).drop("min_docid")

    # near-dup dedup over the exact-dedup survivors
    pairs = lsh_verified_pairs(
        exact,
        id_col="docid",
        text_col="text",
        n_bands=n_bands,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
        min_jaccard=min_jaccard,
    )
    drop = pairs.select(
        F.greatest("a_docid", "b_docid").alias("docid")
    ).distinct()
    survivors = exact.join(drop, "docid", "left_anti")

    budget = bpe_token_counts(survivors, id_col="docid", text_col="text").select(
        "docid", "bpe_tokens"
    )
    return (
        survivors.join(budget, "docid")
        .select("docid", "pred_lang", "n_tokens", "quality", "text_md5", "bpe_tokens")
    )


def corpus_prep_summary(prepared: DataFrame) -> DataFrame:
    """Per-language corpus report over the prepared set: document count and
    total token budget — ONE partial-aggregated groupBy."""
    return (
        prepared.groupBy("pred_lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("pred_lang")
    )
