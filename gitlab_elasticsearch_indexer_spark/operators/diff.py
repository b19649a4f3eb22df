"""Snapshot diff: derive the change stream by comparing two pages-table
snapshots (reference S1: ``GetRawChanges`` between two tree snapshots,
git/gitaly.go:158-219 — the full build is a diff from the empty tree).

Semantics mirrored:
- url only in new      → ADDED
- url in both, content differs (md5) → MODIFIED
- url only in old      → DELETED (old_url set)
- DELETED whose content md5 reappears at exactly one ADDED url
                       → the pair collapses to one RENAMED row
                         (git's rename detection by content identity)
- ADDED whose content md5 exists at exactly one old url that SURVIVES in
  the new snapshot → COPIED (old_url = the surviving source;
  git/gitaly.go:207 dispatches COPIED → put, same as ADDED)

Shape: one full-outer join on url (sort-merge at corpus scale; both sides
bucketable on url for a shuffle-free join), then a broadcast-size join for
rename pairing — rename candidates are |ADDED ∩ DELETED by hash|, tiny
relative to the corpus.  COPY pairing semi-joins the (corpus-sized) set of
surviving old urls down to the added rows' hashes FIRST, so the pairing
join never materialises more than a delta-sized side anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(old_pages: DataFrame, new_pages: DataFrame) -> DataFrame:
    """(old, new) → PAGES_DELTA-shaped change stream (plus doc_id from the
    surviving side)."""
    o = old_pages.select(
        F.col("url").alias("url"),
        F.md5(F.col("html")).alias("o_md5"),
    )
    n = new_pages.select(
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
        "doc_id",
        F.md5(F.col("html")).alias("n_md5"),
    )
    joined = n.join(o, "url", "full_outer")

    added = joined.filter(F.col("o_md5").isNull()).select(
        "url", "warc_ts", "html", "text", "lang", "doc_id", "n_md5"
    )
    modified = joined.filter(
        F.col("o_md5").isNotNull()
        & F.col("n_md5").isNotNull()
        & (F.col("o_md5") != F.col("n_md5"))
    ).select("url", "warc_ts", "html", "text", "lang", "doc_id")
    deleted = joined.filter(F.col("n_md5").isNull()).select(
        F.col("url").alias("del_url"), F.col("o_md5")
    )

    # rename detection: content hash moves from exactly one old url to
    # exactly one new url
    uniq_added = added.withColumn(
        "n_cnt", F.count("*").over(Window.partitionBy("n_md5"))
    ).filter(F.col("n_cnt") == 1)
    uniq_deleted = deleted.withColumn(
        "o_cnt", F.count("*").over(Window.partitionBy("o_md5"))
    ).filter(F.col("o_cnt") == 1)
    renames = uniq_added.join(
        F.broadcast(uniq_deleted), uniq_added["n_md5"] == uniq_deleted["o_md5"]
    ).select(
        "url", "warc_ts", "html", "text", "lang", "doc_id",
        F.lit("RENAMED").alias("op"),
        F.col("del_url").alias("old_url"),
    )

    nonrenamed_added = added.join(
        renames.select(F.col("url").alias("r_url")),
        added["url"] == F.col("r_url"),
        "left_anti",
    )

    # COPIED: content hash of an added url also lives at exactly one old url
    # that still exists in new (the source was NOT deleted) — git's copy
    # detection by content identity (gitaly.go:207).  Both sides restricted
    # to hash-unique rows so the pairing is deterministic.
    surviving_old = (
        joined.filter(F.col("o_md5").isNotNull() & F.col("n_md5").isNotNull())
        .select(F.col("url").alias("src_url"), F.col("o_md5"))
        .withColumn("s_cnt", F.count("*").over(Window.partitionBy("o_md5")))
        .filter(F.col("s_cnt") == 1)
        .drop("s_cnt")
    )
    uniq_nonrenamed = nonrenamed_added.withColumn(
        "a_cnt", F.count("*").over(Window.partitionBy("n_md5"))
    ).filter(F.col("a_cnt") == 1)
    # Restrict surviving_old to hashes that actually appear among the added
    # rows BEFORE any broadcast: surviving_old alone is corpus-sized (every
    # hash-unique url present in both snapshots), so broadcasting it directly
    # would ship ~the whole url+md5 table to every executor.  The semi-join
    # shrinks it to |ADDED|-delta size, which is the set the pairing can ever
    # match.  No broadcast hint — AQE converts the now-tiny side on its own.
    copy_sources = surviving_old.join(
        uniq_nonrenamed.select(F.col("n_md5").alias("a_md5")),
        surviving_old["o_md5"] == F.col("a_md5"),
        "left_semi",
    )
    copies = uniq_nonrenamed.join(
        copy_sources,
        uniq_nonrenamed["n_md5"] == copy_sources["o_md5"],
    ).select(
        "url", "warc_ts", "html", "text", "lang", "doc_id",
        F.lit("COPIED").alias("op"),
        F.col("src_url").alias("old_url"),
    )

    plain_added = nonrenamed_added.join(
        copies.select(F.col("url").alias("c_url")),
        nonrenamed_added["url"] == F.col("c_url"),
        "left_anti",
    ).select(
        "url", "warc_ts", "html", "text", "lang", "doc_id",
        F.lit("ADDED").alias("op"),
        F.lit(None).cast("string").alias("old_url"),
    )
    plain_deleted = deleted.join(
        renames.select(F.col("old_url").alias("r_old")),
        deleted["del_url"] == F.col("r_old"),
        "left_anti",
    ).select(
        F.col("del_url").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit("DELETED").alias("op"),
        F.col("del_url").alias("old_url"),
    )
    mods = modified.select(
        "url", "warc_ts", "html", "text", "lang", "doc_id",
        F.lit("MODIFIED").alias("op"),
        F.lit(None).cast("string").alias("old_url"),
    )
    return (
        plain_added.unionByName(mods)
        .unionByName(renames.select(*plain_added.columns))
        .unionByName(copies.select(*plain_added.columns))
        .unionByName(plain_deleted)
    )
