"""Index directory layout + catalog / lineage bookkeeping.

On a real cluster these are Iceberg tables (atomic snapshot commits, MERGE
INTO, partition specs — SURVEY.md K1-K7); the Iceberg runtime jar is not in
this sandbox, so the layout is plain partitioned parquet + a JSON catalog
document, with the same commit discipline: writers produce a complete new
snapshot directory and flip the ``current`` pointer last, so readers never
see a partial index (reference analog: Flush commit barrier,
elastic/client.go:199-207).

Layout:

    <index_dir>/
      current                 — file holding the active snapshot name
      <snapshot>/catalog.json — {n_docs, avgdl, analyzer, ...}
      <snapshot>/docs/        — DOCS + dl (parquet)
      <snapshot>/segments/    — SEGMENTS, partitionBy(bucket)  [term routing]
      <snapshot>/term_stats/  — TERM_STATS
      <snapshot>/lineage/     — LINEAGE (per docid_range build metrics)
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Catalog:
    n_docs: int
    avgdl: float
    analyzer: str
    block_size: int
    docs_per_range: int
    n_term_buckets: int
    snapshot: str
    with_positions: bool = False
    # multi-field indexes (reference: per-field analyzers in the mapping,
    # elastic/index.go:115-146): field name → {"analyzer": ..., "avgdl": ...,
    # "dl_col": ...}. The default "content" field uses the top-level
    # analyzer/avgdl and unprefixed terms.
    fields: dict | None = None
    # index_options=offsets (elastic/index.go:208-218): segments carry an
    # offsets_enc payload enabling highlighting
    with_offsets: bool = False


def snapshot_dir(index_dir: str, snapshot: str) -> str:
    return os.path.join(index_dir, snapshot)


def write_catalog(index_dir: str, cat: Catalog) -> None:
    sd = snapshot_dir(index_dir, cat.snapshot)
    os.makedirs(sd, exist_ok=True)
    with open(os.path.join(sd, "catalog.json"), "w") as f:
        json.dump(asdict(cat), f, indent=2)


def commit_snapshot(index_dir: str, snapshot: str) -> None:
    """Atomic pointer flip — the all-or-nothing commit point (K4)."""
    tmp = os.path.join(index_dir, "current.tmp")
    with open(tmp, "w") as f:
        f.write(snapshot)
    os.replace(tmp, os.path.join(index_dir, "current"))


def current_snapshot(index_dir: str) -> str:
    with open(os.path.join(index_dir, "current")) as f:
        return f.read().strip()


def read_catalog(index_dir: str, snapshot: str | None = None) -> Catalog:
    if snapshot is None:
        snapshot = current_snapshot(index_dir)
    with open(os.path.join(snapshot_dir(index_dir, snapshot), "catalog.json")) as f:
        return Catalog(**json.load(f))


def table_path(index_dir: str, table: str, snapshot: str | None = None) -> str:
    if snapshot is None:
        snapshot = current_snapshot(index_dir)
    return os.path.join(snapshot_dir(index_dir, snapshot), table)


def read_table(
    spark: SparkSession, index_dir: str, table: str, snapshot: str | None = None
) -> DataFrame:
    return spark.read.parquet(table_path(index_dir, table, snapshot))
