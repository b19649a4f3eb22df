"""Deterministic document IDs + date formatting (reference indexer/blob.go:48-64,
indexer/commit.go:32-34, indexer/person.go:10,19-21).

Spark-side these are pure built-in column expressions (JVM, codegen'd) — the
Python versions exist for unit goldens and the pandas oracle.

Golden (indexer/blob_test.go:87-92):
``generate_blob_id(12345678, "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"*20)
== "12345678_e0264f90b84a0fe08768dc5dcdf27efe60fe6633"``
"""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import ELASTIC_TIME_FORMAT, MAX_ID_BYTES


def generate_blob_id(parent_id: int, path: str) -> str:
    """``"<pid>_<path>"``; if that exceeds 512 bytes, ``"<pid>_<sha1(path)>"``
    (indexer/blob.go:48-64)."""
    blob_id = f"{parent_id}_{path}"
    if len(blob_id.encode("utf-8")) > MAX_ID_BYTES:
        blob_id = f"{parent_id}_{hashlib.sha1(path.encode('utf-8')).hexdigest()}"
    return blob_id


def generate_commit_id(parent_id: int, sha: str) -> str:
    """``"<pid>_<sha>"`` (indexer/commit.go:32-34)."""
    return f"{parent_id}_{sha}"


def generate_date(t: datetime) -> str:
    """``%Y%m%dT%H%M%S%z`` (indexer/person.go:10,19-21)."""
    return t.strftime("%Y%m%dT%H%M%S%z")


# ---------------------------------------------------------------------------
# Column-expression versions (JVM-side, no Python in the hot path)
# ---------------------------------------------------------------------------
def blob_id_col(parent_id: Column, path: Column) -> Column:
    """Catalyst expression for generate_blob_id: concat + length gate + sha1.

    ``octet_length`` counts UTF-8 bytes like the Go ``len(string)``.
    """
    plain = F.concat_ws("_", parent_id.cast("string"), path)
    hashed = F.concat_ws("_", parent_id.cast("string"), F.sha1(path))
    return F.when(F.octet_length(plain) > MAX_ID_BYTES, hashed).otherwise(plain)


def date_fmt_col(ts: Column) -> Column:
    return F.date_format(ts, ELASTIC_TIME_FORMAT)
