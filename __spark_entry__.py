"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over gitlab_elasticsearch_indexer_spark.plans.entry_queries — the
operator registry with per-entry DuckDB oracle SQL.  See that module for the
parity discipline (aliasing, rounding, casts).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gitlab_elasticsearch_indexer_spark.plans import entry_queries as _eq
from gitlab_elasticsearch_indexer_spark.session import _ship_package


def _prep(spark: SparkSession) -> SparkSession:
    # a driver-created session won't have our package on executors
    try:
        _ship_package(spark)
    except Exception:
        pass
    # timestamp formatting entries assume UTC (oracle emits '+0000')
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _eq.entry(_prep(spark))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    wrapped = {}
    for name, fn in _eq.queries().items():
        wrapped[name] = (lambda f: lambda spark, sf_dir: f(_prep(spark), sf_dir))(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key."""
    return _eq.oracle_sql()
