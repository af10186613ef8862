"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full engine path (inverted-index build over
                 the documents table mapped to the transcripts shape,
                 then BM25 top-k via segment scan + block decode).
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-pipeline extras), each (spark, sf_dir) -> DF.
                 Exactly 50 entries: the driver samples the first 50,
                 so the 22 redundant-coverage entries listed in
                 oracle_suite.EXCLUDED_FROM_DRIVER are exposed only to
                 the local full-registry replica (COVERAGE.md).
oracle_sql()   — DuckDB-equivalent SQL per query, identical aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkbm25.oracle_suite import DRIVER_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sparkbm25.oracle_suite import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in DRIVER_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in DRIVER_QUERIES.items()
            if sql is not None}
