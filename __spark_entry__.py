"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship PDF→span extraction pipeline on a deterministic
synthetic interleaved corpus (plus the sf0.001 documents table for a
relational sanity pass); ``queries``/``oracle_sql`` expose every
SQL-expressible operator from SURVEY.md §2 and the training-data-pipeline
extensions, registry in pdf_extract_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extract_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved corpus → extracted spans, joined against the
    sf0.001 documents table's language distribution for a smoke-stable
    schema. Returns one row per extracted document."""
    return QUERIES["extract_spans_synth"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles; extraction ops are non-SQL-expressible and omitted
    (rows-only check)."""
    return dict(ORACLES)
