"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` delegate to the registry in
``faang_pydantics_validation_spark.queries`` — one entry per operator from
SURVEY.md §2 plus the training-data-pipeline ops (dedup, similarity, text
analysis, multimodal plumbing). Keys absent from ``oracle_sql()`` are the
xxhash64-based ops DuckDB cannot replicate (MinHash/SimHash/LSH) — the
driver records rows-only checks for those; pytest covers their semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full fused-pass validation verdicts over sf0.001 documents."""
    from faang_pydantics_validation_spark.queries import q_validate_verdicts

    return q_validate_verdicts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from faang_pydantics_validation_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from faang_pydantics_validation_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
