"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` delegate to the registry in
``faang_pydantics_validation_spark.queries`` — one entry per operator from
SURVEY.md §2 plus the training-data-pipeline ops (dedup, similarity, text
analysis, multimodal plumbing). Since round 3 every one of the 50 entries
has a DuckDB oracle twin: the hash-based ops opt into reproducible
primitives for the contract (hash_fn='md5' top-60-bits hashes, round_dp=6
scores, driver-side plane/centroid literals embedded in the SQL) while
keeping xxhash64 / raw scores as production defaults. The registry is
pinned at 50 because the driver harvests the first 50 entries; newer ops
(component dedup, sampling, quality filter) are covered by DuckDB-parity
pytest tests instead.
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
