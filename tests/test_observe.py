"""observe(): counters ride the SAME job as the action — zero extra scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark import fixtures
from faang_pydantics_validation_spark.checks.column_stats import observe_metrics
from faang_pydantics_validation_spark.engine import ValidationEngine
from faang_pydantics_validation_spark.rulesets import code_files_ruleset


def test_observe_metrics_single_job(spark, tmp_path):
    df = fixtures.code_files(spark, 2000)
    out = ValidationEngine(code_files_ruleset()).validate(
        df, record_id=F.concat_ws(":", "repo", "path")
    )
    observed, obs = observe_metrics(out.annotated)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    metrics = obs.get
    assert metrics["rows"] == 2000
    assert metrics["errors"] > 0
    # counters agree with a separate aggregation of the written output
    check = spark.read.parquet(str(tmp_path / "out")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_errors").alias("e")
    ).collect()[0]
    assert (check.n, check.e) == (metrics["rows"], metrics["errors"])
