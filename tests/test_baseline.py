"""Persisted stats baselines (checks/baseline.py) and the one-pass
rule-selectivity report: the cross-run drift story — profile today,
score tomorrow against the parquet snapshot."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.checks.baseline import (
    drift_against_baseline,
    read_baseline,
    snapshot_profile,
    write_baseline,
)


def _table(spark, shift: float = 0.0, n: int = 4000):
    return spark.range(0, n).select(
        ((F.col("id") % 100).cast("double") + shift).alias("x"),
        ((F.col("id") * 7 % 50).cast("double")).alias("y"),
    )


def test_snapshot_profile_shape(spark):
    prof = snapshot_profile(_table(spark), ["x", "y"], n_buckets=20)
    rows = {r.column: r for r in prof.collect()}
    assert set(rows) == {"x", "y"}
    assert rows["x"].n == 4000 and rows["x"].lo == 0.0 and rows["x"].hi == 99.0
    assert len(rows["x"].counts) == 20
    assert sum(rows["x"].counts) == 4000  # every value lands in a bucket
    assert abs(rows["y"].mean - sum(i * 7 % 50 for i in range(4000)) / 4000) < 1e-9


def test_baseline_roundtrip_and_drift(spark, tmp_path):
    path = str(tmp_path / "baseline")
    write_baseline(snapshot_profile(_table(spark), ["x", "y"], 20), path)
    base = read_baseline(spark, path)

    # identical table → no drift on either metric
    same = {r.column: r for r in
            drift_against_baseline(_table(spark), base).collect()}
    assert set(same) == {"x", "y"}
    for r in same.values():
        assert r.chi2_statistic < 1e-9 and r.ks_statistic < 1e-9
        assert r.n_current == r.n_baseline == 4000

    # x shifted by half its span → x screams, y stays silent
    drifted = {r.column: r for r in
               drift_against_baseline(_table(spark, shift=50.0), base).collect()}
    assert drifted["x"].chi2_statistic > 100 * max(drifted["y"].chi2_statistic, 1e-12)
    assert drifted["x"].ks_statistic > 0.4
    assert drifted["y"].ks_statistic < 1e-9
    assert abs(drifted["x"].mean_current - drifted["x"].mean_baseline - 50.0) < 1e-9


def test_drift_reports_all_null_column(spark, tmp_path):
    """An upstream break that nulls a column out entirely must still
    produce a drift row (ks = 1.0), not silently vanish from the
    report."""
    path = str(tmp_path / "baseline_nullcol")
    write_baseline(snapshot_profile(_table(spark), ["x", "y"], 20), path)
    base = read_baseline(spark, path)

    broken = _table(spark).select(
        F.lit(None).cast("double").alias("x"), "y"
    )
    got = {r.column: r for r in drift_against_baseline(broken, base).collect()}
    assert set(got) == {"x", "y"}  # x present despite being all-null
    assert got["x"].n_current == 0
    assert abs(got["x"].ks_statistic - 1.0) < 1e-9
    assert got["y"].ks_statistic < 1e-9

    # the mirror case: baseline side all-null, current has data
    path2 = str(tmp_path / "baseline_nullbase")
    write_baseline(snapshot_profile(broken, ["x", "y"], 20), path2)
    base2 = read_baseline(spark, path2)
    got2 = {r.column: r for r in
            drift_against_baseline(_table(spark), base2).collect()}
    assert set(got2) == {"x", "y"}
    assert got2["x"].n_baseline == 0
    assert abs(got2["x"].ks_statistic - 1.0) < 1e-9


def test_rule_stats_one_pass(spark):
    from faang_pydantics_validation_spark.report import rule_stats

    rows = [
        ("r1", "ruleA", "f", "m", "error"),
        ("r1", "ruleA", "f", "m2", "error"),
        ("r2", "ruleA", "f", "m", "error"),
        ("r2", "ruleB", "g", "m", "warning"),
    ]
    v = spark.createDataFrame(
        rows, "record_id string, rule_id string, field string, message string, severity string"
    )
    got = {(r.rule_id, r.severity): r for r in rule_stats(v, total_rows=10).collect()}
    a = got[("ruleA", "error")]
    assert a.n_violations == 3 and a.n_records == 2
    assert abs(a.violation_rate - 0.3) < 1e-9
    b = got[("ruleB", "warning")]
    assert b.n_violations == 1 and b.n_records == 1
    # ordering: most-firing rule first
    first = rule_stats(v).collect()[0]
    assert first.rule_id == "ruleA"
