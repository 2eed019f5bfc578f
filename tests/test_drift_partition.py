"""Per-partition drift sketches + chi-square scoring (the Arrow
applyInPandas path — the one place pandas UDFs are by design; SURVEY §4).
This path is pytest-covered instead of holding a driver-registry slot:
the registry is capped at 50 entries (see queries.py tail note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.checks.drift import (
    partition_drift_scores,
    partition_numeric_sketches,
)


def _three_partition_frame(spark):
    """3 scan partitions of 1000 rows each; partition 2 drifted from
    uniform-[0,100) to uniform-[200,300). Values derive from
    spark_partition_id so the layout is the data, not an AQE-coalescible
    shuffle artifact."""
    return spark.range(0, 3000, 1, 3).select(
        F.when(
            F.spark_partition_id() == 2, 200 + (F.col("id") % 100)
        )
        .otherwise((F.col("id") * 7) % 100)
        .cast("double")
        .alias("x")
    )


def test_partition_sketches_shape_and_merge(spark):
    sk = partition_numeric_sketches(_three_partition_frame(spark), "x", n_buckets=30)
    rows = sk.collect()
    assert len(rows) == 3
    assert [r.n for r in rows] == [1000, 1000, 1000]
    # counts are mergeable: per-partition sums equal partition row counts
    assert all(sum(r.counts) == r.n for r in rows)
    assert all(len(r.counts) == 30 for r in rows)
    # the shifted partition's mass lives in the top third of the grid
    shifted = next(r for r in rows if r.mean > 150)
    assert sum(shifted.counts[:20]) == 0 and sum(shifted.counts[20:]) == 1000
    uniform = next(r for r in rows if r.mean < 150)
    assert sum(uniform.counts[20:]) == 0


def test_partition_drift_scores_flag_shifted_partition(spark):
    sk = partition_numeric_sketches(_three_partition_frame(spark), "x", n_buckets=30)
    means = {r.partition_id: r.mean for r in sk.collect()}
    scores = {r.partition_id: r.statistic for r in partition_drift_scores(sk).collect()}
    assert len(scores) == 3
    assert all(s >= 0 for s in scores.values())
    shifted_pid = next(p for p, m in means.items() if m > 150)
    # the shifted partition deviates far more from the global mixture
    # than either uniform partition
    assert all(
        scores[shifted_pid] > 2 * s
        for p, s in scores.items()
        if p != shifted_pid
    )


def test_shared_span_is_one_action_and_null_safe(spark, monkeypatch):
    """The KS span probe unions both sides and aggregates ONCE — a
    single collect (one job-submission point), not one scan per side
    (VERDICT r3: two full scans where one suffices). NULL columns and
    empty frames still yield (None, None) / one-sided spans."""
    import faang_pydantics_validation_spark.checks.drift as d

    a = spark.range(100).selectExpr("cast(id as double) as x")
    # patch the CONCRETE DataFrame class (pyspark 4 routes
    # pyspark.sql.DataFrame to a classic/connect subclass, so patching
    # the facade never intercepts)
    cls = type(a)
    calls: list[int] = []
    orig = cls.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)

    b = spark.range(50, 150).selectExpr("cast(id as double) as x")
    assert d._shared_span(a, b, "x") == (0.0, 149.0)
    assert len(calls) == 1

    nulls = spark.range(10).selectExpr("cast(null as double) as x")
    assert d._shared_span(nulls, nulls, "x") == (None, None)
    # one all-NULL side: span comes from the other side alone
    assert d._shared_span(a, nulls, "x") == (0.0, 99.0)
