"""Persisted stats baselines: profile a table once, score later runs
against the snapshot.

At 100 TB the drift question is rarely "partition A vs partition B of
this run" (checks/drift.py covers that) but "today's table vs the
accepted snapshot". This module writes the numeric profile of a table —
per-column fixed-grid histogram + count/mean — as a TINY parquet
artifact (one row per column), and scores any later table against it
without touching the baseline's source data again.

Scale shape: profiling is ONE melt (explode of (column, bucket) structs
— each column's bucket is computed from its OWN (lo, hi) literals
inside the struct before the explode, so the per-melted-row cost is
O(1), independent of how many columns are profiled) followed by a
groupBy(column, bucket) — the only table-sized shuffle, partial-
aggregated map-side, shared by every profiled column; the histogram
re-pack groupBy afterwards only reshuffles the already-reduced
≤ n_cols × n_buckets rows. Scoring joins the current histogram against
the baseline's (≤ n_cols × n_buckets rows on both sides) and reduces
per column: chi-square on aligned bucket counts plus the same
histogram-KS approximation ks_drift uses (error ≤ 1/n_buckets in CDF
space). Every grid column always carries a dense zero-filled counts
array — a column that is all-null on either side scores ks = 1.0
instead of silently vanishing from the report. No driver-side data path
beyond the per-column grid rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize_grid(
    grid: dict[str, tuple[float | None, float | None]],
) -> dict[str, tuple[float, float]]:
    """Degenerate (all-null or constant) columns get a unit-width grid."""
    out = {}
    for c, (lo, hi) in grid.items():
        if lo is None or hi is None or hi <= lo:
            lo, hi = (lo or 0.0), (lo or 0.0) + 1.0
        out[c] = (float(lo), float(hi))
    return out


def _grid_histogram(
    df: DataFrame, grid: dict[str, tuple[float, float]], n_buckets: int
) -> DataFrame:
    """(column, counts array<long>) histogram for every grid column in
    one melt + one table-sized groupBy. The bucket index is computed
    per-column BEFORE the explode, with that column's (lo, hi) as
    literals — O(1) per melted row regardless of n_cols. Columns with
    no non-null values are absent here; callers zero-fill via
    ``_dense_counts``."""
    structs = []
    for c, (lo, hi) in grid.items():
        v = F.col(c).cast("double")
        # least/greatest SKIP nulls, so gate explicitly: null value →
        # null bucket (dropped below), not the clamp edge.
        b = F.when(
            v.isNotNull(),
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((v - F.lit(lo)) / F.lit(hi - lo) * n_buckets),
                ),
            ),
        ).cast("int")
        structs.append(F.struct(F.lit(c).alias("column"), b.alias("bucket")))

    return (
        df.select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.column", "kv.bucket")
        .filter(F.col("bucket").isNotNull())  # null value → null bucket
        .groupBy("column", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("column")
        .agg(
            F.map_from_arrays(
                F.collect_list("bucket"), F.collect_list("n")
            ).alias("__m")
        )
        .select(
            "column",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda b: F.coalesce(
                    F.element_at(F.col("__m"), b.cast("int")), F.lit(0)
                ).cast("long"),
            ).alias("counts"),
        )
    )


def _dense_counts(n_buckets: int):
    """counts, zero-filled for columns the histogram never saw."""
    return F.coalesce(
        F.col("counts"),
        F.array_repeat(F.lit(0).cast("long"), n_buckets),
    ).alias("counts")


def snapshot_profile(
    df: DataFrame, columns: list[str], n_buckets: int = 64
) -> DataFrame:
    """Numeric profile, one row per column:
    (column, lo, hi, n, mean, n_buckets, counts array<long>).

    Grid bounds come from one fused min/max/avg agg; the histogram for
    ALL columns is one melt + one groupBy (single shuffle)."""
    spark = df.sparkSession
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs += [
            F.min(col).alias(f"__lo_{c}"),
            F.max(col).alias(f"__hi_{c}"),
            F.count(col).alias(f"__n_{c}"),
            F.avg(col).alias(f"__mean_{c}"),
        ]
    span = df.agg(*aggs).collect()[0]

    grid = _normalize_grid(
        {c: (span[f"__lo_{c}"], span[f"__hi_{c}"]) for c in columns}
    )
    hist = _grid_histogram(df, grid, n_buckets)
    meta_rows = [
        (
            c,
            float(span[f"__lo_{c}"]) if span[f"__lo_{c}"] is not None else 0.0,
            float(span[f"__hi_{c}"]) if span[f"__hi_{c}"] is not None else 1.0,
            int(span[f"__n_{c}"]),
            float(span[f"__mean_{c}"]) if span[f"__mean_{c}"] is not None else 0.0,
            n_buckets,
        )
        for c in columns
    ]
    meta = spark.createDataFrame(
        meta_rows, "column string, lo double, hi double, n long, mean double, n_buckets int"
    )
    return meta.join(hist, "column", "left").select(
        "column", "lo", "hi", "n", "mean", "n_buckets", _dense_counts(n_buckets)
    )


def write_baseline(profile: DataFrame, path: str) -> None:
    """Persist the snapshot (tiny: one row per column)."""
    profile.coalesce(1).write.mode("overwrite").parquet(path)


def read_baseline(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def drift_against_baseline(df: DataFrame, baseline: DataFrame) -> DataFrame:
    """Score ``df`` against a persisted snapshot. Output, one row per
    baseline column:
    (column, n_current, n_baseline, mean_current, mean_baseline,
     chi2_statistic, dof, ks_statistic).

    The current histogram is computed on the BASELINE's grid (so buckets
    align); chi-square uses baseline-proportion expected counts, KS is
    the max |ΔCDF| over aligned buckets. Both sides carry dense
    zero-filled counts, so every baseline column appears in the output
    even when all-null on one side (scoring ks = 1.0 there, which is
    exactly the upstream-break signal). Everything reduces per column in
    one shuffle over ≤ n_cols × n_buckets rows."""
    base_rows = baseline.collect()  # one row per column — driver-tiny
    n_buckets = base_rows[0].n_buckets if base_rows else 64

    cur = snapshot_profile_on_grid(
        df, {r.column: (r.lo, r.hi) for r in base_rows}, n_buckets
    )

    b = baseline.select(
        "column",
        F.col("n").alias("n_baseline"),
        F.col("mean").alias("mean_baseline"),
        F.posexplode("counts").alias("bucket", "nb"),
    )
    c = cur.select(
        "column",
        F.col("n").alias("n_current"),
        F.col("mean").alias("mean_current"),
        F.posexplode("counts").alias("bucket", "nc"),
    )
    j = b.join(c, ["column", "bucket"])
    w = (
        Window.partitionBy("column")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = j.select(
        "column",
        "n_current",
        "n_baseline",
        "mean_current",
        "mean_baseline",
        "nb",
        "nc",
        (F.col("nb") / F.greatest("n_baseline", F.lit(1)) * F.col("n_current")).alias(
            "e"
        ),
        (
            F.sum("nc").over(w) / F.greatest("n_current", F.lit(1))
            - F.sum("nb").over(w) / F.greatest("n_baseline", F.lit(1))
        ).alias("cdf_diff"),
    )
    return (
        scored.groupBy(
            "column", "n_current", "n_baseline", "mean_current", "mean_baseline"
        )
        .agg(
            F.sum(
                F.when(
                    F.col("e") > 0,
                    F.pow(F.col("nc") - F.col("e"), 2) / F.col("e"),
                ).otherwise(0.0)
            ).alias("chi2_statistic"),
            (
                F.sum((F.col("nb") > 0).cast("long")) - F.lit(1)
            ).alias("dof"),
            F.max(F.abs(F.col("cdf_diff"))).alias("ks_statistic"),
        )
        .select(
            "column",
            "n_current",
            "n_baseline",
            "mean_current",
            "mean_baseline",
            "chi2_statistic",
            "dof",
            "ks_statistic",
        )
    )


def snapshot_profile_on_grid(
    df: DataFrame, grid: dict[str, tuple[float, float]], n_buckets: int
) -> DataFrame:
    """Like :func:`snapshot_profile` but bucketing on a GIVEN per-column
    (lo, hi) grid — the aligned-histogram half of baseline scoring.
    Out-of-grid values clamp into the edge buckets."""
    columns = list(grid)
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs += [F.count(col).alias(f"__n_{c}"), F.avg(col).alias(f"__mean_{c}")]
    stats = df.agg(*aggs).collect()[0]

    hist = _grid_histogram(df, _normalize_grid(grid), n_buckets)
    spark = df.sparkSession
    meta = spark.createDataFrame(
        [
            (
                c,
                int(stats[f"__n_{c}"]),
                float(stats[f"__mean_{c}"]) if stats[f"__mean_{c}"] is not None else 0.0,
            )
            for c in columns
        ],
        "column string, n long, mean double",
    )
    return meta.join(hist, "column", "left").select(
        "column", "n", "mean", _dense_counts(n_buckets)
    )
