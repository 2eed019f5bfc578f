"""Distribution-drift scoring — two-sample chi-square / KS over sketches.

North rule: "distribution drift scored per partition with two-sample
KS/chi-square over t-digest sketches". Strategy:

* categorical columns → per-side category counts (one groupBy each), then
  the chi-square statistic computed as DataFrame math over the joined
  count tables — no driver loops over data, only over categories already
  reduced to one row each;
* numeric columns → fixed-grid histograms (one groupBy each) aligned on a
  shared [min, max] span, cumulative sums by window over the (tiny) bucket
  table, KS statistic = max |ECDF_a - ECDF_b|;
* per-partition drift → Arrow-batched ``applyInPandas`` builds one
  histogram sketch row per input partition (the only place Python touches
  data, and it's vectorized numpy over Arrow batches); each partition's
  histogram is then chi-square-scored against the global mixture to flag
  drifting partitions.

The sketches are mergeable (plain counts), so the same code path scales to
1000 executors: sketch size is O(buckets), independent of rows.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------ chi-square --


def chi_square_drift(df_a: DataFrame, df_b: DataFrame, column: str) -> DataFrame:
    """Two-sample chi-square over category counts.

    Returns one row: (statistic, dof, n_a, n_b, p_value). Standard
    contingency form: expected_{s,c} = rowtotal_s * coltotal_c / N.
    """
    ca = df_a.groupBy(F.col(column).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    cb = df_b.groupBy(F.col(column).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    joined = ca.join(cb, "cat", "full_outer").fillna(0, ["n_a", "n_b"])

    totals = joined.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    cells = joined.crossJoin(F.broadcast(totals))
    contrib = cells.select(
        "cat",
        "n_a",
        "n_b",
        "ta",
        "tb",
        (
            ((F.col("n_a") + F.col("n_b")) * F.col("ta") / (F.col("ta") + F.col("tb")))
        ).alias("e_a"),
        (
            ((F.col("n_a") + F.col("n_b")) * F.col("tb") / (F.col("ta") + F.col("tb")))
        ).alias("e_b"),
    )
    stat_row = contrib.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("e_a") > 0, F.pow(F.col("n_a") - F.col("e_a"), 2) / F.col("e_a")).otherwise(0.0)
                + F.when(F.col("e_b") > 0, F.pow(F.col("n_b") - F.col("e_b"), 2) / F.col("e_b")).otherwise(0.0)
            ),
            F.lit(0.0),
        ).alias("statistic"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.coalesce(F.first("ta"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.first("tb"), F.lit(0)).cast("long").alias("n_b"),
    )
    # p-value as a COLUMN over the single reduced row (Arrow-batched UDF
    # evaluating the incomplete-gamma series), so the whole op stays one
    # lazy DataFrame — no mid-pipeline collect + createDataFrame round
    # trip through a Python LocalRelation, and the result composes in
    # lazy/streaming contexts.
    return stat_row.withColumn(
        "p_value", _chi2_sf_col()(F.col("statistic"), F.col("dof"))
    )


def _chi2_sf_col():
    """Arrow-batched p-value UDF. Built lazily: pandas_udf registration
    needs an active SparkContext, which this module must not require at
    import time."""

    @F.pandas_udf("double")
    def chi2_sf_udf(stat: pd.Series, dof: pd.Series) -> pd.Series:
        return pd.Series(
            [
                chi2_sf(float(s) if s is not None else 0.0, max(int(k), 1))
                for s, k in zip(stat, dof)
            ]
        )

    return chi2_sf_udf


def chi2_sf(x: float, k: int) -> float:
    """Survival function of the chi-square distribution — regularized upper
    incomplete gamma Q(k/2, x/2), series/continued-fraction form (public
    textbook algorithm; avoids a scipy dependency)."""
    if x <= 0:
        return 1.0
    a, x2 = k / 2.0, x / 2.0
    if x2 < a + 1.0:
        # lower series
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x2 / n
            total += term
            if abs(term) < abs(total) * 1e-12:
                break
        p_lower = total * math.exp(-x2 + a * math.log(x2) - math.lgamma(a))
        return max(0.0, min(1.0, 1.0 - p_lower))
    # upper continued fraction (Lentz)
    tiny = 1e-300
    b = x2 + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-12:
            break
    q = math.exp(-x2 + a * math.log(x2) - math.lgamma(a)) * h
    return max(0.0, min(1.0, q))


# -------------------------------------------------------------------- KS --


def ks_drift(
    df_a: DataFrame, df_b: DataFrame, column: str, n_buckets: int = 256
) -> DataFrame:
    """Two-sample KS statistic from aligned fixed-grid histograms.

    Exact KS needs a global sort; at 10^12 rows we accept the histogram
    approximation (error <= 1/n_buckets in CDF space), which is the same
    trade a t-digest makes. Three jobs total: span, two groupBys.
    """
    both_min, both_max = _shared_span(df_a, df_b, column)
    if both_min is None or both_max is None or both_max <= both_min:
        spark = df_a.sparkSession
        return spark.createDataFrame(
            [(0.0, n_buckets)], "ks_statistic double, n_buckets int"
        )

    def hist(df: DataFrame, side: str) -> DataFrame:
        col = F.col(column).cast("double")
        b = F.least(
            F.lit(n_buckets - 1),
            F.floor((col - F.lit(both_min)) / F.lit(both_max - both_min) * n_buckets),
        ).cast("int")
        return (
            df.filter(col.isNotNull())
            .groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    ha, hb = hist(df_a, "a"), hist(df_b, "b")
    merged = ha.join(hb, "bucket", "full_outer").fillna(0, ["n_a", "n_b"])

    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bucket",
        (F.sum("n_a").over(w)).alias("ca"),
        (F.sum("n_b").over(w)).alias("cb"),
    )
    totals = merged.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    ks = (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.abs(F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")).alias("d")
        )
        .agg(F.max("d").alias("ks_statistic"))
        .select("ks_statistic", F.lit(n_buckets).alias("n_buckets"))
    )
    return ks


def _shared_span(df_a: DataFrame, df_b: DataFrame, column: str):
    """Combined [min, max] of ``column`` across BOTH sides in ONE Spark
    job: union the two column-pruned scans and aggregate once. The
    min/max partials fold map-side, so the exchange carries one row per
    task — at 100× scale this halves the probe cost vs the former
    one-collect-per-side version (two full scans where one sufficed)."""
    col = F.col(column).cast("double").alias("__v")
    span = (
        df_a.select(col)
        .unionByName(df_b.select(col))
        .agg(F.min("__v").alias("lo"), F.max("__v").alias("hi"))
        .collect()[0]
    )
    return (span.lo, span.hi)


# ------------------------------------------------- per-partition sketches --


def partition_numeric_sketches(
    df: DataFrame,
    column: str,
    n_buckets: int = 64,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """One histogram-sketch row per input partition, built with
    Arrow-batched applyInPandas (vectorized numpy; no per-row Python).

    Output: (partition_id, n, mean, counts array<long>) over a shared
    [lo, hi] grid. Mergeable by summing counts — the t-digest-style
    building block for partition-level drift scoring.
    """
    if lo is None or hi is None:
        span = df.agg(
            F.min(F.col(column).cast("double")).alias("lo"),
            F.max(F.col(column).cast("double")).alias("hi"),
        ).collect()[0]
        lo = span.lo if lo is None else lo
        hi = span.hi if hi is None else hi
    if lo is None or hi is None or hi <= lo:
        hi = (lo or 0.0) + 1.0
        lo = lo or 0.0

    import numpy as np

    lo_f, hi_f, nb = float(lo), float(hi), int(n_buckets)

    def sketch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pd.to_numeric(pdf[column], errors="coerce").dropna().to_numpy()
        counts, _ = np.histogram(vals, bins=nb, range=(lo_f, hi_f))
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "n": [int(len(vals))],
                "mean": [float(vals.mean()) if len(vals) else 0.0],
                "counts": [counts.astype("int64").tolist()],
            }
        )

    keyed = df.select(
        F.spark_partition_id().alias("__pid"), F.col(column)
    )
    return keyed.groupBy("__pid").applyInPandas(
        sketch,
        schema="partition_id int, n long, mean double, counts array<long>",
    )


def partition_drift_scores(sketches: DataFrame) -> DataFrame:
    """Chi-square each partition's histogram against the global mixture
    (all partitions summed). Output: (partition_id, statistic, dof, n) —
    the per-partition drift metric the checkpoint manifest records."""
    # aggregate global histogram via posexplode to keep bucket alignment
    g = (
        sketches.select(F.posexplode("counts").alias("bucket", "c"))
        .groupBy("bucket")
        .agg(F.sum("c").alias("gc"))
    )
    per = sketches.select(
        "partition_id", "n", F.posexplode("counts").alias("bucket", "c")
    )
    joined = per.join(F.broadcast(g), "bucket")
    totals = g.agg(F.sum("gc").alias("gn")).collect()[0]
    gn = float(totals.gn or 1)
    scored = (
        joined.withColumn("e", F.col("n") * F.col("gc") / F.lit(gn))
        .groupBy("partition_id", "n")
        .agg(
            F.sum(
                F.when(
                    F.col("e") > 0, F.pow(F.col("c") - F.col("e"), 2) / F.col("e")
                ).otherwise(0.0)
            ).alias("statistic"),
            (F.count(F.lit(1)) - 1).alias("dof"),
        )
        .select("partition_id", "statistic", "dof", F.col("n"))
    )
    return scored
