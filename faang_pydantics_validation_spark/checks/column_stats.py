"""Per-column statistics in ONE fused aggregation pass.

North-rule requirement: null rate, distinct count (HLL via
approx_count_distinct), min/max, and length histograms computed in a
single scan — never one job per column. All expressions land in one
``df.agg(...)``: Spark executes them as one partial+final hash aggregate
with whole-stage codegen, so adding a column adds zero passes.

At 100 TB this is the difference between one scan and dozens; combined
with column pruning the scan only reads the profiled columns
(``.explain`` shows ReadSchema limited to them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, null_count, null_rate, distinct_count, min, max,
    avg_len, max_len).

    ``exact_distinct`` swaps HLL for an exact count-distinct — used by
    tests and the DuckDB oracle; production keeps the sketch.
    min/max/avg_len/max_len are only populated where the type makes sense;
    min/max are stringified so heterogeneous columns fit one schema.
    """
    field_types = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or [
        c
        for c in df.columns
        if not isinstance(schema[c], (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
    ]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__null_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(col).alias(f"__dist_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(col, rsd=approx_rsd).alias(f"__dist_{c}")
            )
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        if isinstance(schema[c], T.StringType):
            aggs.append(F.avg(F.length(col)).alias(f"__avglen_{c}"))
            aggs.append(F.max(F.length(col)).cast("long").alias(f"__maxlen_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__avglen_{c}"))
            aggs.append(F.lit(None).cast("long").alias(f"__maxlen_{c}"))

    wide = df.agg(*aggs)

    per_col_structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("null_count"),
            (F.col(f"__null_{c}") / F.col("__n")).alias("null_rate"),
            F.col(f"__dist_{c}").cast("long").alias("distinct_count"),
            F.col(f"__min_{c}").alias("min"),
            F.col(f"__max_{c}").alias("max"),
            F.col(f"__avglen_{c}").alias("avg_len"),
            F.col(f"__maxlen_{c}").alias("max_len"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*per_col_structs)).alias("s")
    ).select("s.*")


def length_histogram(
    df: DataFrame, column: str, bucket_width: int = 64
) -> DataFrame:
    """Bucketed histogram of string lengths:
    (bucket_start, bucket_end, n). One groupBy — partial+final agg."""
    bucket = (F.floor(F.length(F.col(column)) / bucket_width)).alias("__b")
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.col("__b") * bucket_width).cast("long").alias("bucket_start"),
            ((F.col("__b") + 1) * bucket_width).cast("long").alias("bucket_end"),
            "n",
        )
        .orderBy("bucket_start")
    )


def observe_metrics(df: DataFrame, name: str = "validation_metrics"):
    """Attach an ``observe`` so row/violation counters come out of the SAME
    job that writes results — zero extra scans (SURVEY.md §4 fused pass).
    Expects the annotated frame from ValidationEngine.validate()."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("n_errors").cast("long")).alias("errors"),
        F.sum(F.col("n_warnings").cast("long")).alias("warnings"),
        F.sum((~F.col("passed")).cast("long")).alias("invalid_records"),
    )
    return observed, obs


def grouped_percentiles(
    df: DataFrame,
    value_col: str,
    by: list[str],
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
) -> DataFrame:
    """Quantile profile per group — one partial+final aggregate.

    ``exact=True`` uses Spark's exact interpolated ``percentile``
    (linear interpolation on the sorted group — value-identical to
    DuckDB's ``quantile_cont``, which is what makes the driver-oracle
    hash comparison possible). At the 100 TB scale exact per-group
    sorting is the wrong physics: flip ``exact=False`` for
    ``approx_percentile`` — the mergeable t-digest-style sketch with the
    same output shape, error bounded by the accuracy knob, one pass,
    O(sketch) memory per group.
    """
    fn = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, 10_000)
    )
    aggs = [
        F.round(fn(F.col(value_col), p), 6).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    aggs.append(F.count(F.lit(1)).cast("long").alias("n"))
    return df.groupBy(*by).agg(*aggs)
