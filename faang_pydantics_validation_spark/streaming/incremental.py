"""Incremental validation over Structured Streaming.

The reference is batch-only (SURVEY.md §2.7) — this module is the engine
extension for the arriving-data case: new files land in the table
directory (or an Iceberg/Kafka source), each micro-batch flows through
the SAME fused rule kernel (the compiled Column expressions are
stateless and narrow, so they apply to streaming frames unchanged), and
two sinks come out:

* an append-only violations stream;
* a watermarked per-window violation-rate aggregate — the drift monitor's
  streaming twin (late rows beyond the watermark are dropped, state is
  bounded).

Table-scoped checks (uniqueness, referential) are deliberately NOT run
per micro-batch: uniqueness across an unbounded stream is unbounded
state; the engine's answer is the batch checkpoint/resume path
(checkpoint.py) run periodically over the accumulated table, which the
north rule's lineage manifest already covers. Referential checks against
BROADCAST dims are safe in-stream and included when dims are supplied.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.engine import ValidationEngine
from faang_pydantics_validation_spark.rules import RuleSet


def read_file_stream(
    spark, path: str, schema: str, fmt: str = "parquet", max_files: int = 16
) -> DataFrame:
    """File-arrival source with a bounded per-batch file count (backpressure
    at 100 TB: without maxFilesPerTrigger one giant listing becomes one
    giant micro-batch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .format(fmt)
        .load(path)
    )


def validate_stream(
    stream_df: DataFrame, ruleset: RuleSet, record_id: Column | str
) -> DataFrame:
    """Annotated streaming frame — identical semantics to the batch
    ``ValidationEngine.validate`` (same compiled Columns, same layering
    and short-circuit)."""
    return ValidationEngine(ruleset).validate(stream_df, record_id).annotated


def violations_stream(annotated: DataFrame) -> DataFrame:
    """Exploded violation rows as an append stream."""
    return annotated.select(
        "record_id", F.explode("violations").alias("v")
    ).select(
        "record_id",
        F.col("v.rule_id").alias("rule_id"),
        F.col("v.field").alias("field"),
        F.col("v.message").alias("message"),
        F.col("v.severity").alias("severity"),
    )


def violation_rate_by_window(
    annotated: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked windowed violation-rate monitor:
    (window, rows, rows_with_errors, total_errors, total_warnings).

    Watermark bounds state: windows older than ``watermark`` are finalized
    and evicted, so state size is O(active windows), independent of stream
    length — the late-data story for a perpetual 100 TB ingest.
    """
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("n_errors") > 0).cast("long")).alias("rows_with_errors"),
            F.sum("n_errors").alias("total_errors"),
            F.sum("n_warnings").alias("total_warnings"),
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key only until the
    watermark passes it, so state is O(keys per watermark window) —
    the streaming answer to the batch sha-groupBy dedup
    (ops/dedup.exact_duplicate_groups). Duplicates arriving within the
    watermark horizon are suppressed; older re-arrivals are the batch
    checkpoint sweep's job (same division of labor as uniqueness —
    module docstring).

    Plain ``dropDuplicates`` on a stream would grow state forever; this
    is the operator the 100 TB perpetual-ingest path actually deploys.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def start_foreach_batch_sink(
    df: DataFrame,
    handler,
    checkpoint: str,
    trigger_processing_time: str | None = None,
    trigger_available_now: bool = False,
):
    """foreachBatch sink — the extension point for destinations Spark has
    no native connector for (JDBC upserts, REST posts, multi-table
    fan-out). Each micro-batch arrives at ``handler(batch_df, epoch_id)``
    as a BATCH DataFrame; the epoch id is the idempotence key (replays
    after a failure re-deliver the same epoch, so handlers overwrite or
    dedup by it — exactly-once is handler + checkpoint, not magic)."""
    writer = df.writeStream.foreachBatch(handler).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_processing_time is not None:
        writer = writer.trigger(processingTime=trigger_processing_time)
    return writer.start()


def start_violation_sink(
    violations: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Append-only parquet sink with exactly-once file tracking via the
    streaming checkpoint (separate from the batch lineage manifest)."""
    writer = (
        violations.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
