"""Incremental validation: file-arrival stream through the fused kernel,
append violation sink, watermarked window aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.rules import Rule, RuleSet
from faang_pydantics_validation_spark.streaming.incremental import (
    read_file_stream,
    start_violation_sink,
    validate_stream,
    violation_rate_by_window,
    violations_stream,
)

SCHEMA = "id long, v string, ts timestamp"
RULESET = RuleSet(
    name="s",
    rules=(
        Rule("v_required", "v", "required", tier="mandatory"),
        Rule("v_enum", "v", "enum", params={"values": ["ok", "meh"]}),
    ),
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_file_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import datetime

    t = datetime.datetime(2026, 1, 1, 12, 0, 0)
    _write_batch(
        spark,
        src,
        [(1, "ok", t), (2, "BAD", t), (3, None, t)],
    )

    stream = read_file_stream(spark, src, SCHEMA)
    assert stream.isStreaming
    annotated = validate_stream(stream, RULESET, F.col("id").cast("string"))
    q = start_violation_sink(violations_stream(annotated), out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    by_rule = {(r.record_id, r.rule_id) for r in got}
    assert by_rule == {("2", "v_enum"), ("3", "v_required")}

    # second batch arrives; availableNow restart processes ONLY new files
    _write_batch(spark, src, [(4, "nope", t)])
    q2 = start_violation_sink(violations_stream(
        validate_stream(read_file_stream(spark, src, SCHEMA), RULESET,
                        F.col("id").cast("string"))), out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out).collect()
    assert {(r.record_id, r.rule_id) for r in got2} == by_rule | {("4", "v_enum")}


def test_windowed_rate(spark, tmp_path):
    src = str(tmp_path / "in2")
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 30)
    t1 = datetime.datetime(2026, 1, 1, 12, 1, 30)
    _write_batch(
        spark, src,
        [(1, "ok", t0), (2, "BAD", t0), (3, "ok", t1), (4, None, t1), (5, "BAD", t1)],
    )
    annotated = validate_stream(
        read_file_stream(spark, src, SCHEMA), RULESET, F.col("id").cast("string")
    )
    rates = violation_rate_by_window(annotated, "ts", "1 minute", "5 minutes")
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.window.start.minute: r for r in spark.sql("select * from rates").collect()}
    assert rows[0].rows == 2 and rows[0].rows_with_errors == 1
    assert rows[1].rows == 3 and rows[1].rows_with_errors == 2
    assert rows[1].total_errors == 2


def test_stream_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates within the watermark
    horizon are suppressed across micro-batches, with keyed state
    evicted as the watermark advances (bounded-state streaming dedup)."""
    import datetime

    from faang_pydantics_validation_spark.streaming.incremental import (
        dedup_stream,
    )

    src = str(tmp_path / "dd_in")
    t = datetime.datetime(2026, 1, 1, 12, 0, 0)
    # batch 1 carries an in-batch duplicate; batch 2 re-sends key 1
    _write_batch(spark, src, [(1, "ok", t), (1, "ok", t), (2, "meh", t)])
    _write_batch(
        spark,
        src,
        [(1, "ok", t + datetime.timedelta(minutes=1)), (3, "ok", t)],
    )

    deduped = dedup_stream(
        read_file_stream(spark, src, SCHEMA, max_files=1),
        keys=["id"],
        ts_col="ts",
        watermark="10 minutes",
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select id from dd").collect()
    ids = sorted(r.id for r in rows)
    assert ids == [1, 2, 3], ids
