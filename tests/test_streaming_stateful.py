"""applyInPandasWithState: state must carry across micro-batches."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.rules import Rule, RuleSet
from faang_pydantics_validation_spark.streaming.incremental import (
    read_file_stream,
    validate_stream,
)
from faang_pydantics_validation_spark.streaming.stateful import violation_streaks

SCHEMA = "id long, src string, v string, ts timestamp"
RULESET = RuleSet(name="s", rules=(Rule("v_required", "v", "required"),))


def test_state_carries_across_micro_batches(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    t = datetime.datetime(2026, 1, 1)
    # two files → two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [(1, "a", None, t), (2, "a", "ok", t), (3, "b", "ok", t)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src_dir)
    spark.createDataFrame(
        [(4, "a", None, t), (5, "b", None, t)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = read_file_stream(spark, src_dir, SCHEMA, max_files=1)
    annotated = validate_stream(stream, RULESET, F.col("id").cast("string"))
    out = violation_streaks(annotated, "src")
    q = (
        out.writeStream.format("memory")
        .queryName("streaks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from streaks").collect()
    # one emission per key per batch; find the FINAL snapshot per key
    # (max total_rows)
    final = {}
    for r in rows:
        if r.key not in final or r.total_rows > final[r.key].total_rows:
            final[r.key] = r
    # 'a': batch1 (2 rows, 1 err) + batch2 (1 row, 1 err) — cumulative
    # totals prove state carried; streak 2 proves consecutive tracking
    assert final["a"].total_rows == 3
    assert final["a"].total_errors == 2
    assert final["a"].error_streak == 2
    # 'b': clean batch1 then error batch2 → streak reset then 1
    assert final["b"].total_rows == 2
    assert final["b"].total_errors == 1
    assert final["b"].error_streak == 1
    # per-key emissions: one per micro-batch the key appeared in
    assert len([r for r in rows if r.key == "a"]) == 2
