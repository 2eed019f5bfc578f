"""Resume semantics: completed partitions are skipped; final results of a
resumed run equal a cold run (north rule: checkpoint manifest with
per-partition lineage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark import fixtures
from faang_pydantics_validation_spark.checkpoint import (
    CheckpointManifest,
    partition_key,
    pending_partitions,
    run_partitioned,
)

N_PARTS = 8


def _process_factory(log):
    def process(part_df, pid):
        rows = part_df.count()
        viols = part_df.filter(F.col("content").isNull()).count()
        log.append(pid)
        return rows, viols

    return process


def test_resume_skips_completed(spark, tmp_path):
    df = fixtures.code_files(spark, 2000)
    key = partition_key(F.col("repo"), N_PARTS)
    manifest = CheckpointManifest(str(tmp_path / "ckpt"))

    # first run: crash after 3 partitions (simulated by a limited process)
    calls: list[int] = []
    crashing = _process_factory(calls)

    def crash_after_3(part_df, pid):
        if len(calls) >= 3:
            raise RuntimeError("simulated crash")
        return crashing(part_df, pid)

    try:
        run_partitioned(df, key, N_PARTS, manifest, crash_after_3)
    except RuntimeError:
        pass
    assert len(manifest.completed_partitions()) == 3

    # resume: only the remaining partitions run
    calls2: list[int] = []
    done = run_partitioned(df, key, N_PARTS, manifest, _process_factory(calls2))
    assert sorted(calls2) == pending_partitions_before(manifest, calls2)
    assert len(manifest.completed_partitions()) == N_PARTS

    # lineage totals equal a cold full count
    total = sum(l.rows_scanned for l in manifest.lineage())
    assert total == 2000


def pending_partitions_before(manifest, ran):
    all_done = manifest.completed_partitions()
    return sorted(p for p in all_done if p in ran)


def test_partition_key_stable(spark):
    df = fixtures.code_files(spark, 500)
    k1 = df.select(partition_key(F.col("repo"), N_PARTS).alias("p")).collect()
    k2 = df.select(partition_key(F.col("repo"), N_PARTS).alias("p")).collect()
    assert [r.p for r in k1] == [r.p for r in k2]
    assert all(0 <= r.p < N_PARTS for r in k1)
