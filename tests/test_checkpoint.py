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


def _group_processor(log):
    """Counts rows/violations per partition within the ONE group frame."""

    def process_group(part_df, group):
        log.extend(group)
        rows = (
            part_df.groupBy("__ckpt_part")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("content").isNull().cast("int")).alias("v"),
            )
            .collect()
        )
        return {
            int(r["__ckpt_part"]): (int(r["n"]), int(r["v"] or 0)) for r in rows
        }

    return process_group


def test_resume_skips_completed(spark, tmp_path):
    df = fixtures.code_files(spark, 2000)
    key = partition_key(F.col("repo"), N_PARTS)
    manifest = CheckpointManifest(str(tmp_path / "ckpt"))

    # first run: crash after the first group of 3 (simulated)
    calls: list[int] = []
    first = _group_processor(calls)

    def crash_after_first_group(part_df, group):
        if calls:
            raise RuntimeError("simulated crash")
        return first(part_df, group)

    try:
        run_partitioned(
            df, key, N_PARTS, manifest, crash_after_first_group, group_size=3
        )
    except RuntimeError:
        pass
    completed_before = manifest.completed_partitions()
    assert len(completed_before) == 3

    # resume: ONLY the 5 remaining partitions are processed — the test
    # fails if resume re-processes completed work (the processed set must
    # be exactly the pending set and disjoint from the completed set)
    calls2: list[int] = []
    done = run_partitioned(
        df, key, N_PARTS, manifest, _group_processor(calls2), group_size=3
    )
    assert len(calls2) == N_PARTS - 3
    assert set(calls2).isdisjoint(completed_before)
    assert sorted(calls2) == sorted(set(range(N_PARTS)) - set(completed_before))
    assert len(manifest.completed_partitions()) == N_PARTS
    assert sorted(l.partition_id for l in done) == sorted(calls2)

    # lineage totals equal a cold full count
    total = sum(l.rows_scanned for l in manifest.lineage())
    assert total == 2000


def test_group_batching_one_filter_per_group(spark, tmp_path):
    """The group frame carries ALL of the group's partitions (one
    IN-filter job per group, not one == job per partition)."""
    df = fixtures.code_files(spark, 1000)
    key = partition_key(F.col("repo"), N_PARTS)
    manifest = CheckpointManifest(str(tmp_path / "ckpt2"))

    group_shapes: list[tuple[int, ...]] = []

    def probe(part_df, group):
        seen = sorted(
            r["__ckpt_part"]
            for r in part_df.select("__ckpt_part").distinct().collect()
        )
        group_shapes.append((tuple(group), tuple(seen)))
        return {p: (0, 0) for p in group}

    run_partitioned(df, key, N_PARTS, manifest, probe, group_size=4)
    assert len(group_shapes) == 2  # ceil(8/4) groups, not 8 calls
    for group, seen in group_shapes:
        assert set(seen) <= set(group) and len(group) == 4


def test_empty_partitions_recorded(spark, tmp_path):
    """Hash slots with no rows still get manifest entries (rows=0), so a
    resumed run does not retry them forever."""
    df = fixtures.code_files(spark, 10).filter(F.col("repo").isNull())  # empty
    key = partition_key(F.col("repo"), N_PARTS)
    manifest = CheckpointManifest(str(tmp_path / "ckpt3"))
    done = run_partitioned(
        df, key, N_PARTS, manifest, lambda pdf, g: {}, group_size=8
    )
    assert len(done) == N_PARTS
    assert all(l.rows_scanned == 0 for l in done)
    assert pending_partitions(manifest, N_PARTS) == []


def test_partition_key_stable(spark):
    df = fixtures.code_files(spark, 500)
    k1 = df.select(partition_key(F.col("repo"), N_PARTS).alias("p")).collect()
    k2 = df.select(partition_key(F.col("repo"), N_PARTS).alias("p")).collect()
    assert [r.p for r in k1] == [r.p for r in k2]
    assert all(0 <= r.p < N_PARTS for r in k1)
