"""Key-uniqueness check — salted two-stage aggregation (G3 + north rule).

The reference silently last-wins on duplicate sample names
(``sample_map[sample_name] = model``, organism_validation.py:218-221); the
north rule upgrades this to an explicit uniqueness constraint that must
survive 10^12 rows with hot-key skew (a monorepo holding a large fraction
of all files).

Why two stages: a plain ``groupBy(keys).count()`` already gets map-side
partial aggregation, but when ONE key value repeats across a huge number
of input partitions its final-merge reducer still receives one partial row
per partition AND — worse — upstream operators that group by a PREFIX of
the key (per-repo rollups) hash all of a hot repo to one task. Stage one
groups by (keys, salt) so every reducer sees a bounded slice; stage two
merges the per-salt partials. Salt = spark_partition_id() — deterministic
per run, zero extra columns to shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_key_counts(
    df: DataFrame, keys: list[str], salt_buckets: int = 64
) -> DataFrame:
    """Keys occurring more than once → (key cols..., dup_count).

    Two-stage: partial count per (keys, salt) then merge per keys. The
    salt column never leaves stage one.
    """
    salted = (
        df.groupBy(*keys, F.spark_partition_id().alias("__salt"))
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (
        salted.groupBy(*keys)
        .agg(F.sum("__partial").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_violations(
    df: DataFrame,
    keys: list[str],
    rule_id: str,
    record_id: Column | str,
    message: str | None = None,
    severity: str = "error",
) -> DataFrame:
    """Per-RECORD violation rows for every row participating in a duplicate
    key group (all copies are flagged, not just the extras — the engine has
    no notion of which copy is 'first' on an unordered table).

    The join back to facts is a shuffle hash join on the full key; AQE
    splits skewed key groups at runtime.
    """
    rid = F.col(record_id) if isinstance(record_id, str) else record_id
    dups = duplicate_key_counts(df, keys)
    facts = df.withColumn("__rid", rid).select("__rid", *keys)
    flagged = facts.join(dups.hint("shuffle_hash"), on=keys, how="inner")
    msg = message or ("Duplicate key (" + ", ".join(keys) + ")")
    return flagged.select(
        F.col("__rid").alias("record_id"),
        F.lit(rule_id).alias("rule_id"),
        F.lit(",".join(keys)).alias("field"),
        F.concat(
            F.lit(msg + ": "), F.col("dup_count").cast("string"), F.lit(" copies")
        ).alias("message"),
        F.lit(severity).alias("severity"),
    )
