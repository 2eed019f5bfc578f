"""Cross-record relationship checks — the batch-scoped second pass.

The reference runs these as a driver-side dict walk over all validated
records (``validate_relationships``, /root/reference/app/
organism_validation.py:211-265, helpers organism_validator_classes.py:
144-230). Here every check is a join:

* J4 parent existence  — explode(child_of) → left-anti join against the
  union of batch ids and the external known-parents dimension;
* J5 allowed parent kind — same exploded edges inner-joined to the parent
  record, parent's kind checked against a broadcast allowed-pairs table;
* G1 attribute match    — child attr must equal parent attr on the same
  exploded edge join;
* G2 2-cycle detection  — edges self-joined one hop out: (c→p) ⋈ (p→c).
  The reference ONLY detects 2-cycles, not general cycles
  (organism_validator_classes.py:219-230) — we match that exactly.

Scale notes: the edge table is the exploded fan-out of an array column, so
its cardinality is bounded by sum(|child_of|) (≤2 per record in the
reference schema). Joins back to the record table shuffle on record id;
hot parents (one organism with millions of children at 10^12 scale) are
exactly the AQE skew-join case, and the parent side can be broadcast when
the id universe is small. All checks share ONE exploded edge frame so the
explode happens once per run, not once per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sentinels that opt an edge out of referential checks
#: (organism_validation.py:236-237)
SKIP_PARENT_VALUES = ("restricted access",)


def explode_edges(
    df: DataFrame,
    child_id: str,
    parents_col: str,
    keep: tuple[str, ...] = (),
    skip_values: tuple[str, ...] = SKIP_PARENT_VALUES,
) -> DataFrame:
    """(child_id, parent_id, child_pos, *keep) — one row per parent link.

    ``parents_col`` may be array<string> or array<struct> with a ``value``
    field (the reference's ``child_of: [{value: ...}]`` shape).
    """
    elem = F.col("__edge")
    dt = dict(df.dtypes)[parents_col]
    parent = elem["value"] if dt.startswith("array<struct") else elem
    out = (
        df.select(
            F.col(child_id).alias("child_id"),
            F.posexplode_outer(parents_col).alias("child_pos", "__edge"),
            *[F.col(k) for k in keep],
        )
        .withColumn("parent_id", parent)
        .drop("__edge")
        .filter(F.col("parent_id").isNotNull())
    )
    if skip_values:
        out = out.filter(~F.col("parent_id").isin(*skip_values))
    return out


def parent_existence_violations(
    edges: DataFrame,
    batch_ids: DataFrame,
    external_parents: DataFrame | None = None,
    rule_id: str = "rel_parent_missing",
    severity: str = "error",
    broadcast_parents: bool = False,
) -> DataFrame:
    """J4: each parent_id must resolve within the batch or in the external
    known-parents dimension (reference miss error:
    organism_validation.py:257-260).

    ``batch_ids`` — one column ``id``. ``external_parents`` — one column
    ``id`` (e.g. the SAM* BioSamples set), unioned in before the anti join
    so only ONE join runs. Set ``broadcast_parents`` when the id universe
    fits in memory; otherwise it is a shuffle join with AQE skew handling.
    """
    universe = batch_ids.select(F.col("id"))
    if external_parents is not None:
        universe = universe.unionByName(external_parents.select(F.col("id")))
    universe = universe.distinct()
    if broadcast_parents:
        universe = F.broadcast(universe)
    misses = edges.join(
        universe, on=edges["parent_id"] == universe["id"], how="left_anti"
    )
    return misses.select(
        F.col("child_id").alias("record_id"),
        F.lit(rule_id).alias("rule_id"),
        F.lit("child_of").alias("field"),
        F.concat(
            F.lit("Relationships part: no entity '"),
            F.col("parent_id"),
            F.lit("' found"),
        ).alias("message"),
        F.lit(severity).alias("severity"),
    )


def allowed_parent_violations(
    edges: DataFrame,
    records: DataFrame,
    allowed_pairs: DataFrame,
    child_kind_col: str = "kind",
    rule_id: str = "rel_parent_kind",
    severity: str = "error",
) -> DataFrame:
    """J5: the parent record's kind must be allowed for the child's kind
    (ALLOWED_RELATIONSHIPS table, reference constants.py:139-153; check
    organism_validator_classes.py:211-217).

    ``records`` — (id, kind); ``allowed_pairs`` — (child_kind,
    parent_kind), always broadcast (it is a constant table of dozens of
    rows). Edges must carry the child's kind in ``child_kind_col``.
    """
    parents = records.select(
        F.col("id").alias("__pid"), F.col("kind").alias("__parent_kind")
    )
    resolved = edges.join(parents, on=edges["parent_id"] == parents["__pid"], how="inner")
    bad = resolved.join(
        F.broadcast(
            allowed_pairs.select(
                F.col("child_kind").alias("__ck"), F.col("parent_kind").alias("__pk")
            )
        ),
        on=(F.col(child_kind_col) == F.col("__ck"))
        & (F.col("__parent_kind") == F.col("__pk")),
        how="left_anti",
    )
    return bad.select(
        F.col("child_id").alias("record_id"),
        F.lit(rule_id).alias("rule_id"),
        F.lit("child_of").alias("field"),
        F.concat(
            F.lit("Relationships part: referenced entity '"),
            F.col("parent_id"),
            F.lit("' does not match condition 'should be "),
            F.col(child_kind_col),
            F.lit("'"),
        ).alias("message"),
        F.lit(severity).alias("severity"),
    )


def attribute_match_violations(
    edges: DataFrame,
    records: DataFrame,
    attr_col: str,
    child_attr_col: str | None = None,
    rule_id: str = "rel_species_mismatch",
    severity: str = "error",
) -> DataFrame:
    """G1: child's attribute must equal its parent's (species match,
    reference organism_validation.py:243-247). ``records`` — (id, <attr>).
    Edges must carry the child's attribute (same name, or
    ``child_attr_col``). NULL on either side is a pass (presence is a
    required-rule's job)."""
    child_attr = child_attr_col or attr_col
    parents = records.select(
        F.col("id").alias("__pid"), F.col(attr_col).alias("__parent_attr")
    )
    resolved = edges.join(parents, on=edges["parent_id"] == parents["__pid"], how="inner")
    bad = resolved.filter(
        F.col(child_attr).isNotNull()
        & F.col("__parent_attr").isNotNull()
        & (F.col(child_attr) != F.col("__parent_attr"))
    )
    return bad.select(
        F.col("child_id").alias("record_id"),
        F.lit(rule_id).alias("rule_id"),
        F.lit("organism").alias("field"),
        F.concat(
            F.lit("Relationships part: the specie of the child '"),
            F.col(child_attr),
            F.lit("' doesn't match the specie of the parent '"),
            F.col("__parent_attr"),
            F.lit("'"),
        ).alias("message"),
        F.lit(severity).alias("severity"),
    )


def two_cycle_violations(
    edges: DataFrame,
    rule_id: str = "rel_circular",
    severity: str = "error",
) -> DataFrame:
    """G2: A lists B as parent and B lists A ⇒ circular-relationship error
    on BOTH records (the reference flags each end as it scans it,
    organism_validator_classes.py:219-230; 2-cycles only — general cycles
    are intentionally NOT detected, matching the reference).

    One self-join of the edge table on the reversed key pair; the join key
    (parent_id, child_id) is the shuffle key, so a hot parent node skews —
    AQE skew-join splits it.
    """
    fwd = edges.select("child_id", "parent_id")
    rev = edges.select(
        F.col("child_id").alias("__r_child"), F.col("parent_id").alias("__r_parent")
    )
    cycles = fwd.join(
        rev,
        on=(F.col("parent_id") == F.col("__r_child"))
        & (F.col("child_id") == F.col("__r_parent")),
        how="inner",
    )
    return cycles.select(
        F.col("child_id").alias("record_id"),
        F.lit(rule_id).alias("rule_id"),
        F.lit("child_of").alias("field"),
        F.concat(
            F.lit("Relationships part: circular relationship detected between '"),
            F.col("child_id"),
            F.lit("' and '"),
            F.col("parent_id"),
            F.lit("'"),
        ).alias("message"),
        F.lit(severity).alias("severity"),
    )


def cardinality_violations(
    df: DataFrame,
    child_id: str,
    parents_col: str,
    max_parents: int = 2,
    rule_id: str = "rel_max_parents",
    severity: str = "error",
) -> DataFrame:
    """R12 batch variant: more than ``max_parents`` parent links is an
    error (reference ">2 parents" check, organism_validation.py:230-231).
    Narrow scan — no shuffle."""
    size = F.size(F.col(parents_col))
    bad = df.filter(F.col(parents_col).isNotNull() & (size > max_parents))
    return bad.select(
        F.col(child_id).alias("record_id"),
        F.lit(rule_id).alias("rule_id"),
        F.lit(parents_col).alias("field"),
        F.concat(
            F.lit("Relationships part: organism can have only "),
            F.lit(max_parents).cast("string"),
            F.lit(" parents, "),
            size.cast("string"),
            F.lit(" provided"),
        ).alias("message"),
        F.lit(severity).alias("severity"),
    )
