"""G1/G2/J4/J5 over the edges fixture — every case in FIXTURES.md §3 with
hand-derived expected violations (reference: organism_validation.py:211-265,
organism_validator_classes.py:144-230)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark import fixtures
from faang_pydantics_validation_spark.checks.relationships import (
    attribute_match_violations,
    cardinality_violations,
    explode_edges,
    parent_existence_violations,
    two_cycle_violations,
    allowed_parent_violations,
)


def _edges(spark):
    df = fixtures.edges_fixture(spark)
    return df, explode_edges(df, "child_id", "parent_ids", keep=("species",))


def test_explode_skips_sentinel(spark):
    df, edges = _edges(spark)
    parents = {r.parent_id for r in edges.collect()}
    assert "restricted access" not in parents  # ORG8's link skipped
    # ORG7 contributes 3 edges (the >2-parent case still resolves)
    assert edges.filter(F.col("child_id") == "ORG7").count() == 3


def test_parent_existence(spark):
    df, edges = _edges(spark)
    batch_ids = df.select(F.col("child_id").alias("id"))
    ext = fixtures.known_parents_dim(spark).select("id")
    viols = parent_existence_violations(edges, batch_ids, ext).collect()
    assert [(v.record_id, v.severity) for v in viols] == [("ORG3", "error")]
    assert "ORG_MISSING" in viols[0].message
    # without the external dim, ORG9's SAM parent also dangles
    viols2 = parent_existence_violations(edges, batch_ids, None)
    assert {v.record_id for v in viols2.collect()} == {"ORG3", "ORG9"}


def test_species_match(spark):
    df, edges = _edges(spark)
    records = df.select(F.col("child_id").alias("id"), F.col("species"))
    out = attribute_match_violations(edges, records, "species").collect()
    # ORG4 (Gallus gallus) child of ORG2 (Bos taurus), and ORG7 (Bos
    # taurus) listing ORG4 among its parents — both edges mismatch
    assert {v.record_id for v in out} == {"ORG4", "ORG7"}
    org4 = [v for v in out if v.record_id == "ORG4"][0]
    assert "Gallus gallus" in org4.message and "Bos taurus" in org4.message


def test_two_cycles(spark):
    df, edges = _edges(spark)
    out = two_cycle_violations(edges).collect()
    # ORG5<->ORG6: both ends flagged, exactly once each (2-cycles only)
    assert sorted(v.record_id for v in out) == ["ORG5", "ORG6"]


def test_cardinality(spark):
    df, _ = _edges(spark)
    out = cardinality_violations(df, "child_id", "parent_ids", max_parents=2).collect()
    assert [v.record_id for v in out] == ["ORG7"]
    assert "3 provided" in out[0].message


def test_allowed_parent_kinds(spark):
    spark_df = fixtures.edges_fixture(spark)
    edges = explode_edges(spark_df, "child_id", "parent_ids").withColumn(
        "kind", F.lit("cell_specimen")
    )
    records = spark_df.select(
        F.col("child_id").alias("id"), F.lit("organism").alias("kind")
    )
    allowed = fixtures.allowed_relationships_dim(spark).withColumnRenamed(
        "child_kind", "child_kind"
    ).withColumnRenamed("parent_kind", "parent_kind")
    out = allowed_parent_violations(edges, records, allowed, rule_id="j5")
    # cell_specimen may only hang off specimen_from_organism; every
    # resolvable parent here is an 'organism' ⇒ all flagged
    resolvable = edges.join(records, edges["parent_id"] == records["id"]).count()
    assert out.count() == resolvable
