"""Regression tests for the column-form verdicts fast path
(runner._build_verdicts) — cases found by review after the r2
restructure."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.dims import DimensionRegistry
from faang_pydantics_validation_spark.fixtures import values_df
from faang_pydantics_validation_spark.rules import Rule, RuleSet
from faang_pydantics_validation_spark.runner import run_validation


def test_null_key_rows_are_not_duplicates(spark):
    """NULL-key rows must NOT count as a duplicate group: the window
    partitions NULLs together, but the violations frame's key join is
    null-unsafe — verdicts and violations must agree."""
    df = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "k1"), ("d", "k1"), ("e", "k2")],
        "id string, commit string",
    )
    rs = RuleSet(
        name="t",
        rules=(
            Rule("u", "commit", "unique", params={"keys": ["commit"]}),
        ),
    )
    out = run_validation(df, rs, record_id="id", sha_col=None)
    v = {r.record_id: r for r in out.verdicts.collect()}
    assert v["a"].passed and v["b"].passed  # NULL keys pass
    assert not v["c"].passed and not v["d"].passed  # real duplicates fail
    assert v["e"].passed
    viol_ids = sorted(r.record_id for r in out.violations.collect())
    assert viol_ids == ["c", "d"]
    # verdict error total == violations error rows (consistency)
    assert sum(r.n_errors for r in v.values()) == len(viol_ids)


def test_nested_ref_field_fast_path(spark):
    """Dotted ref fields ('organism.term' — the documented J1 shape)
    must survive the carry projection: a select of a nested path renames
    the column to its leaf."""
    df = spark.createDataFrame(
        [("r1", {"term": "NCBITaxon:9913"}), ("r2", {"term": "BAD:1"}),
         ("r3", None)],
        "id string, organism struct<term: string>",
    )
    dims = DimensionRegistry()
    dims.register(
        "terms", values_df(spark, [("NCBITaxon:9913",)], "term"),
        strategy="broadcast",
    )
    rs = RuleSet(
        name="t",
        rules=(
            Rule("ref_term", "organism.term", "ref",
                 params={"dim": "terms", "dim_key": "term"}),
        ),
    )
    out = run_validation(df, rs, record_id="id", dims=dims, sha_col=None)
    v = {r.record_id: r.passed for r in out.verdicts.collect()}
    assert v == {"r1": True, "r2": False, "r3": True}


def test_two_nested_fields_sharing_leaf_name(spark):
    """Two carried nested fields with the same leaf name must not
    collide (both aliased opaquely)."""
    df = spark.createDataFrame(
        [("r1", {"term": "A"}, {"term": "X"}),
         ("r2", {"term": "B"}, {"term": "Y"})],
        "id string, organism struct<term: string>, sex struct<term: string>",
    )
    dims = DimensionRegistry()
    dims.register("o", values_df(spark, [("A",)], "term"), strategy="broadcast")
    dims.register("s", values_df(spark, [("X",)], "term"), strategy="broadcast")
    rs = RuleSet(
        name="t",
        rules=(
            Rule("ro", "organism.term", "ref", params={"dim": "o", "dim_key": "term"}),
            Rule("rs", "sex.term", "ref", params={"dim": "s", "dim_key": "term"}),
        ),
    )
    out = run_validation(df, rs, record_id="id", dims=dims, sha_col=None)
    v = {r.record_id: r.n_errors for r in out.verdicts.collect()}
    assert v == {"r1": 0, "r2": 2}


def test_pool_missing_derived_from_fails(spark):
    from faang_pydantics_validation_spark.samples import (
        POOL_SCHEMA,
        validate_sample_batches,
    )

    pool = spark.createDataFrame(
        [
            {
                "custom": {"sample_name": {"value": "P_NODF"}},
                "material": {"text": "pool of specimens",
                             "term": "OBI:0302716", "ontology_name": "OBI"},
                "project": {"value": "FAANG"},
            }
        ],
        f"struct<{POOL_SCHEMA}>",
    )
    verdicts, violations = validate_sample_batches({"pool_of_specimens": pool})
    assert not verdicts.collect()[0].passed
    assert "pool_derived_from_required" in {
        r.rule_id for r in violations.collect()
    }


def test_json_importer_array_top_level_required():
    from faang_pydantics_validation_spark.json_schema import (
        rules_from_json_schema,
    )

    doc = {
        "type": "object",
        "required": ["tags"],
        "properties": {
            "tags": {
                "type": "array",
                "items": {"type": "object",
                          "properties": {"value": {"type": "string"}}},
            }
        },
    }
    rules = {r.rule_id: r for r in rules_from_json_schema(doc, id_prefix="t")}
    assert rules["t_tags_required"].kind == "required"
    assert rules["t_tags_required"].field == "tags"
