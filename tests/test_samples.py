"""Specimen / pool / cell-specimen rulesets + the cross-type relationship
pass, driven by the reference's own fixture records (sample1.json:
44 specimen_from_organism, 1 pool_of_specimens, 2 cell_specimen)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.organism import ORGANISM_SCHEMA
from faang_pydantics_validation_spark.samples import (
    CELL_SPECIMEN_SCHEMA,
    POOL_SCHEMA,
    SPECIMEN_SCHEMA,
    derived_from_edges,
    validate_sample_batches,
)

SAMPLE1 = "/root/reference/app/json_files/sample1.json"


def _flatten(rec: dict) -> dict:
    out = {k: v for k, v in rec.items() if k != "samples_core"}
    out.update(rec.get("samples_core", {}))
    return out


@pytest.fixture(scope="module")
def fixture_batches(spark):
    with open(SAMPLE1) as fh:
        data = json.load(fh)

    def df(key, schema):
        return spark.createDataFrame(
            [_flatten(r) for r in data[key]], f"struct<{schema}>"
        )

    return {
        "organism": df("organism", ORGANISM_SCHEMA),
        "specimen_from_organism": df("specimen_from_organism", SPECIMEN_SCHEMA),
        "pool_of_specimens": df("pool_of_specimens", POOL_SCHEMA),
        "cell_specimen": df("cell_specimen", CELL_SPECIMEN_SCHEMA),
    }


def test_sample1_all_types_validate_clean(spark, fixture_batches):
    """The full 58-record fixture, flattened: every record of every type
    passes its ruleset, every derived_from/child_of edge resolves to an
    allowed parent kind — zero violations end to end."""
    batches = dict(fixture_batches)
    organism = batches.pop("organism")
    verdicts, violations = validate_sample_batches(batches, organism_df=organism)
    v = verdicts.collect()
    assert len(v) == 58
    by_kind = {}
    for r in v:
        by_kind.setdefault(r.kind, []).append(r)
    assert len(by_kind["organism"]) == 11
    assert len(by_kind["specimen_from_organism"]) == 44
    assert len(by_kind["pool_of_specimens"]) == 1
    assert len(by_kind["cell_specimen"]) == 2
    assert all(r.passed for r in v)
    bad = violations.collect()
    assert bad == [], bad


def test_derived_from_dict_and_list_shapes(spark):
    """dict→[dict] normalization (organism_validator_classes.py:160-161,
    176-177): a struct-typed derived_from produces the same edge rows as
    a one-element array."""
    as_dict = spark.createDataFrame(
        [({"sample_name": {"value": "C1"}}, {"value": "P1"})],
        "custom struct<sample_name: struct<value: string>>, "
        "derived_from struct<value: string>",
    )
    as_list = spark.createDataFrame(
        [({"sample_name": {"value": "C1"}}, [{"value": "P1"}])],
        "custom struct<sample_name: struct<value: string>>, "
        "derived_from array<struct<value: string>>",
    )
    e1 = derived_from_edges(as_dict, "cell_specimen").collect()
    e2 = derived_from_edges(as_list, "cell_specimen").collect()
    assert [(r.child_id, r.parent_id, r.kind) for r in e1] == [
        ("C1", "P1", "cell_specimen")
    ]
    assert e1 == e2
    # null derived_from → no edge (not a crash)
    no_df = spark.createDataFrame(
        [({"sample_name": {"value": "C2"}}, None)],
        "custom struct<sample_name: struct<value: string>>, "
        "derived_from struct<value: string>",
    )
    assert derived_from_edges(no_df, "cell_specimen").count() == 0


def _mini_batches(spark, fixture_batches, cell_parent="ECA_UKY_S39"):
    with open(SAMPLE1) as fh:
        data = json.load(fh)
    cells = [_flatten(r) for r in data["cell_specimen"]]
    cells[0]["derived_from"] = {"value": cell_parent}
    return {
        "specimen_from_organism": fixture_batches["specimen_from_organism"],
        "pool_of_specimens": fixture_batches["pool_of_specimens"],
        "cell_specimen": spark.createDataFrame(
            cells, f"struct<{CELL_SPECIMEN_SCHEMA}>"
        ),
    }


def test_cross_type_parent_kind_violation(spark, fixture_batches):
    """J5 across types: a cell_specimen deriving from an ORGANISM violates
    ALLOWED_RELATIONSHIPS (cell_specimen → specimen_from_organism only,
    constants.py:148), while the existence check still passes."""
    batches = _mini_batches(spark, fixture_batches, cell_parent="ECA_UKY_H1")
    verdicts, violations = validate_sample_batches(
        batches, organism_df=fixture_batches["organism"]
    )
    rel = [r for r in violations.collect() if r.rule_id == "rel_parent_kind"]
    assert len(rel) == 1
    assert rel[0].record_id == "C1" and "ECA_UKY_H1" in rel[0].message
    # relationship errors never flip the verdict (reference behavior)
    assert all(r.passed for r in verdicts.collect())


def test_cross_type_parent_missing(spark, fixture_batches):
    """J4 across types: a dangling derived_from target is reported with
    the reference's message shape."""
    batches = _mini_batches(spark, fixture_batches, cell_parent="GHOST99")
    _, violations = validate_sample_batches(
        batches, organism_df=fixture_batches["organism"]
    )
    miss = [r for r in violations.collect() if r.rule_id == "rel_parent_missing"]
    assert [(r.record_id, r.message) for r in miss] == [
        ("C1", "Relationships part: no entity 'GHOST99' found")
    ]


def test_type_rules_fire(spark):
    """Per-type layer-1/2 rules: wrong material const, bad protocol
    scheme, bad collection date, non-CL cell type, empty pool."""
    spec = spark.createDataFrame(
        [
            {
                "custom": {"sample_name": {"value": "S_BAD"}},
                "material": {"text": "organism", "term": "OBI:0100026",
                             "ontology_name": "OBI"},
                "project": {"value": "FAANG"},
                "specimen_collection_date": {"value": "05/2005",
                                             "units": "YYYY-MM"},
                "specimen_collection_protocol": {"value": "gopher://x"},
                "derived_from": {"value": "H1"},
            }
        ],
        f"struct<{SPECIMEN_SCHEMA}>",
    )
    pool = spark.createDataFrame(
        [
            {
                "custom": {"sample_name": {"value": "P_BAD"}},
                "material": {"text": "pool of specimens",
                             "term": "OBI:0302716", "ontology_name": "OBI"},
                "project": {"value": "FAANG"},
                "derived_from": [],
            }
        ],
        f"struct<{POOL_SCHEMA}>",
    )
    cell = spark.createDataFrame(
        [
            {
                "custom": {"sample_name": {"value": "C_BAD"}},
                "material": {"text": "cell specimen", "term": "OBI:0001468",
                             "ontology_name": "OBI"},
                "project": {"value": "FAANG"},
                "cell_type": [{"text": "weird", "term": "XAO:0003161",
                               "ontology_name": "XAO"}],
                "derived_from": {"value": "S_BAD"},
            }
        ],
        f"struct<{CELL_SPECIMEN_SCHEMA}>",
    )
    verdicts, violations = validate_sample_batches(
        {
            "specimen_from_organism": spec,
            "pool_of_specimens": pool,
            "cell_specimen": cell,
        }
    )
    by_rule = {}
    for r in violations.collect():
        by_rule.setdefault(r.rule_id, []).append(r.record_id)
    assert by_rule["spec_material_text_const"] == ["S_BAD"]
    assert by_rule["spec_collection_date_format"] == ["S_BAD"]
    assert by_rule["spec_protocol_uri"] == ["S_BAD"]
    assert by_rule["pool_derived_from_cardinality"] == ["P_BAD"]
    assert by_rule["cell_type_prefix"] == ["C_BAD"]
    # S_BAD parent H1 dangles (no organism batch supplied)
    assert by_rule["rel_parent_missing"] == ["S_BAD"]
    v = {r.record_id: r.passed for r in verdicts.collect()}
    assert not v["S_BAD"] and not v["P_BAD"]
    # C_BAD's only error is layer-2 (cell_type prefix) → still invalid
    assert not v["C_BAD"]
