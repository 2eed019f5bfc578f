"""Golden organism-batch test — the reference-lifecycle parity check.

Each record exercises one violation class from the reference's organism
rules; expectations hand-derived from the cited reference lines
(SURVEY.md §2/§3). Mirrors the reference's own fixture strategy
(sample1.json + the inline __main__ fixture) without copying its data.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.organism import (
    ORGANISM_SCHEMA,
    organism_record_id,
    organism_ruleset,
    validate_organism_batch,
)
from faang_pydantics_validation_spark.engine import ValidationEngine


def _rec(
    name,
    material_text="organism",
    material_term="OBI:0100026",
    project="FAANG",
    organism_text="Bos taurus",
    organism_term="NCBITaxon:9913",
    sex_term="PATO:0000384",
    birth_date=("2020-01-15", "YYYY-MM-DD"),
    breed_term="LBO:0000487",
    health=(("normal", "PATO:0000461"),),
    child_of=(),
    **extra,
):
    r = {
        "custom": {"sample_name": {"value": name}},
        "material": {"text": material_text, "term": material_term, "ontology_name": "OBI"},
        "project": {"value": project},
        "organism": {"text": organism_text, "term": organism_term, "ontology_name": "NCBITaxon"},
        "sex": {"text": "male", "term": sex_term, "ontology_name": "PATO"},
        "birth_date": (
            {"value": birth_date[0], "units": birth_date[1]} if birth_date else None
        ),
        "breed": {"text": "Holstein", "term": breed_term, "ontology_name": "LBO"}
        if breed_term
        else None,
        "health_status": [
            {"text": t, "term": term, "ontology_name": term.split(":")[0]}
            for t, term in health
        ]
        if health is not None
        else None,
        "child_of": [{"value": p} for p in child_of] if child_of else None,
    }
    r.update(extra)
    return r


@pytest.fixture(scope="module")
def batch(spark):
    rows = [
        _rec("CLEAN1"),
        _rec("CLEAN2"),
        _rec("NOSEX"),  # sex.term nulled below
        _rec("BADMAT", material_text="weird material"),
        _rec("BADPROJ", project="NOT_FAANG"),
        _rec("BADDATE", birth_date=("15/01/2020", "YYYY-MM-DD")),
        _rec("SENTDATE", birth_date=("not collected", "YYYY-MM-DD")),
        _rec("BADTERMMAP", material_term="OBI:9999999"),
        _rec("BADHEALTH", health=(("odd", "FOO:123"),)),
        _rec("NOBREED", breed_term=None),
        _rec("TRIPLE", child_of=("CLEAN1", "CLEAN2", "NOBREED")),
        _rec("DANGLING", child_of=("GHOST",)),
        _rec("MISMATCH", organism_text="Gallus gallus", organism_term="NCBITaxon:9031",
             child_of=("CLEAN1",)),
        _rec("CYCA", child_of=("CYCB",)),
        _rec("CYCB", child_of=("CYCA",)),
    ]
    df = spark.createDataFrame(
        [json.loads(json.dumps(r)) for r in rows],
        f"struct<{ORGANISM_SCHEMA}>",
    )
    df = df.withColumn(
        "sex",
        F.when(
            F.col("custom.sample_name.value") == "NOSEX", F.lit(None).cast(df.schema["sex"].dataType)
        ).otherwise(F.col("sex")),
    )
    return df


def test_verdicts(spark, batch):
    verdicts, violations = validate_organism_batch(batch)
    v = {r.record_id: r for r in verdicts.collect()}
    # structural failures, plus the ontology layer's errors — in the
    # reference both feed the per-record errors list that decides validity
    # (organism_validation.py:175-191)
    for bad in (
        "NOSEX", "BADMAT", "BADPROJ", "BADDATE", "BADTERMMAP", "TRIPLE",
        "BADHEALTH",
    ):
        assert not v[bad].passed, bad
    # clean and warning-only records pass
    for ok in ("CLEAN1", "CLEAN2", "SENTDATE", "NOBREED"):
        assert v[ok].passed, ok
    # relationship errors do NOT flip the verdict
    # (organism_validation.py:200-207)
    for rel in ("DANGLING", "MISMATCH", "CYCA", "CYCB"):
        assert v[rel].passed, rel


def test_violation_rows(spark, batch):
    _, violations = validate_organism_batch(batch)
    rows = violations.collect()
    by_rule = {}
    for r in rows:
        by_rule.setdefault(r.rule_id, []).append(r)

    assert [r.record_id for r in by_rule["org_sex_required"]] == ["NOSEX"]
    assert [r.record_id for r in by_rule["org_material_text_enum"]] == ["BADMAT"]
    assert [r.record_id for r in by_rule["org_project_const"]] == ["BADPROJ"]
    assert [r.record_id for r in by_rule["org_birth_date_format"]] == ["BADDATE"]
    assert [r.record_id for r in by_rule["org_material_term_map"]] == ["BADTERMMAP"]
    assert [r.record_id for r in by_rule["org_child_of_cardinality"]] == ["TRIPLE"]
    assert [r.record_id for r in by_rule["org_parent_missing"]] == ["DANGLING"]
    assert "GHOST" in by_rule["org_parent_missing"][0].message
    assert [r.record_id for r in by_rule["org_species_mismatch"]] == ["MISMATCH"]
    assert sorted(r.record_id for r in by_rule["org_circular"]) == ["CYCA", "CYCB"]
    # health-status prefix: warning-severity per failing element with index
    bh = by_rule["org_health_status_prefix"]
    assert [r.record_id for r in bh] == ["BADHEALTH"]
    assert "FOO:123" in bh[0].message

    # sentinel date is legal for the regex (sentinels exempt) but the
    # recommended tier flags 'not collected' as a warning via sentinel
    # matrix semantics — here it simply passes the format rule
    assert all(r.record_id != "SENTDATE" for r in by_rule["org_birth_date_format"])


def test_short_circuit_suppresses_layer2(spark, batch):
    """A layer-1 failure suppresses recommended/ontology layers for that
    record (organism_validation.py:46)."""
    _, violations = validate_organism_batch(batch)
    nosex = [r for r in violations.collect() if r.record_id == "NOSEX"]
    assert {r.rule_id for r in nosex} == {"org_sex_required"}


def test_birth_date_reference_parity(spark):
    """EXACT reference parity for the birth-date pattern, quirk included:
    the reference runs its pattern under re.match (organism_ruleset.py:99-102)
    where `$` binds only to the LAST alternation branch, so "2020-01-99"
    is ACCEPTED via a prefix match on the YYYY-MM branch. Pinned per
    VERDICT r1 'What's wrong' #1."""
    import re as _re

    ref_pattern = (
        r"^[12]\d{3}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
        r"|[12]\d{3}-(0[1-9]|1[0-2])|[12]\d{3}$"
    )
    cases = [
        "2020-01-15", "2020-01", "2020", "2020-01-99", "2020-13",
        "15/01/2020", "x2020", "3020", "2020-01-15extra", "",
    ]
    rows = [_rec(f"R{i}", birth_date=(c, "YYYY-MM-DD")) for i, c in enumerate(cases)]
    df = spark.createDataFrame(
        [json.loads(json.dumps(r)) for r in rows], f"struct<{ORGANISM_SCHEMA}>"
    )
    out = ValidationEngine(organism_ruleset()).validate(
        df, record_id=organism_record_id()
    )
    got = {
        r.record_id
        for r in out.violations().collect()
        if r.rule_id == "org_birth_date_format"
    }
    expect = {
        f"R{i}" for i, c in enumerate(cases) if not _re.match(ref_pattern, c)
    }
    assert got == expect
    # the quirk case really is accepted (reference behavior, not a typo)
    assert _re.match(ref_pattern, "2020-01-99") and "R3" not in got


def test_warnings_do_not_invalidate(spark, batch):
    out = ValidationEngine(organism_ruleset()).validate(
        batch, record_id=organism_record_id()
    )
    row = {r.record_id: r for r in out.annotated.collect()}["NOBREED"]
    assert row.passed and row.n_warnings >= 1


def test_record_id_fallback_chain(spark):
    """R13 full fallback chain (organism_validator_classes.py:237-245 +
    organism_validation.py:168): sample_name → alias → 'unknown';
    biosample_id when action='update'; organism_{i} positional default."""
    rows = [
        # 1. custom.sample_name wins over alias
        {"custom": {"sample_name": {"value": "NAMED"}},
         "alias": {"value": "ALIAS0"}},
        # 2. no sample_name → alias.value
        {"alias": {"value": "ALIAS1"}},
        # 3. alias struct present but value-less → 'unknown' (:242 default)
        {"alias": {"value": None}},
        # 4. nothing at all → 'unknown'
        {},
        # 5. update-mode id lives at custom.biosample_id
        {"custom": {"sample_name": {"value": "IGNORED"},
                    "biosample_id": {"value": "SAMEA123"}}},
        # 6. sample_name struct present but value-less: the reference
        # returns the raw None WITHOUT consulting alias (:240); the
        # engine normalizes that None to 'unknown' (non-null join key)
        {"custom": {"sample_name": {"value": None}},
         "alias": {"value": "NEVER_USED"}},
    ]
    df = spark.createDataFrame(
        [{**json.loads(json.dumps(r)), "idx": i} for i, r in enumerate(rows)],
        f"struct<{ORGANISM_SCHEMA}, idx int>",
    )

    new_ids = [r.rid for r in
               df.orderBy("idx").select(organism_record_id().alias("rid")).collect()]
    assert new_ids == ["NAMED", "ALIAS1", "unknown", "unknown", "IGNORED",
                       "unknown"]

    upd_ids = [r.rid for r in
               df.orderBy("idx")
               .select(organism_record_id(action="update").alias("rid"))
               .collect()]
    # update mode: only row 5 carries biosample_id; rows 1-4 fall through
    # the same alias/unknown chain (row 1's custom has no biosample_id →
    # candidate struct null → alias)
    assert upd_ids == ["ALIAS0", "ALIAS1", "unknown", "unknown", "SAMEA123",
                       "NEVER_USED"]

    # batch-loop positional default (organism_validation.py:168): no alias
    # consultation, organism_{i} for any record without a sample_name
    pos_ids = [r.rid for r in
               df.orderBy("idx")
               .select(organism_record_id(index_col="idx").alias("rid"))
               .collect()]
    assert pos_ids == ["NAMED", "organism_1", "organism_2", "organism_3",
                       "IGNORED", "organism_5"]
