"""Golden e2e against the reference's full-size fixture.

`/root/reference/app/json_files/sample1.json` (2779 lines) is the
reference's only full-size correctness artifact: 11 organisms, 44
specimens, 1 pool, 2 cell specimens. This test runs the 11 organisms
through the engine exactly as the reference's validator would see them
(`data["organism"]`, organism_validation.py:766-770) and asserts the
reference-derived verdicts.

The known edge case (SURVEY §5): the fixture nests core metadata under
`samples_core`, while the Pydantic model flattens it by inheritance
(`FAANGOrganismSample(SampleCoreMetadata)`, organism_ruleset.py:212 +
standard_ruleset.py:99). Feeding the fixture records to the model as-is
therefore fails the parse on EVERY record: `samples_core` is an extra
field under Config.extra="forbid" (organism_ruleset.py:246-247) and
material/project are missing at top level. Flattening the core block the
way inheritance would, every record is valid.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.organism import (
    ORGANISM_SCHEMA,
    validate_organism_batch,
)

SAMPLE1 = "/root/reference/app/json_files/sample1.json"

#: fixture schema = organism schema + the nested core block the reference
#: model does NOT declare (hence 'extra fields not permitted')
FIXTURE_SCHEMA = (
    ORGANISM_SCHEMA
    + """,
    samples_core struct<
        sample_description: struct<value: string>,
        material: struct<text: string, term: string>,
        project: struct<value: string>>
"""
)


def _organisms() -> list[dict]:
    with open(SAMPLE1) as fh:
        return json.load(fh)["organism"]


def _flatten(rec: dict) -> dict:
    """The inheritance-flattened shape FAANGOrganismSample declares."""
    out = {k: v for k, v in rec.items() if k != "samples_core"}
    out.update(rec.get("samples_core", {}))
    return out


@pytest.fixture(scope="module")
def nested_df(spark):
    rows = _organisms()
    assert len(rows) == 11
    return spark.createDataFrame(rows, f"struct<{FIXTURE_SCHEMA}>")


@pytest.fixture(scope="module")
def flat_df(spark):
    return spark.createDataFrame(
        [_flatten(r) for r in _organisms()], f"struct<{ORGANISM_SCHEMA}>"
    )


def test_nested_records_fail_parse_like_reference(spark, nested_df):
    """As-is fixture records fail the parse layer on every record with
    exactly: extra field `samples_core` + missing material + missing
    project — the reference's FAANGOrganismSample(**data) outcome."""
    verdicts, violations = validate_organism_batch(nested_df)
    v = verdicts.collect()
    assert len(v) == 11 and all(not r.passed for r in v)

    rows = violations.collect()
    by_record: dict[str, set] = {}
    for r in rows:
        by_record.setdefault(r.record_id, set()).add((r.rule_id, r.field))
    assert set(by_record) == {f"ECA_UKY_H{i}" for i in range(1, 12)}
    for rid, got in by_record.items():
        assert got == {
            ("extra_forbidden", "samples_core"),
            ("org_material_required", "material.text"),
            ("org_project_required", "project.value"),
        }, rid
    # layer-1 failure suppresses every layer-2 rule (short-circuit):
    # no recommended-field warnings despite breed/birth_date present
    assert all(r.severity == "error" for r in rows)


def test_nested_summary_and_status(spark, nested_df):
    from faang_pydantics_validation_spark.engine import ValidationEngine
    from faang_pydantics_validation_spark.organism import (
        organism_record_id,
        organism_ruleset,
    )

    out = ValidationEngine(organism_ruleset()).validate(
        nested_df, record_id=organism_record_id()
    )
    s = out.summary().collect()[0]
    assert (s.total, s.valid, s.invalid, s.warnings) == (11, 0, 11, 0)
    assert out.submission_status() == "Fix issues"


def test_flattened_records_all_valid(spark, flat_df):
    """Core block flattened by inheritance: every fixture organism is a
    clean FAANG record — Thoroughbred horses with complete recommended
    fields, so zero warnings too."""
    verdicts, violations = validate_organism_batch(flat_df)
    v = verdicts.collect()
    assert len(v) == 11
    assert all(r.passed for r in v)
    assert all(r.n_warnings == 0 for r in v)
    assert violations.count() == 0


def test_flattened_spotchecks(spark, flat_df):
    """Field-level parity spot checks against the fixture contents:
    YYYY-MM birth dates pass the reference pattern; NCBITaxon/PATO/LBO
    terms pass the ontology layer; no child_of → no relationship rows."""
    first = flat_df.filter(
        F.col("custom.sample_name.value") == "ECA_UKY_H1"
    ).collect()[0]
    assert first.birth_date.value == "2009-04"
    assert first.organism.term.startswith("NCBITaxon:")
    assert first.material.text == "organism"
    assert first.child_of is None
