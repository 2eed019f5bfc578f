"""The reference's organism ruleset, re-expressed in this engine's rule IR.

This is the domain-parity layer: a user of
yroochun/faang-pydantics-validation validates FAANG organism submissions;
this module gives the same rules over a DataFrame of organism records so
that user can switch engines. Every rule cites the reference lines it
mirrors (rulesets: /root/reference/app/rulesets_pydantics/
organism_ruleset.py + standard_ruleset.py; post-parse checks:
app/organism_validation.py:86-129; severity tiers: the `mandatory`
annotations in app/rulesets-json/faang_samples_organism.metadata_rules.json).

Record shape (SURVEY.md §1.2): every attribute is a micro-struct —
{value}, {value, units} or {text, term, ontology_name} — arrays for
health_status/child_of, and the record id lives at
custom.sample_name.value (organism_ruleset.py:204-209).

Layering matches the reference lifecycle (organism_validation.py:19-84):
layer 1 = the Pydantic-parse analog (types, enums, formats, cardinality);
layer 2 = the post-parse layers (recommended-field warnings + ontology
prefix checks), which the reference only runs when the parse succeeded
(:46 short-circuit) — our engine gates layer 2 on zero layer-1 errors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.rules import Rule, RuleSet, SENTINELS

#: DDL schema for one organism record (explicit — never inferSchema).
#: Core-metadata fields mirror SampleCoreMetadata flattened by inheritance
#: (standard_ruleset.py:99-131, organism_ruleset.py:212).
ORGANISM_SCHEMA = """
    describedBy string,
    sample_description struct<value: string>,
    same_as struct<value: string>,
    alias struct<value: string>,
    custom struct<sample_name: struct<value: string>,
                  biosample_id: struct<value: string>>,
    material struct<text: string, term: string, ontology_name: string>,
    project struct<value: string>,
    secondary_project array<struct<value: string>>,
    organism struct<text: string, term: string, ontology_name: string>,
    sex struct<text: string, term: string, ontology_name: string>,
    birth_date struct<value: string, units: string>,
    breed struct<text: string, term: string, ontology_name: string>,
    health_status array<struct<text: string, term: string, ontology_name: string>>,
    diet struct<value: string>,
    birth_location struct<value: string>,
    birth_location_latitude struct<value: string, units: string>,
    birth_location_longitude struct<value: string, units: string>,
    birth_weight struct<value: string, units: string>,
    placental_weight struct<value: string, units: string>,
    pregnancy_length struct<value: string, units: string>,
    delivery_timing struct<value: string>,
    delivery_ease struct<value: string>,
    pedigree struct<value: string>,
    child_of array<struct<value: string>>,
    availability struct<value: string>
"""

#: top-level attributes the closed schema allows (Config.extra="forbid",
#: organism_ruleset.py:246-247): the model's own fields + inherited core
#: fields. A record nesting its core block under `samples_core` (the
#: sample1.json fixture shape) therefore fails with 'extra fields not
#: permitted' on samples_core — exactly the reference's parse behavior.
#: `alias` is deliberately ABSENT: the Pydantic model has no alias field,
#: so an alias-bearing record fails parse as an extra field — yet the id
#: resolver still reads it (organism_validator_classes.py:241-242), which
#: is why ORGANISM_SCHEMA carries the column anyway.
ORGANISM_KNOWN_FIELDS = (
    "describedBy",
    "sample_description",
    "same_as",
    "custom",
    "material",
    "project",
    "secondary_project",
    "organism",
    "sex",
    "birth_date",
    "breed",
    "health_status",
    "diet",
    "birth_location",
    "birth_location_latitude",
    "birth_location_longitude",
    "birth_weight",
    "placental_weight",
    "pregnancy_length",
    "delivery_timing",
    "delivery_ease",
    "pedigree",
    "child_of",
    "availability",
)

#: Material text enum — standard_ruleset.py:10-20
MATERIAL_TEXTS = (
    "organism",
    "specimen from organism",
    "cell specimen",
    "single cell specimen",
    "pool of specimens",
    "cell culture",
    "cell line",
    "restricted access",
)

#: material text → expected OBI/CLO term — the text↔term consistency map
#: (standard_ruleset.py:41-62, mapping dict at 46-56); public ontology ids
MATERIAL_TEXT_TERM = {
    "organism": "OBI:0100026",
    "specimen from organism": "OBI:0001479",
    "cell specimen": "OBI:0001468",
    "single cell specimen": "OBI:0002127",
    "pool of specimens": "OBI:0302716",
    "cell culture": "OBI:0001876",
    "cell line": "CLO:0000031",
}

#: closed unit enums — organism_ruleset.py:8-27
DATE_UNITS = ("YYYY-MM-DD", "YYYY-MM", "YYYY")
WEIGHT_UNITS = ("grams", "kilograms")
TIME_UNITS = ("days", "weeks", "months", "day", "week", "month", "years")

#: delivery enums — organism_ruleset.py:29-39
DELIVERY_TIMING = (
    "early parturition",
    "full-term parturition",
    "delayed parturition",
)
DELIVERY_EASE = (
    "normal autonomous delivery",
    "c-section",
    "veterinarian assisted",
)

#: birth_date format — organism_ruleset.py:95-105 (pattern at 99), with
#: the missing-value sentinels legal (:96-97). EXACT reference parity,
#: quirk included: the reference evaluates its pattern with ``re.match``
#: (prefix match; ``$`` binds only to the last alternation branch), so it
#: ACCEPTS e.g. "2020-01-99" via a prefix match on the YYYY-MM branch.
#: rlike is a contains-match, so the re.match-equivalent wraps the
#: alternation in ``^(?:...)`` (see json_schema.re_match_pattern) —
#: pinned by tests/test_organism.py::test_birth_date_reference_parity.
BIRTH_DATE_PATTERN = (
    r"^(?:[12]\d{3}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
    r"|[12]\d{3}-(0[1-9]|1[0-2])"
    r"|[12]\d{3}$)"
)


def organism_schema_paths() -> set[str]:
    """All resolvable dotted paths of ORGANISM_SCHEMA (for the JSON-Schema
    importer's availability filter)."""
    from pyspark.sql.types import StructType

    from faang_pydantics_validation_spark.json_schema import schema_field_paths

    return schema_field_paths(StructType.fromDDL(ORGANISM_SCHEMA))


def organism_ruleset_from_json(path: str) -> RuleSet:
    """Load the reference's ACTUAL declarative ruleset file
    (``faang_samples_organism.metadata_rules.json`` — or the core file)
    into this engine's IR, restricted to the attributes ORGANISM_SCHEMA
    carries. The behavioral-equivalence contract against the hand-written
    :func:`organism_ruleset` is pinned by
    tests/test_json_schema.py::test_organism_json_equivalence — identical
    per-record verdicts and violating (record, field, severity) sets on
    the golden batch, modulo the documented JSON-is-richer deltas."""
    from faang_pydantics_validation_spark.json_schema import (
        ruleset_from_json_schema,
    )

    return ruleset_from_json_schema(
        path,
        name="faang_organism_json",
        id_prefix="js_org",
        available=organism_schema_paths(),
        known_fields=ORGANISM_KNOWN_FIELDS,
    )


def organism_record_id(
    action: str = "new", index_col: str | None = None
) -> Column:
    """R13 id resolution — full reference fallback chain.

    Two resolvers exist in the reference and both are mirrored here:

    * ``get_organism_identifier`` (organism_validator_classes.py:237-245):
      ``custom.sample_name.value`` — or ``custom.biosample_id.value`` when
      ``action='update'`` (:238) — else ``alias.value`` when the alias
      struct is present (else 'unknown' for a value-less alias, :241-242),
      else 'unknown' (:244).
    * the batch loop's positional default
      (organism_validation.py:168): ``custom.sample_name.value`` else
      ``organism_{i}``. Positional order is undefined on a distributed
      table, so the ordinal is caller-supplied: pass ``index_col`` naming
      an integer column and that branch is used INSTEAD of the
      alias/unknown chain (matching the loop, which never consults alias).
    """
    col_name = "biosample_id" if action == "update" else "sample_name"
    if index_col is not None:
        return F.coalesce(
            F.col(f"custom.{col_name}.value"),
            F.concat(F.lit("organism_"), F.col(index_col).cast("string")),
        )
    candidate = F.col(f"custom.{col_name}")
    # The outer coalesce also normalizes a present-but-value-less struct
    # ({"sample_name": {"value": null}}) to 'unknown': the reference
    # returns the raw None there (:240), but a NULL record id would be
    # silently dropped by the relationship joins / groupBys downstream,
    # so the engine pins every record to a non-null key.
    return F.coalesce(
        F.when(candidate.isNotNull(), candidate["value"]).when(
            F.col("alias").isNotNull(), F.col("alias.value")
        ),
        F.lit("unknown"),
    )


def validate_organism_batch(
    df, external_parents=None, ruleset=None, action="new", index_col=None
):
    """Full lifecycle — the analog of
    ``PydanticValidator.validate_with_pydantic``
    (organism_validation.py:150-209):

    1. fused per-record pass (layers 1-2, short-circuit preserved);
    2. batch relationship pass over VALID records only (:194-198):
       parent existence (J4), species match (G1), 2-cycles (G2);
    3. relationship errors attach to the violations output but do NOT
       flip the per-record verdict — exactly the reference's behavior
       (:200-207, errors appended to already-valid records).

    ``ruleset`` — defaults to the hand-written :func:`organism_ruleset`;
    pass :func:`organism_ruleset_from_json`'s result to run the
    reference's declarative file through the same lifecycle.
    ``action`` / ``index_col`` parameterize R13 id resolution — see
    :func:`organism_record_id`.

    Returns (verdicts_df, violations_df).
    """
    from faang_pydantics_validation_spark.checks.relationships import (
        attribute_match_violations,
        explode_edges,
        parent_existence_violations,
        two_cycle_violations,
    )
    from faang_pydantics_validation_spark.engine import ValidationEngine

    out = ValidationEngine(ruleset or organism_ruleset()).validate(
        df, record_id=organism_record_id(action=action, index_col=index_col)
    )
    valid = out.annotated.filter(F.col("passed"))
    edges = explode_edges(
        valid.withColumn("species", F.col("organism.text")),
        "record_id",
        "child_of",
        keep=("species",),
    )
    batch_ids = out.annotated.select(F.col("record_id").alias("id"))
    records = valid.select(
        F.col("record_id").alias("id"), F.col("organism.text").alias("species")
    )
    rel = (
        parent_existence_violations(
            edges, batch_ids, external_parents, rule_id="org_parent_missing"
        )
        .unionByName(
            attribute_match_violations(
                edges, records, "species", rule_id="org_species_mismatch"
            )
        )
        .unionByName(two_cycle_violations(edges, rule_id="org_circular"))
    )
    violations = out.violations().unionByName(rel)
    return out.verdicts(), violations


def organism_ruleset() -> RuleSet:
    """The full organism constraint set as declarative IR."""
    rules: list[Rule] = [
        # ----- required core fields (standard_ruleset.py:101-102,
        # organism_ruleset.py:214-215; JSON "required" lists) -----
        Rule("org_material_required", "material.text", "required", tier="mandatory"),
        Rule("org_project_required", "project.value", "required", tier="mandatory"),
        Rule("org_organism_required", "organism.term", "required", tier="mandatory"),
        Rule("org_sex_required", "sex.term", "required", tier="mandatory"),
        Rule(
            "org_sample_name_required",
            "custom.sample_name.value",
            "required",
            tier="mandatory",
        ),
        # ----- consts (standard_ruleset.py:66 project == FAANG) -----
        Rule(
            "org_project_const",
            "project.value",
            "const",
            params={"value": "FAANG"},
            message="unexpected value; permitted: 'FAANG'",
        ),
        # ----- enums -----
        Rule(
            "org_material_text_enum",
            "material.text",
            "enum",
            params={"values": list(MATERIAL_TEXTS)},
        ),
        Rule(
            "org_birth_date_units",
            "birth_date.units",
            "enum",
            params={"values": list(DATE_UNITS)},
        ),
        Rule(
            "org_birth_weight_units",
            "birth_weight.units",
            "enum",
            params={"values": list(WEIGHT_UNITS)},
        ),
        Rule(
            "org_pregnancy_length_units",
            "pregnancy_length.units",
            "enum",
            params={"values": list(TIME_UNITS)},
        ),
        Rule(
            "org_delivery_timing_enum",
            "delivery_timing.value",
            "enum",
            params={"values": list(DELIVERY_TIMING)},
        ),
        Rule(
            "org_delivery_ease_enum",
            "delivery_ease.value",
            "enum",
            params={"values": list(DELIVERY_EASE)},
        ),
        # ----- formats -----
        Rule(
            "org_birth_date_format",
            "birth_date.value",
            "regex",
            params={
                "pattern": BIRTH_DATE_PATTERN,
                "sentinels": list(SENTINELS),
            },
            message="Invalid date format: '{value}'",
        ),
        Rule(
            "org_pedigree_uri",
            "pedigree.value",
            "uri",
            params={"schemes": ["http", "https", "ftp"]},
        ),
        Rule(
            "org_availability_uri",
            "availability.value",
            "uri",
            params={"schemes": ["http", "https", "mailto"]},
        ),
        # ----- numeric value checks (organism_ruleset.py:163-185) -----
        Rule("org_latitude_numeric", "birth_location_latitude.value", "numeric"),
        Rule("org_longitude_numeric", "birth_location_longitude.value", "numeric"),
        Rule("org_birth_weight_numeric", "birth_weight.value", "numeric"),
        Rule("org_pregnancy_length_numeric", "pregnancy_length.value", "numeric"),
        Rule(
            "org_latitude_range",
            "birth_location_latitude.value",
            "range",
            params={"min": -90.0, "max": 90.0},
        ),
        Rule(
            "org_longitude_range",
            "birth_location_longitude.value",
            "range",
            params={"min": -180.0, "max": 180.0},
        ),
        # ----- cross-field: material text must map to its term
        # (standard_ruleset.py:41-62) -----
        Rule(
            "org_material_term_map",
            "material.term",
            "cross_field_map",
            params={"key_field": "material.text", "mapping": MATERIAL_TEXT_TERM},
            message="Term '{value}' does not match material.text",
        ),
        # ----- cardinality: 1..2 parents (organism_ruleset.py:241;
        # explicit >2 error organism_validation.py:230-231) -----
        Rule(
            "org_child_of_cardinality",
            "child_of",
            "cardinality",
            params={"min": 1, "max": 2},
            message="Organism can have at most 2 parents",
        ),
        # ----- layer 2: recommended-field warnings
        # (organism_validation.py:71-77) -----
        Rule(
            "org_birth_date_recommended",
            "birth_date.value",
            "recommended",
            severity="warning",
            tier="recommended",
            layer=2,
        ),
        Rule(
            "org_breed_recommended",
            "breed.term",
            "recommended",
            severity="warning",
            tier="recommended",
            layer=2,
        ),
        Rule(
            "org_health_status_recommended",
            "health_status",
            "recommended",
            severity="warning",
            tier="recommended",
            layer=2,
        ),
        # ----- layer 2: ontology prefix checks
        # (organism_validation.py:89-95, 121-127) -----
        Rule(
            "org_organism_prefix",
            "organism.term",
            "prefix",
            params={"prefixes": ["NCBITaxon:"], "sentinels": list(SENTINELS)},
            message="Organism term '{value}' should be from NCBITaxon ontology",
            layer=2,
        ),
        Rule(
            "org_sex_prefix",
            "sex.term",
            "prefix",
            params={"prefixes": ["PATO:"], "sentinels": list(SENTINELS)},
            message="Sex term '{value}' should be from PATO ontology",
            layer=2,
        ),
        Rule(
            "org_health_status_prefix",
            "health_status",
            "forall_prefix",
            params={
                "subfield": "term",
                "prefixes": ["PATO:", "EFO:"],
                "sentinels": list(SENTINELS),
            },
            message="health_status[{i}] term '{v}' should be from PATO or EFO ontology",
            layer=2,
        ),
    ]
    return RuleSet(
        name="faang_organism",
        rules=tuple(rules),
        known_fields=ORGANISM_KNOWN_FIELDS,
    )
