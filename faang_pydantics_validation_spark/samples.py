"""Non-organism record types: specimen_from_organism, pool_of_specimens,
cell_specimen.

The reference ships Pydantic rulesets ONLY for organism
(`/root/reference/app/rulesets_pydantics/`), yet its golden fixture
carries 44 specimen + 1 pool + 2 cell-specimen records
(`app/json_files/sample1.json`) and its relationship matrix spans all
types (`app/constants.py:139-153` ALLOWED_RELATIONSHIPS). These rulesets
close that gap: schemas follow the fixture record shapes exactly
(core-metadata block flattened by inheritance, as for organisms), rule
kinds reuse the same IR the organism ruleset compiles through, and the
cross-type parent-kind check (J5) runs against the broadcast
ALLOWED_RELATIONSHIPS dimension.

``derived_from`` normalization: the reference accepts BOTH a single
{value} dict and a list of them, normalizing dict→[dict] at
organism_validator_classes.py:160-161,176-177. Column analog:
:func:`derived_from_edges` wraps a struct-typed column into a one-element
array before exploding, so one edge frame serves both shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.organism import (
    BIRTH_DATE_PATTERN,
    DATE_UNITS,
    MATERIAL_TEXT_TERM,
    MATERIAL_TEXTS,
)
from faang_pydantics_validation_spark.rules import Rule, RuleSet, SENTINELS

#: shared core-metadata prefix (SampleCoreMetadata flattened —
#: standard_ruleset.py:99-131), identical across record types
_CORE_DDL = """
    describedBy string,
    sample_description struct<value: string>,
    same_as struct<value: string>,
    custom struct<sample_name: struct<value: string>>,
    material struct<text: string, term: string, ontology_name: string>,
    project struct<value: string>,
    secondary_project array<struct<value: string>>,
    availability struct<value: string>
"""

SPECIMEN_SCHEMA = (
    _CORE_DDL
    + """,
    specimen_collection_date struct<value: string, units: string>,
    geographic_location struct<value: string>,
    animal_age_at_collection struct<value: double, units: string>,
    developmental_stage struct<text: string, term: string, ontology_name: string>,
    health_status_at_collection array<struct<text: string, term: string, ontology_name: string>>,
    organism_part struct<text: string, term: string, ontology_name: string>,
    specimen_collection_protocol struct<value: string>,
    derived_from struct<value: string>
"""
)

POOL_SCHEMA = (
    _CORE_DDL
    + """,
    pool_creation_date struct<value: string, units: string>,
    pool_creation_protocol struct<value: string>,
    derived_from array<struct<value: string>>
"""
)

CELL_SPECIMEN_SCHEMA = (
    _CORE_DDL
    + """,
    cell_type array<struct<text: string, term: string, ontology_name: string>>,
    purification_protocol struct<value: string>,
    derived_from struct<value: string>
"""
)

_CORE_KNOWN = (
    "describedBy",
    "sample_description",
    "same_as",
    "custom",
    "material",
    "project",
    "secondary_project",
    "availability",
)

#: time-unit enum for animal_age_at_collection (fixture uses 'month')
AGE_UNITS = (
    "days", "weeks", "months", "years", "day", "week", "month", "year",
)

_PROTOCOL_SCHEMES = ["http", "https", "ftp"]


def sample_record_id() -> Column:
    """Same id resolution as organisms: custom.sample_name.value."""
    return F.coalesce(F.col("custom.sample_name.value"), F.lit("unknown"))


def _core_rules(prefix: str, material_text: str) -> list[Rule]:
    """The core-metadata rules every record type carries: required ids,
    FAANG project const, material enum + per-type const, text↔term map
    (standard_ruleset.py:10-66)."""
    return [
        Rule(f"{prefix}_material_required", "material.text", "required",
             tier="mandatory"),
        Rule(f"{prefix}_project_required", "project.value", "required",
             tier="mandatory"),
        Rule(f"{prefix}_sample_name_required", "custom.sample_name.value",
             "required", tier="mandatory"),
        Rule(f"{prefix}_project_const", "project.value", "const",
             params={"value": "FAANG"}),
        Rule(f"{prefix}_material_text_enum", "material.text", "enum",
             params={"values": list(MATERIAL_TEXTS)}),
        Rule(f"{prefix}_material_text_const", "material.text", "const",
             params={"value": material_text},
             message="material.text must be '" + material_text + "' for this record type"),
        Rule(f"{prefix}_material_term_map", "material.term", "cross_field_map",
             params={"key_field": "material.text", "mapping": MATERIAL_TEXT_TERM},
             message="Term '{value}' does not match material.text"),
    ]


def specimen_ruleset() -> RuleSet:
    """specimen_from_organism — shaped by the 44 fixture records
    (sample1.json) + the core rules; ontology prefixes follow the fixture
    vocabularies (UBERON organism parts, EFO developmental stages, PATO
    health terms)."""
    rules = _core_rules("spec", "specimen from organism") + [
        Rule("spec_derived_from_required", "derived_from.value", "required",
             tier="mandatory",
             message="specimen must reference the organism it derives from"),
        Rule("spec_collection_date_format", "specimen_collection_date.value",
             "regex",
             params={"pattern": BIRTH_DATE_PATTERN, "sentinels": list(SENTINELS)},
             message="Invalid date format: '{value}'"),
        Rule("spec_collection_date_units", "specimen_collection_date.units",
             "enum", params={"values": list(DATE_UNITS)}),
        Rule("spec_age_units", "animal_age_at_collection.units", "enum",
             params={"values": list(AGE_UNITS)}),
        Rule("spec_age_nonnegative", "animal_age_at_collection.value", "range",
             params={"min": 0.0}),
        Rule("spec_protocol_uri", "specimen_collection_protocol.value", "uri",
             params={"schemes": _PROTOCOL_SCHEMES}),
        Rule("spec_organism_part_prefix", "organism_part.term", "prefix",
             params={"prefixes": ["UBERON:", "BTO:"],
                     "sentinels": list(SENTINELS)},
             message="Organism part term '{value}' should be from UBERON or BTO",
             layer=2),
        Rule("spec_dev_stage_prefix", "developmental_stage.term", "prefix",
             params={"prefixes": ["EFO:", "HsapDv:"],
                     "sentinels": list(SENTINELS)},
             message="Developmental stage term '{value}' should be from EFO",
             layer=2),
        Rule("spec_health_prefix", "health_status_at_collection",
             "forall_prefix",
             params={"subfield": "term", "prefixes": ["PATO:", "EFO:"],
                     "sentinels": list(SENTINELS)},
             message="health_status_at_collection[{i}] term '{v}' should be from PATO or EFO ontology",
             layer=2),
    ]
    return RuleSet(
        name="faang_specimen_from_organism",
        rules=tuple(rules),
        known_fields=_CORE_KNOWN + (
            "specimen_collection_date", "geographic_location",
            "animal_age_at_collection", "developmental_stage",
            "health_status_at_collection", "organism_part",
            "specimen_collection_protocol", "derived_from",
        ),
    )


def pool_ruleset() -> RuleSet:
    """pool_of_specimens — list-shaped derived_from (≥2 members make a
    pool meaningful, but the reference accepts ≥1; we require ≥1)."""
    rules = _core_rules("pool", "pool of specimens") + [
        # cardinality passes on NULL by design (presence is `required`'s
        # job) — without this rule a pool OMITTING derived_from would
        # validate clean
        Rule("pool_derived_from_required", "derived_from", "required",
             tier="mandatory",
             message="pool must reference the specimens it was created from"),
        Rule("pool_derived_from_cardinality", "derived_from", "cardinality",
             params={"min": 1},
             message="pool must reference at least one specimen"),
        Rule("pool_derived_from_values", "derived_from", "expr",
             params={"expression":
                     "coalesce(forall(derived_from, x -> x.value IS NOT NULL), true)"},
             message="derived_from entries must carry a value"),
        Rule("pool_creation_date_format", "pool_creation_date.value", "regex",
             params={"pattern": BIRTH_DATE_PATTERN, "sentinels": list(SENTINELS)},
             message="Invalid date format: '{value}'"),
        Rule("pool_creation_date_units", "pool_creation_date.units", "enum",
             params={"values": list(DATE_UNITS)}),
        Rule("pool_protocol_uri", "pool_creation_protocol.value", "uri",
             params={"schemes": _PROTOCOL_SCHEMES}),
    ]
    return RuleSet(
        name="faang_pool_of_specimens",
        rules=tuple(rules),
        known_fields=_CORE_KNOWN + (
            "pool_creation_date", "pool_creation_protocol", "derived_from",
        ),
    )


def cell_specimen_ruleset() -> RuleSet:
    """cell_specimen — CL-ontology cell types, dict-shaped derived_from."""
    rules = _core_rules("cell", "cell specimen") + [
        Rule("cell_derived_from_required", "derived_from.value", "required",
             tier="mandatory",
             message="cell specimen must reference the specimen it derives from"),
        Rule("cell_purification_uri", "purification_protocol.value", "uri",
             params={"schemes": _PROTOCOL_SCHEMES}),
        Rule("cell_type_prefix", "cell_type", "forall_prefix",
             params={"subfield": "term", "prefixes": ["CL:"],
                     "sentinels": list(SENTINELS)},
             message="cell_type[{i}] term '{v}' should be from CL ontology",
             layer=2),
    ]
    return RuleSet(
        name="faang_cell_specimen",
        rules=tuple(rules),
        known_fields=_CORE_KNOWN + (
            "cell_type", "purification_protocol", "derived_from",
        ),
    )


SAMPLE_RULESETS = {
    "specimen_from_organism": specimen_ruleset,
    "pool_of_specimens": pool_ruleset,
    "cell_specimen": cell_specimen_ruleset,
}

SAMPLE_SCHEMAS = {
    "specimen_from_organism": SPECIMEN_SCHEMA,
    "pool_of_specimens": POOL_SCHEMA,
    "cell_specimen": CELL_SPECIMEN_SCHEMA,
}


def derived_from_edges(df: DataFrame, kind: str) -> DataFrame:
    """(child_id, parent_id, child_pos, kind) edges from ``derived_from``,
    accepting BOTH the dict shape (struct column → wrapped into a
    one-element array) and the list shape — the reference's dict→[dict]
    normalization (organism_validator_classes.py:160-161,176-177) as a
    plan-time branch instead of a per-record isinstance."""
    from faang_pydantics_validation_spark.checks.relationships import (
        explode_edges,
    )

    dt = dict(df.dtypes).get("derived_from", "")
    staged = df.withColumn("record_id", sample_record_id())
    if dt.startswith("struct"):
        staged = staged.withColumn(
            "__parents",
            F.when(
                F.col("derived_from").isNotNull(),
                F.array(F.col("derived_from")),
            ),
        )
    else:
        staged = staged.withColumn("__parents", F.col("derived_from"))
    return explode_edges(staged, "record_id", "__parents").withColumn(
        "kind", F.lit(kind)
    )


def validate_sample_batches(
    batches: dict[str, DataFrame],
    organism_df: DataFrame | None = None,
    external_parents: DataFrame | None = None,
):
    """Multi-type lifecycle: per-type fused validation, then ONE
    cross-type relationship pass.

    * J4 parent existence — every derived_from / child_of target must be
      a record in SOME batch (any type) or a known external parent;
    * J5 allowed parent kind — the resolved parent's type must be legal
      for the child's type per ALLOWED_RELATIONSHIPS
      (constants.py:139-153), checked via the broadcast pairs dim.

    Relationship errors attach to the violations output without flipping
    per-record verdicts, matching the organism lifecycle. Returns
    (verdicts_df, violations_df) over the union of all types, with a
    ``kind`` column on verdicts.
    """
    from faang_pydantics_validation_spark.checks.relationships import (
        allowed_parent_violations,
        explode_edges,
        parent_existence_violations,
    )
    from faang_pydantics_validation_spark.engine import ValidationEngine
    from faang_pydantics_validation_spark.fixtures import (
        allowed_relationships_dim,
    )
    from faang_pydantics_validation_spark.organism import (
        organism_record_id,
        organism_ruleset,
    )

    verdicts = []
    violations = []
    edge_frames = []
    id_frames = []
    spark = None

    if organism_df is not None:
        batches = {"organism": organism_df, **batches}

    for kind, df in batches.items():
        spark = df.sparkSession
        if kind == "organism":
            out = ValidationEngine(organism_ruleset()).validate(
                df, record_id=organism_record_id()
            )
            edges = explode_edges(
                out.annotated.select("record_id", "child_of"),
                "record_id",
                "child_of",
            ).withColumn("kind", F.lit("organism"))
        else:
            out = ValidationEngine(SAMPLE_RULESETS[kind]()).validate(
                df, record_id=sample_record_id()
            )
            edges = derived_from_edges(df, kind)
        verdicts.append(out.verdicts().withColumn("kind", F.lit(kind)))
        violations.append(out.violations())
        edge_frames.append(edges)
        id_frames.append(
            out.annotated.select(
                F.col("record_id").alias("id"), F.lit(kind).alias("kind")
            )
        )

    all_ids = id_frames[0]
    for f in id_frames[1:]:
        all_ids = all_ids.unionByName(f)
    all_edges = edge_frames[0]
    for f in edge_frames[1:]:
        all_edges = all_edges.unionByName(f)

    rel = parent_existence_violations(
        all_edges,
        all_ids.select("id"),
        external_parents,
        rule_id="rel_parent_missing",
    ).unionByName(
        allowed_parent_violations(
            all_edges,
            all_ids,
            allowed_relationships_dim(spark),
            child_kind_col="kind",
            rule_id="rel_parent_kind",
        )
    )

    all_verdicts = verdicts[0]
    for f in verdicts[1:]:
        all_verdicts = all_verdicts.unionByName(f)
    all_violations = violations[0]
    for f in violations[1:]:
        all_violations = all_violations.unionByName(f)
    return all_verdicts, all_violations.unionByName(rel)
