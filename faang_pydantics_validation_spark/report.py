"""Report + export layer — A3/A4 and P1-P3 from SURVEY.md §2.5-2.6.

The heavy lifting (ordering, grouping, reshaping) is DataFrame work; only
the final human-readable rendering collects — and it collects the already
reduced violation rows, never the input table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PURL_PREFIX = "http://purl.obolibrary.org/obo/"


def purl(term_col) -> F.Column:
    """P1: ontology term → PURL URL (reference organism_validation.py:274:
    ``"http://purl.obolibrary.org/obo/" + term.replace(':', '_')``)."""
    return F.concat(F.lit(PURL_PREFIX), F.translate(term_col, ":", "_"))


def ordered_violations(violations: DataFrame) -> DataFrame:
    """A3: deterministic report ordering — record, then field, then rule
    (reference iterates insertion order of field_errors,
    organism_validation.py:310-345; we pin a total order)."""
    return violations.orderBy("record_id", "field", "rule_id", "message")


def rule_stats(violations: DataFrame, total_rows: int | None = None) -> DataFrame:
    """Per-rule selectivity in ONE shuffle:
    (rule_id, severity, n_violations, n_records[, violation_rate]).

    The operational question a ruleset owner asks after every run —
    which rules fire, how often, over how many distinct records — as a
    single partial+final agg over the violations frame (distinct records
    via HLL, so hot rules don't shuffle their record ids). Pass
    ``total_rows`` to add the per-row firing rate."""
    out = violations.groupBy("rule_id", "severity").agg(
        F.count(F.lit(1)).alias("n_violations"),
        F.approx_count_distinct("record_id").alias("n_records"),
    )
    if total_rows:
        out = out.withColumn(
            "violation_rate",
            F.round(F.col("n_violations") / F.lit(float(total_rows)), 6),
        )
    return out.orderBy(F.desc("n_violations"), "rule_id")


def validation_report(
    violations: DataFrame, verdicts: DataFrame, max_records: int = 1000
) -> str:
    """Render the reference-shaped plain-text report
    (organism_validation.py:310-345): summary counters, then invalid
    records with their field errors, then a warnings section.

    Driver-side collect happens AFTER the reduction to violation rows and
    is capped at ``max_records`` — a report over 10^12 rows collects only
    the (bounded) broken subset.
    """
    summary = verdicts.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("passed").cast("int")).alias("valid"),
        F.sum((~F.col("passed")).cast("int")).alias("invalid"),
        F.sum((F.col("passed") & (F.col("n_warnings") > 0)).cast("int")).alias(
            "warnings"
        ),
    ).collect()[0]

    rows = (
        ordered_violations(violations)
        .limit(max_records * 8)
        .collect()
    )

    lines = [
        "=" * 60,
        "VALIDATION REPORT",
        "=" * 60,
        f"Total records: {summary.total}",
        f"Valid records: {summary.valid}",
        f"Invalid records: {summary.invalid}",
        f"Records with warnings: {summary.warnings}",
        "",
    ]
    errors = [r for r in rows if r.severity == "error"]
    warns = [r for r in rows if r.severity == "warning"]
    if errors:
        lines.append("ERRORS:")
        current = None
        for r in errors:
            if r.record_id != current:
                current = r.record_id
                lines.append(f"  Record '{r.record_id}':")
            lines.append(f"    - {r.field}: {r.message}")
        lines.append("")
    if warns:
        lines.append("WARNINGS:")
        current = None
        for r in warns:
            if r.record_id != current:
                current = r.record_id
                lines.append(f"  Record '{r.record_id}':")
            lines.append(f"    - {r.field}: {r.message}")
        lines.append("")
    status = "Fix issues" if summary.invalid and summary.invalid > 0 else "Ready for submission"
    lines.append(f"Submission status: {status}")
    return "\n".join(lines)


def export_biosample_format(
    df: DataFrame,
    name_col: str = "record_id",
    material_text: str = "material.text",
    material_term: str = "material.term",
    organism_text: str = "organism.text",
    organism_term: str = "organism.term",
    sex_text: str | None = None,
    sex_term: str | None = None,
    birth_date_value: str | None = None,
    birth_date_units: str | None = None,
    breed_text: str | None = None,
    breed_term: str | None = None,
    parents_col: str | None = "child_of",
) -> DataFrame:
    """P2+P3: reshape flat validated records into the BioSamples submission
    shape (reference export_organism_to_biosample_format,
    organism_validation.py:267-307):

    * characteristics.material / organism / sex — always emitted, each an
      array of one {text, ontologyTerms:[PURL]} struct (:272-284);
    * characteristics.`birth date` — CONDITIONAL on the attribute being
      present; {text: value, unit: units}, NO ontologyTerms (:286-290);
    * characteristics.breed — conditional, with ontologyTerms (:292-296);
    * relationships — conditional list of {type: 'child of', target}
      (:298-305).

    The reference omits dict keys for absent attributes; a DataFrame
    struct has a fixed schema, so conditional emission maps to a NULL
    field value (`to_json` then drops nulls, reproducing the dict shape
    byte-for-byte — see tests/test_report_export.py).

    Pure projection — narrow, zero shuffle. Optional columns default to
    None so non-organism tables can export the minimal shape.
    """
    def char(text_col: str, term_col: str):
        return F.array(
            F.struct(
                F.col(text_col).alias("text"),
                F.array(purl(F.col(term_col))).alias("ontologyTerms"),
            )
        )

    characteristics = [
        char(material_text, material_term).alias("material"),
        char(organism_text, organism_term).alias("organism"),
    ]
    if sex_text is not None and sex_term is not None:
        characteristics.append(char(sex_text, sex_term).alias("sex"))
    if birth_date_value is not None and birth_date_units is not None:
        characteristics.append(
            F.when(
                F.col(birth_date_value).isNotNull(),
                F.array(
                    F.struct(
                        F.col(birth_date_value).alias("text"),
                        F.col(birth_date_units).alias("unit"),
                    )
                ),
            ).alias("birth date")
        )
    if breed_text is not None and breed_term is not None:
        characteristics.append(
            F.when(
                F.col(breed_term).isNotNull(), char(breed_text, breed_term)
            ).alias("breed")
        )

    cols = [
        F.col(name_col).alias("name"),
        F.struct(*characteristics).alias("characteristics"),
    ]
    if parents_col is not None:
        dt = dict(df.dtypes).get(parents_col, "")
        elem = (lambda x: x["value"]) if dt.startswith("array<struct") else (lambda x: x)
        cols.append(
            F.when(
                F.col(parents_col).isNotNull() & (F.size(parents_col) > 0),
                F.transform(
                    F.col(parents_col),
                    lambda x: F.struct(
                        F.lit("child of").alias("type"), elem(x).alias("target")
                    ),
                ),
            ).alias("relationships")
        )
    return df.select(*cols)


def export_organism_batch(df: DataFrame, name_col: str = "record_id") -> DataFrame:
    """The full organism export — every characteristic the reference
    emits (organism_validation.py:267-307) wired to ORGANISM_SCHEMA
    paths."""
    return export_biosample_format(
        df,
        name_col=name_col,
        sex_text="sex.text",
        sex_term="sex.term",
        birth_date_value="birth_date.value",
        birth_date_units="birth_date.units",
        breed_text="breed.text",
        breed_term="breed.term",
    )
