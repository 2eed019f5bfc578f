"""Full-table validation run: fused row-local pass + table-scoped checks.

The complete Spark recast of the reference's pipeline (SURVEY.md §3):

    read(schema)
      → withColumn(violations)            # fused rule kernel, no shuffle
      → dim joins (ref rules)             # broadcast → no shuffle
      → salted uniqueness (unique rules)  # 1 shuffle (two-stage agg)
      → per-record verdict merge          # 1 shuffle (agg + join)
      → summary agg                       # AQE-coalesced

Total wide stages: 2-3 regardless of rule count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.checks.uniqueness import uniqueness_violations
from faang_pydantics_validation_spark.dims import (
    DimensionRegistry,
    membership_violations,
)
from faang_pydantics_validation_spark.engine import ValidationEngine
from faang_pydantics_validation_spark.rules import RuleSet

VIOLATIONS_SCHEMA = (
    "record_id string, rule_id string, field string, message string, severity string"
)


@dataclass
class FullValidationOutput:
    violations: DataFrame  # (record_id, rule_id, field, message, severity)
    verdicts: DataFrame  # (record_id, passed, n_errors, n_warnings[, content_sha256])

    def summary(self) -> DataFrame:
        return self.verdicts.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("passed").cast("int")).alias("valid"),
            F.sum((~F.col("passed")).cast("int")).alias("invalid"),
            F.sum(
                (F.col("passed") & (F.col("n_warnings") > 0)).cast("int")
            ).alias("warnings"),
        )

    def submission_status(self) -> str:
        has_error = (
            self.verdicts.filter(F.col("n_errors") > 0).limit(1).count() > 0
        )
        return "Fix issues" if has_error else "Ready for submission"


def run_validation(
    df: DataFrame,
    ruleset: RuleSet,
    record_id: Column | str,
    dims: DimensionRegistry | None = None,
    sha_col: str | None = "content",
) -> FullValidationOutput:
    """Validate a table against a full ruleset (row-local + ref + unique).

    ``sha_col``: column whose sha256 lands in the verdict rows — the
    end-to-end no-mutation invariant from BASELINE.json (content sha256
    equality). None disables.
    """
    rid = F.col(record_id) if isinstance(record_id, str) else record_id
    engine = ValidationEngine(ruleset)
    out = engine.validate(df, record_id=rid)

    extra_violation_frames: list[DataFrame] = []
    for rule in ruleset.table_scoped:
        if rule.kind == "ref":
            if dims is None:
                raise ValueError(
                    f"rule {rule.rule_id} needs a DimensionRegistry"
                )
            # dispatch by ref flavor: plain membership (J1), label match
            # (J2, params carry text_field), closure membership (J3,
            # params carry link_dim/closure_dim)
            if "closure_dim" in rule.params or "link_dim" in rule.params:
                from faang_pydantics_validation_spark.dims import (
                    closure_membership_violations,
                )

                extra_violation_frames.append(
                    closure_membership_violations(df, rule, dims, rid)
                )
            elif "text_field" in rule.params:
                from faang_pydantics_validation_spark.dims import (
                    label_match_violations,
                )

                extra_violation_frames.append(
                    label_match_violations(df, rule, dims, rid)
                )
            else:
                extra_violation_frames.append(
                    membership_violations(df, rule, dims, rid)
                )
        elif rule.kind == "unique":
            extra_violation_frames.append(
                uniqueness_violations(
                    df,
                    keys=list(rule.params["keys"]),
                    rule_id=rule.rule_id,
                    record_id=rid,
                    message=rule.message,
                    severity=rule.severity,
                )
            )

    violations = out.violations()
    for extra in extra_violation_frames:
        violations = violations.unionByName(extra)

    base_cols = [
        F.col("record_id"),
        F.col("n_errors").alias("__row_errors"),
        F.col("n_warnings").alias("__row_warnings"),
    ]
    if sha_col is not None and sha_col in df.columns:
        base_cols.append(F.sha2(F.col(sha_col), 256).alias("content_sha256"))
    base = out.annotated.select(*base_cols)

    if extra_violation_frames:
        table_counts = None
        for extra in extra_violation_frames:
            table_counts = (
                extra if table_counts is None else table_counts.unionByName(extra)
            )
        per_record = table_counts.groupBy("record_id").agg(
            F.sum((F.col("severity") == "error").cast("int")).alias("__t_errors"),
            F.sum((F.col("severity") == "warning").cast("int")).alias("__t_warnings"),
        )
        merged = base.join(per_record, "record_id", "left").fillna(
            0, ["__t_errors", "__t_warnings"]
        )
    else:
        merged = base.withColumn("__t_errors", F.lit(0)).withColumn(
            "__t_warnings", F.lit(0)
        )

    verdict_cols = [
        F.col("record_id"),
        ((F.col("__row_errors") + F.col("__t_errors")) == 0).alias("passed"),
        (F.col("__row_errors") + F.col("__t_errors")).cast("int").alias("n_errors"),
        (F.col("__row_warnings") + F.col("__t_warnings"))
        .cast("int")
        .alias("n_warnings"),
    ]
    if sha_col is not None and sha_col in df.columns:
        verdict_cols.append(F.col("content_sha256"))
    verdicts = merged.select(*verdict_cols)

    return FullValidationOutput(violations=violations, verdicts=verdicts)
