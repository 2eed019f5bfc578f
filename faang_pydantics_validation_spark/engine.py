"""Validation engine — one fused pass, reference-faithful verdicts.

Recasts the reference's three-entry-point lifecycle
(/root/reference/app/organism_validation.py:19-209) as a single linear
DataFrame DAG:

    scan → [fused rule predicates → violations array] → verdict columns
         → (optional) table-scoped checks (uniqueness / referential joins)
         → summary aggregation

Stage 1-3 of the reference (per-record parse, verdict routing, counters)
is ONE narrow ``select`` here — no shuffle, whole-stage codegen end to
end. The short-circuit semantics of a parse failure
(organism_validation.py:46: layers 2-4 never run for that record) are
reproduced by gating layer>=2 fragments on "zero layer-1 errors".
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.compiler import (
    compile_rules,
    empty_violations,
)
from faang_pydantics_validation_spark.rules import RuleSet

#: pydantic v1's exact message for a closed-schema violation
#: (Config.extra = "forbid", organism_ruleset.py:247)
EXTRA_FORBIDDEN_MESSAGE = "extra fields not permitted"


@dataclass
class ValidationOutput:
    """Annotated rows + the derived relational views every caller needs."""

    annotated: DataFrame  # input cols + record_id, violations, n_errors, n_warnings, passed

    def violations(self) -> DataFrame:
        """Exploded violation rows — the FIXTURES.md §5 output schema:
        (record_id, rule_id, field, message, severity)."""
        return self.annotated.select(
            "record_id", F.explode("violations").alias("v")
        ).select(
            "record_id",
            F.col("v.rule_id").alias("rule_id"),
            F.col("v.field").alias("field"),
            F.col("v.message").alias("message"),
            F.col("v.severity").alias("severity"),
        )

    def verdicts(self, sha_col: str | None = None) -> DataFrame:
        cols = [
            F.col("record_id"),
            F.col("passed"),
            F.col("n_errors"),
            F.col("n_warnings"),
        ]
        if sha_col is not None:
            cols.append(F.col(sha_col).alias("content_sha256"))
        return self.annotated.select(*cols)

    def summary(self) -> DataFrame:
        """total/valid/invalid/warnings — exactly the reference's counters
        (organism_validation.py:155-191): ``warnings`` counts VALID records
        that carry at least one warning."""
        return self.annotated.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("passed").cast("int")).alias("valid"),
            F.sum((~F.col("passed")).cast("int")).alias("invalid"),
            F.sum(
                (F.col("passed") & (F.col("n_warnings") > 0)).cast("int")
            ).alias("warnings"),
        )

    def submission_status(self) -> str:
        """ANY error anywhere ⇒ 'Fix issues' (organism_validation.py:348-369).
        Uses a LIMIT-1 existence probe, not a full count."""
        has_error = (
            self.annotated.filter(F.col("n_errors") > 0).limit(1).count() > 0
        )
        return "Fix issues" if has_error else "Ready for submission"


class ValidationEngine:
    """Compiles a RuleSet once (driver-side) and applies it to DataFrames.

    The analog of the reference's ``PydanticValidator``
    (organism_validation.py:10-17) minus everything network-bound: ontology
    and parent lookups become broadcast dimension joins (see dims.py), not
    per-record HTTP GETs (organism_validator_classes.py:50-66,247-276).
    """

    def __init__(self, ruleset: RuleSet):
        self.ruleset = ruleset
        # compile once; Column trees are reusable across DataFrames
        self._layer1 = compile_rules(ruleset.layer_rules(structural=True))
        self._layer2 = compile_rules(ruleset.layer_rules(structural=False))
        self._has_layer2 = bool(ruleset.layer_rules(structural=False))

    # ------------------------------------------------------------------

    def _extra_field_fragments(self, df: DataFrame, ignore: set[str]) -> Column | None:
        """Closed-schema check (extra='forbid'): one violation per unknown
        column that is non-null on the record. Plan-time column-set diff,
        run-time null probe — no data mutation."""
        if not self.ruleset.known_fields:
            return None
        unknown = [
            c
            for c in df.columns
            if c not in self.ruleset.known_fields and c not in ignore
        ]
        if not unknown:
            return None
        frags = [
            F.when(
                F.col(c).isNotNull(),
                F.array(
                    F.struct(
                        F.lit("extra_forbidden").alias("rule_id"),
                        F.lit(c).alias("field"),
                        F.lit(EXTRA_FORBIDDEN_MESSAGE).alias("message"),
                        F.lit("error").alias("severity"),
                    )
                ),
            ).otherwise(empty_violations())
            for c in unknown
        ]
        return F.concat(*frags)

    def validate(
        self,
        df: DataFrame,
        record_id: Column | str,
        keep_columns: bool = True,
    ) -> ValidationOutput:
        """Single fused pass: violations + verdict columns.

        ``record_id`` — Column expression (or column name) identifying each
        record; the analog of the reference's id resolution
        (organism_validator_classes.py:237-245), e.g.
        ``F.coalesce("custom.sample_name.value", "alias.value", lit('unknown'))``
        for organisms or ``concat(repo, ':', path, '@', commit)`` for code.
        """
        rid = F.col(record_id) if isinstance(record_id, str) else record_id

        ignore = {"record_id"}
        l1 = self._layer1
        extra = self._extra_field_fragments(df, ignore)
        if extra is not None:
            l1 = F.concat(l1, extra)

        if self._has_layer2:
            l1_errors = F.size(
                F.filter(F.col("_l1"), lambda v: v.severity == F.lit("error"))
            )
            violations = F.when(
                l1_errors == 0, F.concat(F.col("_l1"), self._layer2)
            ).otherwise(F.col("_l1"))
            staged = df.withColumn("_l1", l1).withColumn(
                "violations", violations
            )
        else:
            staged = df.withColumn("_l1", l1).withColumn(
                "violations", F.col("_l1")
            )

        n_errors = F.size(
            F.filter(F.col("violations"), lambda v: v.severity == F.lit("error"))
        )
        n_warnings = F.size(
            F.filter(
                F.col("violations"), lambda v: v.severity == F.lit("warning")
            )
        )

        annotated = (
            staged.withColumn("record_id", rid)
            .withColumn("n_errors", n_errors)
            .withColumn("n_warnings", n_warnings)
            .withColumn("passed", F.col("n_errors") == 0)
            .drop("_l1")
        )
        if not keep_columns:
            annotated = annotated.select(
                "record_id", "violations", "n_errors", "n_warnings", "passed"
            )
        return ValidationOutput(annotated=annotated)
