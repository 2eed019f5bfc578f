"""Full-table validation run: fused row-local pass + table-scoped checks.

The complete Spark recast of the reference's pipeline (SURVEY.md §3):

    read(schema)
      → withColumn(violations)            # fused rule kernel, no shuffle
      → dim joins (ref rules)             # broadcast → no shuffle
      → uniqueness window (unique rules)  # 1 shuffle (count over keys)
      → summary agg                       # AQE-coalesced

Verdicts need exactly ONE wide stage (the uniqueness exchange) when
every table rule is column-expressible — see ``_build_verdicts``. The
violations frame keeps the per-rule join formulation (it is lazy and
usually materialized over the tiny broken subset only).
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

    verdicts = _build_verdicts(
        df, out, ruleset, dims, sha_col, extra_violation_frames
    )
    return FullValidationOutput(violations=violations, verdicts=verdicts)


def _fast_table_rules(ruleset: RuleSet, dims, df: DataFrame):
    """Split table-scoped rules into column-expressible fast-path rules
    (unique over df columns; plain membership against a broadcast dim)
    and everything else (label-match / closure / shuffled dims), which
    keeps the legacy join-merge path."""
    fast_unique, fast_member, slow = [], [], []
    for rule in ruleset.table_scoped:
        if rule.kind == "unique" and all(
            k in df.columns for k in rule.params["keys"]
        ):
            fast_unique.append(rule)
        elif (
            rule.kind == "ref"
            and "text_field" not in rule.params
            and "closure_dim" not in rule.params
            and "link_dim" not in rule.params
            and dims is not None
            and dims.get(rule.params["dim"])[1] == "broadcast"
        ):
            fast_member.append(rule)
        else:
            slow.append(rule)
    return fast_unique, fast_member, slow


def _build_verdicts(
    df: DataFrame,
    out,
    ruleset: RuleSet,
    dims,
    sha_col: str | None,
    extra_violation_frames: list[DataFrame],
) -> DataFrame:
    """Per-record verdicts in (at most) ONE wide stage.

    Old shape: each table-scoped rule produced a violation frame
    (re-scanning the input), the frames were union-aggregated by
    record_id, and the result LEFT-joined back onto every base row —
    ~4 scans and two sort-merge joins keyed by the long synthetic
    record-id string. Measured at 16M rows that join dominated the job.

    New shape: fast-path table rules become COLUMNS on the annotated
    frame —

    * plain membership (J1, broadcast dim): broadcast LEFT join adds a
      hit flag, zero shuffle;
    * uniqueness (G3): ``count(*) over (partition by <keys>)`` — ONE
      exchange hashed by the natural keys, no join-back, no re-scan.
      Skew-safe because the full key tuple is near-unique (the hot-repo
      monorepo key is `repo` alone; the window keys include path+commit).

    Each flagged copy counts its own violation once (a duplicate pair
    adds 1 error to each copy's verdict — matching the per-copy rows the
    violations frame emits). sha256 is computed BEFORE the exchange so
    the shuffle carries a 64-char digest, not the payload.

    Rules that cannot be expressed as columns (label match, closure,
    shuffled dims) still merge through the legacy aggregated join.
    """
    fast_unique, fast_member, slow = _fast_table_rules(ruleset, dims, df)

    # carried fields get opaque aliases: a select of a DOTTED path
    # ("organism.term") yields a column named by the LEAF ("term"), so
    # referencing the original path downstream would fail to resolve —
    # and two nested fields sharing a leaf name would collide
    carry: set[str] = set()
    for rule in fast_unique:
        carry.update(rule.params["keys"])
    for rule in fast_member:
        carry.add(rule.field)
    alias = {c: f"__carry_{i}" for i, c in enumerate(sorted(carry))}

    base_cols = [
        F.col("record_id"),
        F.col("n_errors").alias("__row_errors"),
        F.col("n_warnings").alias("__row_warnings"),
    ]
    if sha_col is not None and sha_col in df.columns:
        base_cols.append(F.sha2(F.col(sha_col), 256).alias("content_sha256"))
    base_cols.extend(F.col(c).alias(a) for c, a in alias.items())
    staged = out.annotated.select(*base_cols)

    err_terms: list[Column] = []
    warn_terms: list[Column] = []

    def _add(rule, flag: Column) -> None:
        inc = F.coalesce(flag.cast("int"), F.lit(0))
        (err_terms if rule.severity == "error" else warn_terms).append(inc)

    for i, rule in enumerate(fast_member):
        dim, _strategy = dims.get(rule.params["dim"])
        dim_key = rule.params.get("dim_key", rule.field)
        field = F.col(alias[rule.field])
        hit = f"__hit_{i}"
        flags = F.broadcast(
            dim.select(F.col(dim_key).alias(f"__dimk_{i}"))
            .distinct()
            .withColumn(hit, F.lit(True))
        )
        staged = staged.join(
            flags, on=field == flags[f"__dimk_{i}"], how="left"
        ).drop(f"__dimk_{i}")
        miss = field.isNotNull() & F.col(hit).isNull()
        sentinels = tuple(rule.params.get("sentinels", ()))
        if sentinels:
            miss = miss & ~field.isin(*sentinels)
        _add(rule, miss)

    if fast_unique:
        from pyspark.sql import Window

        for rule in fast_unique:
            keys = [F.col(alias[k]) for k in rule.params["keys"]]
            w = Window.partitionBy(*keys)
            # NULL-key rows are excluded: presence is the `required`
            # rule's job, and the violations frame's key join is
            # null-unsafe — counting the NULL group as duplicates would
            # make verdicts contradict the violations output
            keys_present = keys[0].isNotNull()
            for k in keys[1:]:
                keys_present = keys_present & k.isNotNull()
            _add(rule, keys_present & (F.count(F.lit(1)).over(w) > 1))

    if slow:
        # legacy path for the non-column-expressible remainder only
        frames = [
            f
            for rule, f in zip(ruleset.table_scoped, extra_violation_frames)
            if rule in slow
        ]
        table_counts = frames[0]
        for f in frames[1:]:
            table_counts = table_counts.unionByName(f)
        per_record = table_counts.groupBy("record_id").agg(
            F.sum((F.col("severity") == "error").cast("int")).alias("__s_err"),
            F.sum((F.col("severity") == "warning").cast("int")).alias("__s_warn"),
        )
        staged = staged.join(per_record, "record_id", "left")
        err_terms.append(F.coalesce(F.col("__s_err"), F.lit(0)))
        warn_terms.append(F.coalesce(F.col("__s_warn"), F.lit(0)))

    t_err = sum(err_terms, F.lit(0))
    t_warn = sum(warn_terms, F.lit(0))
    verdict_cols = [
        F.col("record_id"),
        ((F.col("__row_errors") + t_err) == 0).alias("passed"),
        (F.col("__row_errors") + t_err).cast("int").alias("n_errors"),
        (F.col("__row_warnings") + t_warn).cast("int").alias("n_warnings"),
    ]
    if sha_col is not None and sha_col in df.columns:
        verdict_cols.append(F.col("content_sha256"))
    return staged.select(*verdict_cols)
