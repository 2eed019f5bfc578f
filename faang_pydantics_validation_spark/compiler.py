"""Rule IR → fused Column expressions.

Every row-local rule compiles to ONE array<struct<rule_id,field,message,
severity>> column ("violation fragments"); the engine concatenates all
fragments and filters nulls in a single ``select`` — so an entire ruleset
is one whole-stage-codegen'd pass over the scan, the Spark-native
replacement for the reference's per-record Python loop
(/root/reference/app/organism_validation.py:167) and its per-field
``field_errors[path].append(msg)`` shape (organism_validation.py:41-44).

Null discipline: a rule about a value only fires when the value is present
(matching Pydantic's Optional semantics); presence itself is the
``required`` / ``recommended`` kinds. Every ``ok`` predicate is coalesced
so three-valued SQL logic can never silently swallow a violation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.rules import (
    MISSING_VALUE_MATRIX,
    Rule,
    SENTINELS,
)

VIOLATION_STRUCT_DDL = (
    "struct<rule_id:string,field:string,message:string,severity:string>"
)
VIOLATION_ARRAY_DDL = f"array<{VIOLATION_STRUCT_DDL}>"


def empty_violations() -> Column:
    return F.array().cast(VIOLATION_ARRAY_DDL)


def _c(path: str) -> Column:
    """Dotted-path column access; null-propagates through null structs."""
    return F.col(path)


class _SafeDict(dict):
    def __missing__(self, key: str) -> str:  # leave unknown {tokens} intact
        return "{" + key + "}"


def _render_message(template: str, rule: Rule, value_col: Column) -> Column:
    """Interpolate {field}/{tier}/params statically and {value} dynamically."""
    static = template.format_map(
        _SafeDict(field=rule.field, tier=rule.tier, **rule.params)
    )
    if "{value}" not in static:
        return F.lit(static)
    parts = static.split("{value}")
    pieces: list[Column] = []
    for i, part in enumerate(parts):
        if i:
            pieces.append(F.coalesce(value_col.cast("string"), F.lit("None")))
        if part:
            pieces.append(F.lit(part))
    return F.concat(*pieces) if len(pieces) > 1 else (pieces[0] if pieces else F.lit(""))


def _fragment(
    rule: Rule,
    violated: Column,
    value_col: Column,
    default_message: str,
    severity_col: Column | None = None,
) -> Column:
    """array with one violation struct when ``violated`` else empty.

    ``violated`` is coalesced to false — a null predicate is a pass, which
    each kind must make correct by explicitly handling null inputs.
    """
    msg = _render_message(rule.message or default_message, rule, value_col)
    sev = severity_col if severity_col is not None else F.lit(rule.severity)
    struct = F.struct(
        F.lit(rule.rule_id).alias("rule_id"),
        F.lit(rule.field).alias("field"),
        msg.alias("message"),
        sev.alias("severity"),
    )
    return F.when(F.coalesce(violated, F.lit(False)), F.array(struct)).otherwise(
        empty_violations()
    )


# ---------------------------------------------------------------- kinds --


def _required(rule: Rule) -> Column:
    col = _c(rule.field)
    violated = col.isNull()
    # conditional presence: draft-07 puts `required` lists INSIDE each
    # property subschema, so "birth_date requires value+units" only binds
    # when the birth_date struct itself is present (the JSON-Schema
    # semantics the reference's rulesets-json files rely on). params
    # {"if_present": "<parent path>"} gates the check on that struct.
    parent = rule.params.get("if_present")
    if parent:
        violated = _c(parent).isNotNull() & violated
    # pydantic v1 message for a missing required field
    return _fragment(rule, violated, col, "field required")


def _recommended(rule: Rule) -> Column:
    # reference: organism_validation.py:71-77 (exact message shape)
    col = _c(rule.field)
    return _fragment(
        rule,
        col.isNull(),
        col,
        f"Field '{rule.field}' is recommended but was not provided",
    )


def _enum(rule: Rule) -> Column:
    col = _c(rule.field)
    values = rule.params["values"]
    violated = col.isNotNull() & ~col.isin(*values)
    permitted = ", ".join(repr(v) for v in values)
    return _fragment(
        rule, violated, col, f"unexpected value; permitted: {permitted}"
    )


def _const(rule: Rule) -> Column:
    col = _c(rule.field)
    value = rule.params["value"]
    violated = col.isNotNull() & (col != F.lit(value))
    return _fragment(
        rule, violated, col, f"unexpected value; permitted: {value!r}"
    )


def _regex(rule: Rule) -> Column:
    col = _c(rule.field)
    pattern = rule.params["pattern"]
    sentinels = tuple(rule.params.get("sentinels", ()))
    ok = col.rlike(pattern)
    if sentinels:
        ok = ok | col.isin(*sentinels)
    violated = col.isNotNull() & ~ok
    return _fragment(
        rule, violated, col, "Invalid format: '{value}' does not match {pattern}"
    )


def _uri(rule: Rule) -> Column:
    # reference semantics are prefix checks, not RFC 3986
    # (standard_ruleset.py:87-92)
    col = _c(rule.field)
    schemes = tuple(rule.params.get("schemes", ("http", "https", "mailto")))
    pattern = "^(" + "|".join(schemes) + "):"
    violated = col.isNotNull() & ~col.rlike(pattern)
    return _fragment(
        rule,
        violated,
        col,
        "value '{value}' is not a URL with scheme in {schemes}",
    )


def _numeric(rule: Rule) -> Column:
    # try_cast, not cast: ANSI mode (Spark 4 default) makes a plain cast
    # throw on malformed input instead of yielding null
    col = _c(rule.field)
    violated = col.isNotNull() & col.try_cast("double").isNull()
    return _fragment(rule, violated, col, "value is not a valid float")


def _range(rule: Rule) -> Column:
    col = _c(rule.field).try_cast("double")
    lo = rule.params.get("min")
    hi = rule.params.get("max")
    ok = F.lit(True)
    if lo is not None:
        ok = ok & (col >= F.lit(lo))
    if hi is not None:
        ok = ok & (col <= F.lit(hi))
    violated = col.isNotNull() & ~ok
    return _fragment(
        rule, violated, col, "value {value} outside [{min}, {max}]"
    )


def _cross_field_map(rule: Rule) -> Column:
    """Field must equal mapping[key_field]; unknown keys pass (the
    reference's dict.get + truthiness check, standard_ruleset.py:58-60)."""
    col = _c(rule.field)
    key = _c(rule.params["key_field"])
    mapping: dict = rule.params["mapping"]
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    expected = F.create_map(*pairs)[key]
    violated = (
        col.isNotNull()
        & key.isNotNull()
        & expected.isNotNull()
        & (col != expected)
    )
    default = (
        "Term '{value}' does not match " + rule.params["key_field"] + ". "
        "Expected term from mapping."
    )
    return _fragment(rule, violated, col, default)


def _prefix(rule: Rule) -> Column:
    col = _c(rule.field)
    prefixes = tuple(rule.params["prefixes"])
    sentinels = tuple(rule.params.get("sentinels", ()))
    ok = F.lit(False)
    for p in prefixes:
        ok = ok | col.startswith(p)
    if sentinels:
        ok = ok | col.isin(*sentinels)
    violated = col.isNotNull() & ~ok
    return _fragment(
        rule, violated, col, "value '{value}' should start with {prefixes}"
    )


def _forall_prefix(rule: Rule) -> Column:
    """One violation per failing array element (the reference emits
    per-index messages — organism_validation.py:120-127)."""
    arr = _c(rule.field)
    sub = rule.params.get("subfield", "term")
    prefixes = tuple(rule.params["prefixes"])
    sentinels = tuple(rule.params.get("sentinels", SENTINELS))

    def elem_violated(x: Column) -> Column:
        v = x[sub]
        ok = F.lit(False)
        for p in prefixes:
            ok = ok | v.startswith(p)
        if sentinels:
            ok = ok | v.isin(*sentinels)
        return v.isNotNull() & ~ok

    template = rule.message or (
        "{field}[{i}] term '{v}' should be from "
        + " or ".join(p.rstrip(":") for p in prefixes)
        + " ontology"
    )

    def make_struct(x: Column, i: Column) -> Column:
        static = template.format_map(_SafeDict(field=rule.field, **rule.params))
        parts = static.replace("{v}", "\x00{v}\x00").replace("{i}", "\x00{i}\x00")
        pieces: list[Column] = []
        for token in parts.split("\x00"):
            if token == "{v}":
                pieces.append(F.coalesce(x[sub].cast("string"), F.lit("None")))
            elif token == "{i}":
                pieces.append(i.cast("string"))
            elif token:
                pieces.append(F.lit(token))
        msg = F.concat(*pieces) if len(pieces) > 1 else pieces[0]
        return F.struct(
            F.lit(rule.rule_id).alias("rule_id"),
            F.lit(rule.field).alias("field"),
            msg.alias("message"),
            F.lit(rule.severity).alias("severity"),
        )

    frags = F.filter(
        F.transform(arr, lambda x, i: F.when(elem_violated(x), make_struct(x, i))),
        lambda s: s.isNotNull(),
    ).cast(VIOLATION_ARRAY_DDL)
    return F.coalesce(frags, empty_violations())


def _cardinality(rule: Rule) -> Column:
    arr = _c(rule.field)
    lo = rule.params.get("min")
    hi = rule.params.get("max")
    size = F.size(arr)
    ok = F.lit(True)
    if lo is not None:
        ok = ok & (size >= F.lit(lo))
    if hi is not None:
        ok = ok & (size <= F.lit(hi))
    violated = arr.isNotNull() & ~ok
    return _fragment(
        rule,
        violated,
        size,
        "array size {value} outside [{min}, {max}]",
    )


def _sentinel_tier(rule: Rule) -> Column:
    """Missing-value sentinel legality by mandatory tier — the MISSING_VALUES
    severity matrix (reference constants.py:202-216)."""
    col = _c(rule.field)
    matrix = MISSING_VALUE_MATRIX[rule.tier]
    flagged = {s: sev for s, sev in matrix.items() if sev is not None}
    if not flagged:
        return empty_violations()
    violated = col.isin(*flagged.keys())
    sev = F.lit(None).cast("string")
    for s, v in flagged.items():
        sev = F.when(col == F.lit(s), F.lit(v)).otherwise(sev)
    return _fragment(
        rule,
        F.coalesce(violated, F.lit(False)),
        col,
        "Missing-value sentinel '{value}' not permitted for {tier} field",
        severity_col=sev,
    )


def _one_of(rule: Rule) -> Column:
    """oneOf OR-group: the value is valid if ANY branch passes, and a
    failing group emits ONE violation — not one per branch. This mirrors
    the reference ruleset's oneOf blocks
    (faang_samples_organism.metadata_rules.json:164-178 etc.) AND its
    suppression of the generic per-branch oneOf noise
    (organism_validator_classes.py:93-94).

    params: branches = list of rule-spec dicts ({kind, field?, params});
    a branch inherits the group's field when it omits its own.
    """
    from faang_pydantics_validation_spark.rules import Rule as _Rule

    branches = rule.params["branches"]
    branch_failed: list[Column] = []
    for i, spec in enumerate(branches):
        sub = _Rule(
            rule_id=f"{rule.rule_id}__b{i}",
            field=spec.get("field", rule.field),
            kind=spec["kind"],
            params=spec.get("params", {}),
            severity=rule.severity,
            tier=rule.tier,
            layer=rule.layer,
        )
        branch_failed.append(F.size(compile_rule(sub)) > 0)
    violated = branch_failed[0]
    for b in branch_failed[1:]:
        violated = violated & b
    col = _c(rule.field)
    return _fragment(
        rule,
        col.isNotNull() & violated,
        col,
        "value '{value}' does not match any permitted alternative",
    )


def _expr(rule: Rule) -> Column:
    ok = F.expr(rule.params["expression"])  # true = pass; null = pass
    col = _c(rule.field) if rule.field else F.lit(None)
    violated = ~F.coalesce(ok, F.lit(True))
    return _fragment(rule, violated, col, "expression constraint failed")


_COMPILERS: dict[str, Callable[[Rule], Column]] = {
    "required": _required,
    "recommended": _recommended,
    "enum": _enum,
    "const": _const,
    "regex": _regex,
    "uri": _uri,
    "numeric": _numeric,
    "range": _range,
    "cross_field_map": _cross_field_map,
    "prefix": _prefix,
    "forall_prefix": _forall_prefix,
    "cardinality": _cardinality,
    "sentinel_tier": _sentinel_tier,
    "one_of": _one_of,
    "expr": _expr,
}


def compile_rule(rule: Rule) -> Column:
    """One rule → array<violation-struct> fragment (empty array = pass)."""
    try:
        compiler = _COMPILERS[rule.kind]
    except KeyError:  # table-scoped kinds never reach here
        raise ValueError(f"rule kind {rule.kind!r} is not row-local") from None
    return compiler(rule)


def compile_rules(rules: tuple[Rule, ...]) -> Column:
    """Fuse many rules into one violations array column."""
    if not rules:
        return empty_violations()
    return F.concat(*[compile_rule(r) for r in rules])
