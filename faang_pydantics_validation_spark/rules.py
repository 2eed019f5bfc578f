"""Rule IR — the declarative spec every constraint compiles from.

The reference encodes its ruleset twice: as Pydantic classes
(`/root/reference/app/rulesets_pydantics/organism_ruleset.py`) and as a
draft-07 JSON-Schema document with `mandatory` tier annotations
(`app/rulesets-json/faang_samples_organism.metadata_rules.json`). Our
engine keeps ONE canonical form: a flat list of :class:`Rule` records that
the compiler (compiler.py) turns into a single fused ``violations`` array
column. Rulesets can be authored in Python or loaded from a JSON/dict spec
(mirroring the reference's declarative file, including tier annotations).

Layering mirrors the reference's short-circuit lifecycle
(`app/organism_validation.py:34-49`): a layer-1 ("parse") failure
suppresses every higher layer for that record — replicated by gating
layer>=2 rules on "zero layer-1 violations".

Rule kinds (→ SURVEY.md §2.2 ids):
  required        R1  — column / wrapped value must be non-null
  enum            R3  — value ∈ closed list
  const           R4  — value == constant
  regex           R5  — value matches pattern (sentinel strings exempt)
  uri             R6  — http/https/ftp/mailto prefix (reference's semantics,
                        standard_ruleset.py:87-92 — prefix, not RFC 3986)
  numeric         R7  — value castable to double (for string-typed input)
  range           —   — numeric bounds (engine extension; JSON-Schema min/max)
  cross_field_map R8  — value of field B must equal map[field A]
  prefix          R9  — string startswith any of the given prefixes
  forall_prefix   R9  — every struct in an array satisfies a prefix rule
  cardinality     R12 — array size within [min, max]
  sentinel_tier   R10 — missing-value sentinel legality by mandatory tier
                        (constants.py:202-216 MISSING_VALUES matrix)
  recommended     R11 — null recommended field ⇒ warning
  one_of          —   — oneOf OR-group: any branch passes ⇒ pass; one
                        violation per failing group (P4 semantics,
                        organism_validator_classes.py:93-94)
  unique          G3  — handled by checks/uniqueness.py (not row-local)
  ref             J1  — handled by dims.py joins (not row-local)
  expr            —   — escape hatch: raw SQL boolean expression (true=pass)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterable

#: rule kinds evaluable as row-local Column predicates (the fused pass);
#: `unique` and `ref` are table-scoped and dispatched to their own checks.
ROW_LOCAL_KINDS = frozenset(
    {
        "required",
        "enum",
        "const",
        "regex",
        "uri",
        "numeric",
        "range",
        "cross_field_map",
        "prefix",
        "forall_prefix",
        "cardinality",
        "sentinel_tier",
        "recommended",
        "one_of",
        "expr",
    }
)

TABLE_SCOPED_KINDS = frozenset({"unique", "ref"})

SEVERITIES = ("error", "warning")

#: the reference's missing-value sentinels (constants.py:202-216)
SENTINELS = (
    "not applicable",
    "not collected",
    "not provided",
    "restricted access",
)

#: tier → {sentinel → severity-or-None}; None = sentinel is legal, silent.
#: Transcribed from MISSING_VALUES (reference constants.py:202-216).
MISSING_VALUE_MATRIX: dict[str, dict[str, str | None]] = {
    "mandatory": {
        "not applicable": "error",
        "not collected": "error",
        "not provided": "error",
        "restricted access": "warning",
    },
    "recommended": {
        "not applicable": None,
        "not collected": "warning",
        "not provided": "warning",
        "restricted access": None,
    },
    "optional": {
        "not applicable": "error",
        "not collected": "error",
        "not provided": "error",
        "restricted access": "error",
    },
}


@dataclass(frozen=True)
class Rule:
    """One declarative constraint.

    field   — dotted column path ("commit", "organism.term"); for
              array rules the array column ("health_status").
    kind    — one of ROW_LOCAL_KINDS | TABLE_SCOPED_KINDS.
    params  — kind-specific parameters (see compiler.py).
    severity— "error" | "warning" (verdict ignores warnings, A1 semantics).
    tier    — mandatory | recommended | optional (drives sentinel matrix).
    layer   — 1 = structural/"parse" (always evaluated); >=2 = semantic,
              suppressed when the record has any layer-1 error
              (reference short-circuit, organism_validation.py:46).
    message — template; ``{value}`` and ``{field}`` interpolate.
    """

    rule_id: str
    field: str
    kind: str
    params: dict[str, Any] = dc_field(default_factory=dict)
    severity: str = "error"
    tier: str = "optional"
    layer: int = 1
    message: str | None = None

    def __post_init__(self) -> None:
        if self.kind not in ROW_LOCAL_KINDS | TABLE_SCOPED_KINDS:
            raise ValueError(f"unknown rule kind: {self.kind!r}")
        if self.severity not in SEVERITIES:
            raise ValueError(f"unknown severity: {self.severity!r}")
        if self.tier not in MISSING_VALUE_MATRIX:
            raise ValueError(f"unknown tier: {self.tier!r}")
        if self.layer < 1:
            raise ValueError("layer must be >= 1")


@dataclass(frozen=True)
class RuleSet:
    """A named collection of rules over one table schema.

    known_fields — top-level columns the schema allows; any other non-null
    column is a closed-schema violation (reference `extra = "forbid"`,
    organism_ruleset.py:247). Empty tuple disables the check.

    unique_keys_determine_record_id — declares that every `unique` rule's
    keys functionally determine the record id used for checkpoint
    partitioning (equal keys ⇒ same partition slice), making per-slice
    uniqueness evaluation equal to global evaluation. Required for
    resumable (--checkpoint) runs of rulesets that carry a unique rule.
    """

    name: str
    rules: tuple[Rule, ...]
    known_fields: tuple[str, ...] = ()
    unique_keys_determine_record_id: bool = False

    def __post_init__(self) -> None:
        seen: set[str] = set()
        for r in self.rules:
            if r.rule_id in seen:
                raise ValueError(f"duplicate rule_id: {r.rule_id}")
            seen.add(r.rule_id)

    @property
    def row_local(self) -> tuple[Rule, ...]:
        return tuple(r for r in self.rules if r.kind in ROW_LOCAL_KINDS)

    @property
    def table_scoped(self) -> tuple[Rule, ...]:
        return tuple(r for r in self.rules if r.kind in TABLE_SCOPED_KINDS)

    def layer_rules(self, structural: bool) -> tuple[Rule, ...]:
        if structural:
            return tuple(r for r in self.row_local if r.layer == 1)
        return tuple(r for r in self.row_local if r.layer >= 2)


def ruleset_from_spec(spec: dict[str, Any] | str) -> RuleSet:
    """Load a RuleSet from a JSON string / dict spec.

    Spec shape (our engine's analog of the reference's
    *.metadata_rules.json, flattened):

        {"name": "...",
         "known_fields": ["repo", ...],
         "rules": [{"rule_id": "...", "field": "...", "kind": "...",
                    "params": {...}, "severity": "error",
                    "tier": "mandatory", "layer": 1, "message": "..."}]}
    """
    if isinstance(spec, str):
        spec = json.loads(spec)
    rules = tuple(
        Rule(
            rule_id=r["rule_id"],
            field=r["field"],
            kind=r["kind"],
            params=r.get("params", {}),
            severity=r.get("severity", "error"),
            tier=r.get("tier", "optional"),
            layer=int(r.get("layer", 1)),
            message=r.get("message"),
        )
        for r in spec["rules"]
    )
    return RuleSet(
        name=spec.get("name", "ruleset"),
        rules=rules,
        known_fields=tuple(spec.get("known_fields", ())),
    )


def ruleset_to_spec(rs: RuleSet) -> dict[str, Any]:
    """Inverse of :func:`ruleset_from_spec` (round-trippable)."""
    return {
        "name": rs.name,
        "known_fields": list(rs.known_fields),
        "rules": [
            {
                "rule_id": r.rule_id,
                "field": r.field,
                "kind": r.kind,
                "params": r.params,
                "severity": r.severity,
                "tier": r.tier,
                "layer": r.layer,
                "message": r.message,
            }
            for r in rs.rules
        ],
    }
