"""Draft-07 JSON-Schema ruleset importer.

The reference's canonical declarative ruleset form is draft-07 JSON Schema
annotated with FAANG extensions (`/root/reference/app/rulesets-json/
faang_samples_organism.metadata_rules.json`,
`faang_samples_core.metadata_rules.json`):

* a ``mandatory`` tier constant inside each property
  (organism rules :71-73, :244-246, :352-354),
* ``graph_restriction`` ontology-closure blocks inside ``oneOf``
  (:164-178, :198-213, :271-289, :311-331),
* FAANG micro-structs ({value}, {value, units}, {text, term,
  ontology_name}) with per-property ``required`` lists,
* array properties with ``items``/``minItems``/``maxItems`` (:512-530).

This module converts those documents into the engine's flat Rule IR
(rules.py) so a user holding the reference's actual ruleset files can load
them directly — no hand transcription. Conversion map:

    top-level required + property required   → required rules (R1)
    property required on optional property   → required {"if_present": P}
    const                                    → const (R4)
    enum                                     → enum (R3)
    pattern                                  → regex (R5), re.match parity
    format: uri                              → uri (R6)
    type: number                             → numeric (R7)
    minItems / maxItems                      → cardinality (R12)
    oneOf [pattern | enum-of-sentinels]      → regex with sentinels exempt
    oneOf [graph_restriction | sentinels]    → prefix / forall_prefix
                                               (layer 2 — the reference
                                               checks ontology membership
                                               post-parse,
                                               organism_validation.py:86-129)
    mandatory: recommended                   → recommended warning (R11,
                                               layer 2)
    items.properties enums / required        → expr forall(...) rules

Pattern semantics: the reference evaluates patterns with Python
``re.match`` (anchored at start, PREFIX match, ``$`` binding only to the
last alternation branch — organism_ruleset.py:99-102). Spark ``rlike`` and
DuckDB ``regexp_matches`` are contains-matches, so patterns are rewritten
by :func:`re_match_pattern` to reproduce ``re.match`` exactly — including
the reference's acceptance of e.g. ``"2020-01-99"`` via a prefix match on
the YYYY-MM branch.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql.types import ArrayType, StructType

from faang_pydantics_validation_spark.rules import Rule, RuleSet

#: property-level keys that are annotations, not constraints
_ANNOTATION_KEYS = {"mandatory", "_comment"}

_TIERS = {"mandatory", "recommended", "optional"}


def re_match_pattern(pattern: str) -> str:
    """Rewrite a Python ``re.match`` pattern for rlike/regexp_matches.

    ``re.match`` anchors every top-level alternation branch at the string
    start and allows a prefix match. ``rlike`` anchors nothing. The exact
    equivalent is ``^(?:pattern)`` — each branch start-anchored, trailing
    ``$`` still binding only where written. Patterns that already start
    with ``^`` and have no top-level alternation are left untouched (their
    rlike behavior already equals re.match)."""
    if pattern.startswith("^") and not _has_top_level_alternation(pattern):
        return pattern
    return "^(?:" + pattern + ")"


def _has_top_level_alternation(pattern: str) -> bool:
    depth = 0
    i = 0
    in_class = False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "|" and depth == 0:
            return True
        i += 1
    return False


def schema_field_paths(schema: StructType, prefix: str = "") -> set[str]:
    """All dotted column paths a DataFrame schema can resolve, with
    ``P[].f`` entries for fields of array-of-struct elements."""
    out: set[str] = set()
    for f in schema.fields:
        p = prefix + f.name
        out.add(p)
        dt = f.dataType
        if isinstance(dt, StructType):
            out |= schema_field_paths(dt, p + ".")
        elif isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            for sub in dt.elementType.fields:
                out.add(p + "[]." + sub.name)
    return out


def _slug(path: str) -> str:
    return re.sub(r"[^A-Za-z0-9]+", "_", path).strip("_")


def _tier_of(subschema: dict[str, Any]) -> str:
    props = subschema.get("properties", {})
    t = props.get("mandatory", {}).get("const")
    return t if t in _TIERS else "optional"


def _sentinel_values(branches: list[dict[str, Any]]) -> list[str]:
    """Collect const/enum literals from non-pattern, non-graph branches."""
    out: list[str] = []
    for b in branches:
        if "graph_restriction" in b or "pattern" in b:
            continue
        if "const" in b:
            out.append(b["const"])
        out.extend(b.get("enum", ()))
    return out


def _graph_prefixes(gr: dict[str, Any]) -> list[str]:
    """graph_restriction classes → ontology CURIE prefixes. The engine's
    scale-path for ontology closure is the broadcast closure dim
    (dims.py J3); the importer's row-local analog is the same prefix check
    the reference applies post-parse (organism_validation.py:89-95)."""
    seen: list[str] = []
    for cls in gr.get("classes", ()):
        p = cls.split(":")[0] + ":"
        if p not in seen:
            seen.append(p)
    return seen


class _Emitter:
    def __init__(self, id_prefix: str, available: set[str] | None):
        self.id_prefix = id_prefix
        self.available = available
        self.rules: list[Rule] = []

    def _ok(self, *paths: str) -> bool:
        if self.available is None:
            return True
        return all(p in self.available for p in paths)

    def emit(self, suffix: str, field: str, kind: str, *, paths: tuple[str, ...] = (),
             **kw: Any) -> None:
        if not self._ok(*(paths or (field,))):
            return
        self.rules.append(
            Rule(rule_id=f"{self.id_prefix}_{_slug(suffix)}", field=field, kind=kind, **kw)
        )


def rules_from_json_schema(
    schema: dict[str, Any],
    *,
    id_prefix: str = "js",
    available: set[str] | None = None,
) -> list[Rule]:
    """Convert one draft-07 ruleset document into flat Rule IR.

    ``available`` — the set of resolvable column paths (from
    :func:`schema_field_paths`); rules referencing absent columns are
    dropped, mirroring how the reference simply never sees attributes a
    submission doesn't carry.
    """
    em = _Emitter(id_prefix, available)
    top_required = set(schema.get("required", ()))
    for name, sub in schema.get("properties", {}).items():
        styp = sub.get("type")
        if styp == "object" and "properties" in sub:
            _struct_property(em, name, sub, required=name in top_required)
        elif styp == "array" and isinstance(sub.get("items"), dict):
            _array_property(em, name, sub, required=name in top_required)
        else:
            _scalar(em, name, name, sub,
                    required=name in top_required, tier="optional")
    return em.rules


def _struct_property(em: _Emitter, name: str, sub: dict[str, Any], *, required: bool) -> None:
    tier = _tier_of(sub)
    props = sub.get("properties", {})
    sub_required = [f for f in sub.get("required", ()) if f in props]
    if required and not sub_required:
        em.emit(f"{name}_required", name, "required", tier=tier)
    for f in sub_required:
        path = f"{name}.{f}"
        if required:
            em.emit(f"{path}_required", path, "required", tier=tier)
        else:
            em.emit(
                f"{path}_required",
                path,
                "required",
                params={"if_present": name},
                tier=tier,
                paths=(path, name),
            )
    for f, fs in props.items():
        if f in _ANNOTATION_KEYS:
            continue
        _scalar(em, f"{name}.{f}", f"{name}.{f}", fs, required=False, tier=tier)
    if tier == "recommended":
        rep = f"{name}.value" if "value" in props else (
            f"{name}.term" if "term" in props else name
        )
        em.emit(f"{name}_recommended", rep, "recommended",
                severity="warning", tier="recommended", layer=2)


def _array_property(
    em: _Emitter, name: str, sub: dict[str, Any], *, required: bool = False
) -> None:
    items = sub["items"]
    tier = _tier_of(items) if isinstance(items, dict) else "optional"
    if required:
        em.emit(f"{name}_required", name, "required", tier=tier)
    lo, hi = sub.get("minItems"), sub.get("maxItems")
    if lo is not None or hi is not None:
        em.emit(f"{name}_cardinality", name, "cardinality",
                params={k: v for k, v in (("min", lo), ("max", hi)) if v is not None},
                tier=tier)
    iprops = items.get("properties", {})
    ireq = [f for f in items.get("required", ()) if f in iprops]
    if ireq:
        conds = " AND ".join(f"x.{f} IS NOT NULL" for f in ireq)
        em.emit(
            f"{name}_items_required",
            name,
            "expr",
            params={"expression": f"coalesce(forall({name}, x -> {conds}), true)"},
            tier=tier,
            paths=tuple([name] + [f"{name}[].{f}" for f in ireq]),
        )
    for f, fs in iprops.items():
        if f in _ANNOTATION_KEYS:
            continue
        epaths = (name, f"{name}[].{f}")
        if "oneOf" in fs:
            gr = next((b["graph_restriction"] for b in fs["oneOf"]
                       if "graph_restriction" in b), None)
            if gr is not None:
                prefixes = _graph_prefixes(gr)
                em.emit(
                    f"{name}_{f}_graph", name, "forall_prefix",
                    params={
                        "subfield": f,
                        "prefixes": prefixes,
                        "sentinels": _sentinel_values(fs["oneOf"]),
                    },
                    tier=tier, layer=2, paths=epaths,
                    message=("{field}[{i}] term '{v}' should be from "
                             + " or ".join(p.rstrip(":") for p in prefixes)
                             + " ontology"),
                )
                continue
        if "enum" in fs:
            vals = ", ".join(_sql_str(v) for v in fs["enum"])
            em.emit(
                f"{name}_{f}_enum", name, "expr",
                params={"expression": (
                    f"coalesce(forall({name}, "
                    f"x -> x.{f} IS NULL OR x.{f} IN ({vals})), true)"
                )},
                tier=tier, paths=epaths,
                message=f"{name}[].{f} has a value outside the permitted set",
            )
    if tier == "recommended":
        em.emit(f"{name}_recommended", name, "recommended",
                severity="warning", tier="recommended", layer=2)


def _scalar(em: _Emitter, suffix: str, path: str, fs: dict[str, Any], *,
            required: bool, tier: str) -> None:
    if required:
        em.emit(f"{suffix}_required", path, "required", tier=tier)
    if "const" in fs:
        em.emit(f"{suffix}_const", path, "const",
                params={"value": fs["const"]}, tier=tier)
    if "enum" in fs:
        em.emit(f"{suffix}_enum", path, "enum",
                params={"values": list(fs["enum"])}, tier=tier)
    if "pattern" in fs:
        em.emit(f"{suffix}_format", path, "regex",
                params={"pattern": re_match_pattern(fs["pattern"])}, tier=tier)
    if fs.get("format") == "uri":
        em.emit(f"{suffix}_uri", path, "uri",
                params={"schemes": ["http", "https", "ftp", "mailto"]}, tier=tier)
    if fs.get("type") in ("number", "integer"):
        em.emit(f"{suffix}_numeric", path, "numeric", tier=tier)
    if "oneOf" in fs:
        branches = fs["oneOf"]
        sentinels = _sentinel_values(branches)
        gr = next((b["graph_restriction"] for b in branches
                   if "graph_restriction" in b), None)
        pat = next((b["pattern"] for b in branches if "pattern" in b), None)
        if gr is not None:
            prefixes = _graph_prefixes(gr)
            em.emit(
                f"{suffix}_graph", path, "prefix",
                params={"prefixes": prefixes, "sentinels": sentinels},
                tier=tier, layer=2,
                message=("{field} term '{value}' should be from "
                         + " or ".join(p.rstrip(":") for p in prefixes)
                         + " ontology"),
            )
        elif pat is not None:
            em.emit(
                f"{suffix}_format", path, "regex",
                params={"pattern": re_match_pattern(pat), "sentinels": sentinels},
                tier=tier,
                message="Invalid format: '{value}'",
            )


def _sql_str(v: Any) -> str:
    from faang_pydantics_validation_spark.fixtures import _sql_str as quote

    return quote(v)


def ruleset_from_json_schema(
    doc: dict[str, Any] | str,
    *,
    name: str | None = None,
    id_prefix: str | None = None,
    available: set[str] | None = None,
    known_fields: tuple[str, ...] = (),
) -> RuleSet:
    """Load a reference-format JSON ruleset file/dict into a RuleSet.

    ``doc`` — a parsed dict, a JSON string, or a filesystem path to a
    ``*.metadata_rules.json`` document."""
    if isinstance(doc, str):
        if doc.lstrip().startswith("{"):
            doc = json.loads(doc)
        else:
            with open(doc) as fh:
                doc = json.load(fh)
    rs_name = name or doc.get("name", "json_ruleset")
    prefix = id_prefix or "js"
    rules = rules_from_json_schema(doc, id_prefix=prefix, available=available)
    return RuleSet(name=rs_name, rules=tuple(rules), known_fields=known_fields)
