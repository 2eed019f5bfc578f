"""Per-rule unit tests: one passing and one failing record per kind,
asserting exact violation rows (rule_id, field, message, severity) —
SURVEY.md §5 test plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.engine import ValidationEngine
from faang_pydantics_validation_spark.rules import Rule, RuleSet


def _run(spark, rows, schema, rules, known_fields=()):
    df = spark.createDataFrame(rows, schema)
    engine = ValidationEngine(
        RuleSet(name="t", rules=tuple(rules), known_fields=tuple(known_fields))
    )
    out = engine.validate(df, record_id=F.col("rid"))
    rows = out.violations().collect()
    viols = _Viols(
        (v.record_id, v.rule_id, v.field, v.severity, v.message) for v in rows
    )
    verdicts = {r.record_id: r.passed for r in out.annotated.collect()}
    return viols, verdicts


class _Viols(list):
    """List of (record_id, rule_id, field, severity, message) tuples with
    dict-ish sugar: `key in viols` and `viols[key]` match on the 4-prefix."""

    def __contains__(self, key):
        return any(t[:4] == tuple(key) for t in self)

    def __getitem__(self, key):
        if isinstance(key, tuple):
            matches = [t[4] for t in self if t[:4] == key]
            if len(matches) != 1:
                raise KeyError(key)
            return matches[0]
        return super().__getitem__(key)

    def __eq__(self, other):
        if isinstance(other, dict):
            return {t[:4]: t[4] for t in self} == other and len(self) == len(other)
        return super().__eq__(other)


def test_required(spark):
    viols, verdicts = _run(
        spark,
        [("a", "x"), ("b", None)],
        "rid string, f string",
        [Rule("r", "f", "required", tier="mandatory")],
    )
    assert verdicts == {"a": True, "b": False}
    assert viols == {("b", "r", "f", "error"): "field required"}


def test_enum(spark):
    viols, verdicts = _run(
        spark,
        [("a", "x"), ("b", "zz"), ("c", None)],
        "rid string, f string",
        [Rule("r", "f", "enum", params={"values": ["x", "y"]})],
    )
    # null passes enum (presence is required's job)
    assert verdicts == {"a": True, "b": False, "c": True}
    assert ("b", "r", "f", "error") in viols


def test_const(spark):
    viols, verdicts = _run(
        spark,
        [("a", "FAANG"), ("b", "GAFAM")],
        "rid string, f string",
        [Rule("r", "f", "const", params={"value": "FAANG"})],
    )
    assert verdicts == {"a": True, "b": False}


def test_regex_with_sentinels(spark):
    # birth-date analog: YYYY[-MM[-DD]] or sentinel (organism_ruleset.py:95-105)
    pat = r"^[12]\d{3}(-(0[1-9]|1[0-2])(-(0[1-9]|[12]\d|3[01]))?)?$"
    viols, verdicts = _run(
        spark,
        [("a", "2021-03-12"), ("b", "2021-13"), ("c", "not collected"), ("d", "99")],
        "rid string, f string",
        [
            Rule(
                "r",
                "f",
                "regex",
                params={"pattern": pat, "sentinels": ["not collected"]},
            )
        ],
    )
    assert verdicts == {"a": True, "b": False, "c": True, "d": False}


def test_uri(spark):
    viols, verdicts = _run(
        spark,
        [("a", "https://x.org"), ("b", "mailto:me@x.org"), ("c", "gopher://x")],
        "rid string, f string",
        [Rule("r", "f", "uri")],
    )
    assert verdicts == {"a": True, "b": True, "c": False}


def test_numeric_and_range(spark):
    viols, verdicts = _run(
        spark,
        [("a", "1.5"), ("b", "abc"), ("c", "900.0")],
        "rid string, f string",
        [
            Rule("num", "f", "numeric"),
            Rule("rng", "f", "range", params={"min": 0, "max": 100}),
        ],
    )
    assert verdicts == {"a": True, "b": False, "c": False}
    assert ("b", "num", "f", "error") in viols
    assert ("c", "rng", "f", "error") in viols
    # "abc" casts to null double → range does not double-fire
    assert ("b", "rng", "f", "error") not in viols


def test_cross_field_map(spark):
    # material text↔term consistency (standard_ruleset.py:41-62)
    mapping = {"organism": "OBI:0100026", "cell specimen": "OBI:0001468"}
    viols, verdicts = _run(
        spark,
        [
            ("a", "organism", "OBI:0100026"),
            ("b", "organism", "OBI:9999999"),
            ("c", "unknown text", "OBI:0100026"),  # unknown key passes
        ],
        "rid string, text string, term string",
        [
            Rule(
                "r",
                "term",
                "cross_field_map",
                params={"key_field": "text", "mapping": mapping},
            )
        ],
    )
    assert verdicts == {"a": True, "b": False, "c": True}


def test_prefix(spark):
    viols, verdicts = _run(
        spark,
        [("a", "NCBITaxon:9913"), ("b", "FOO:1"), ("c", "restricted access")],
        "rid string, f string",
        [
            Rule(
                "r",
                "f",
                "prefix",
                params={
                    "prefixes": ["NCBITaxon:"],
                    "sentinels": ["restricted access"],
                },
            )
        ],
    )
    assert verdicts == {"a": True, "b": False, "c": True}


def test_forall_prefix_per_element_messages(spark):
    # health_status analog: one violation per failing element with its
    # index in the message (organism_validation.py:120-127)
    rows = [
        ("a", [("normal", "PATO:0000461"), ("bad", "XXX:1"), ("bad2", "YYY:2")]),
        ("b", [("fine", "EFO:0000408")]),
        ("c", None),
    ]
    viols, verdicts = _run(
        spark,
        rows,
        "rid string, hs array<struct<text:string,term:string>>",
        [
            Rule(
                "r",
                "hs",
                "forall_prefix",
                params={"subfield": "term", "prefixes": ["PATO:", "EFO:"]},
                message="Health status[{i}] term '{v}' should be from PATO or EFO ontology",
            )
        ],
    )
    assert verdicts == {"a": False, "b": True, "c": True}
    all_msgs = [t[4] for t in viols if t[0] == "a"]
    assert sorted(all_msgs) == [
        "Health status[1] term 'XXX:1' should be from PATO or EFO ontology",
        "Health status[2] term 'YYY:2' should be from PATO or EFO ontology",
    ]


def test_cardinality(spark):
    viols, verdicts = _run(
        spark,
        [("a", ["p1"]), ("b", ["p1", "p2", "p3"]), ("c", None)],
        "rid string, child_of array<string>",
        [
            Rule(
                "r",
                "child_of",
                "cardinality",
                params={"min": 1, "max": 2},
                message="Organism can have at most 2 parents, found {value}",
            )
        ],
    )
    assert verdicts == {"a": True, "b": False, "c": True}
    assert (
        viols[("b", "r", "child_of", "error")]
        == "Organism can have at most 2 parents, found 3"
    )


def test_sentinel_tier_matrix(spark):
    # MISSING_VALUES severity matrix (constants.py:202-216)
    rows = [
        ("m1", "not applicable"),
        ("m2", "restricted access"),
        ("m3", "real value"),
    ]
    viols, verdicts = _run(
        spark,
        rows,
        "rid string, f string",
        [Rule("r", "f", "sentinel_tier", tier="mandatory")],
    )
    # mandatory: 'not applicable' → error; 'restricted access' → warning
    assert verdicts == {"m1": False, "m2": True, "m3": True}
    assert ("m1", "r", "f", "error") in viols
    assert ("m2", "r", "f", "warning") in viols

    viols2, verdicts2 = _run(
        spark,
        [("o1", "not collected")],
        "rid string, f string",
        [Rule("r", "f", "sentinel_tier", tier="recommended")],
    )
    assert verdicts2 == {"o1": True}
    assert ("o1", "r", "f", "warning") in viols2


def test_recommended_warning(spark):
    viols, verdicts = _run(
        spark,
        [("a", None), ("b", "x")],
        "rid string, birth_date string",
        [
            Rule(
                "r",
                "birth_date",
                "recommended",
                severity="warning",
                tier="recommended",
                layer=3,
            )
        ],
    )
    # warnings never flip the verdict (A1, organism_validation.py:175)
    assert verdicts == {"a": True, "b": True}
    assert (
        viols[("a", "r", "birth_date", "warning")]
        == "Field 'birth_date' is recommended but was not provided"
    )


def test_extra_fields_forbidden(spark):
    viols, verdicts = _run(
        spark,
        [("a", "x", None), ("b", "x", "surprise")],
        "rid string, f string, rogue string",
        [Rule("r", "f", "required")],
        known_fields=["rid", "f"],
    )
    assert verdicts == {"a": True, "b": False}
    assert viols[("b", "extra_forbidden", "rogue", "error")] == (
        "extra fields not permitted"
    )


def test_layer_gating_short_circuit(spark):
    """A layer-1 error suppresses layer-2 rules for that record only
    (reference parse short-circuit, organism_validation.py:46)."""
    rows = [("a", None, "BAD:1"), ("b", "ok", "BAD:1")]
    viols, verdicts = _run(
        spark,
        rows,
        "rid string, f string, term string",
        [
            Rule("req", "f", "required", tier="mandatory"),
            Rule(
                "ont",
                "term",
                "prefix",
                params={"prefixes": ["NCBITaxon:"]},
                layer=2,
            ),
        ],
    )
    # record a: layer-1 failed → ontology rule suppressed
    assert ("a", "ont", "term", "error") not in viols
    assert ("a", "req", "f", "error") in viols
    # record b: layer-1 passed → ontology rule fires
    assert ("b", "ont", "term", "error") in viols


def test_nested_struct_fields(spark):
    rows = [
        ("a", {"value": "FAANG"}),
        ("b", {"value": "nope"}),
        ("c", None),
    ]
    viols, verdicts = _run(
        spark,
        rows,
        "rid string, project struct<value:string>",
        [
            Rule("req", "project.value", "required", tier="mandatory"),
            Rule("const", "project.value", "const", params={"value": "FAANG"}),
        ],
    )
    assert verdicts == {"a": True, "b": False, "c": False}
    # null struct → null value → required fires, const does not
    assert ("c", "req", "project.value", "error") in viols
    assert ("c", "const", "project.value", "error") not in viols
