"""Property-based compiler checks (hypothesis): for randomly generated
value batches, the fused Column kernel must agree with a plain-Python
model of each rule's semantics — including null handling, sentinel
exemptions, and the one_of OR-group."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.engine import ValidationEngine
from faang_pydantics_validation_spark.rules import Rule, RuleSet, SENTINELS

VALUES = st.one_of(
    st.none(),
    st.sampled_from(["en", "zh", "es", "de", ""]),
    st.sampled_from(list(SENTINELS)),
    st.text(alphabet="abc0123456789-.", max_size=12),
    st.integers(-1000, 1000).map(str),
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _run(spark, values, rule):
    df = spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(values)], "rid string, v string"
    )
    out = ValidationEngine(RuleSet(name="prop", rules=(rule,))).validate(
        df, record_id="rid"
    )
    return {
        int(r.record_id): (r.n_errors, r.n_warnings)
        for r in out.annotated.collect()
    }


@given(st.lists(VALUES, min_size=1, max_size=60))
@SLOW
def test_enum_matches_python_model(spark, values):
    allowed = ["en", "zh", "es"]
    got = _run(spark, values, Rule("r", "v", "enum", params={"values": allowed}))
    for i, v in enumerate(values):
        expect = 1 if (v is not None and v not in allowed) else 0
        assert got[i][0] == expect, (v, got[i])


@given(st.lists(VALUES, min_size=1, max_size=60))
@SLOW
def test_regex_with_sentinels_matches_python_model(spark, values):
    pat = r"^[0-9]+$"
    rule = Rule(
        "r", "v", "regex", params={"pattern": pat, "sentinels": list(SENTINELS)}
    )
    got = _run(spark, values, rule)
    for i, v in enumerate(values):
        ok = v is None or v in SENTINELS or re.search(pat, v) is not None
        assert got[i][0] == (0 if ok else 1), (v, got[i])


@given(st.lists(VALUES, min_size=1, max_size=60))
@SLOW
def test_numeric_and_range_match_python_model(spark, values):
    rule = Rule("r", "v", "range", params={"min": -50, "max": 50})
    got = _run(spark, values, rule)
    for i, v in enumerate(values):
        try:
            f = float(v) if v is not None else None
        except (TypeError, ValueError):
            f = None
        violated = f is not None and not (-50 <= f <= 50)
        assert got[i][0] == (1 if violated else 0), (v, got[i])


@given(st.lists(VALUES, min_size=1, max_size=60))
@SLOW
def test_one_of_group_semantics(spark, values):
    """one_of(enum-branch, regex-branch): pass iff either passes; exactly
    ONE violation per failing non-null value."""
    rule = Rule(
        "r",
        "v",
        "one_of",
        params={
            "branches": [
                {"kind": "enum", "params": {"values": ["en", "zh"]}},
                {"kind": "regex", "params": {"pattern": r"^[0-9]+$"}},
            ]
        },
    )
    got = _run(spark, values, rule)
    for i, v in enumerate(values):
        if v is None:
            expect = 0
        else:
            branch1 = v in ("en", "zh")
            branch2 = re.search(r"^[0-9]+$", v) is not None
            expect = 0 if (branch1 or branch2) else 1
        assert got[i][0] == expect, (v, got[i])


def test_one_of_emits_single_violation(spark):
    rule = Rule(
        "grp",
        "v",
        "one_of",
        params={
            "branches": [
                {"kind": "enum", "params": {"values": ["a"]}},
                {"kind": "enum", "params": {"values": ["b"]}},
                {"kind": "regex", "params": {"pattern": "^c$"}},
            ]
        },
    )
    df_vals = ["a", "b", "c", "nope"]
    out = _run_violations(rule, df_vals)
    assert [r.record_id for r in out] == ["3"]
    assert out[0].rule_id == "grp"


def _run_violations(rule, values):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(values)], "rid string, v string"
    )
    out = ValidationEngine(RuleSet(name="p", rules=(rule,))).validate(
        df, record_id="rid"
    )
    return out.violations().collect()


# ------------------------------------------------- corpus-level line dedup --

LINE_POOL = st.sampled_from([
    "shared boilerplate alpha line",     # long enough to be a candidate
    "shared boilerplate beta line",
    "short ln",                          # below min_line_chars: never removed
    "",                                  # blank: never removed
    "  shared boilerplate alpha line ",  # whitespace variant of pool[0]
    "\tshared boilerplate alpha line\r",  # tab-indent + CR variant of pool[0]
])
DOC_TEXT = st.one_of(
    st.none(),
    st.lists(
        st.one_of(LINE_POOL, st.text(alphabet="xyz \t_", max_size=20)),
        min_size=0, max_size=6,
    ).map(lambda ls: "\n".join(ls)),
)


@given(st.lists(DOC_TEXT, min_size=1, max_size=12))
@SLOW
def test_dedup_lines_corpus_matches_python_model(spark, texts):
    from faang_pydantics_validation_spark.ops.dedup import dedup_lines_corpus

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text_line_deduped, r.n_lines_deduped)
        for r in dedup_lines_corpus(df, min_docs=2).collect()
    }

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s.strip())

    docs_per_line: dict[str, set] = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        for ln in t.split("\n"):
            n = norm(ln)
            if len(n) >= 10:
                docs_per_line.setdefault(n, set()).add(i)
    repeated = {n for n, ds in docs_per_line.items() if len(ds) >= 2}
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] == (None, 0), f"doc {i}"
            continue
        keep = [ln for ln in t.split("\n")
                if not (len(norm(ln)) >= 10 and norm(ln) in repeated)]
        expected = ("\n".join(keep), len(t.split("\n")) - len(keep))
        assert got[i] == expected, f"doc {i}: {t!r}"
