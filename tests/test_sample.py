"""Deterministic sampling: partition invariance, nesting, stratified
rates, exact-N-per-stratum, and md5 cross-engine parity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.ops import sample as sp


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [(i, ["en", "fr", "de", "yo"][i % 4]) for i in range(4000)]
    return spark.createDataFrame(rows, "k long, lang string")


def _md5_u(s: str) -> float:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) / float(1 << 60)


def test_sample_fraction_partition_invariant_and_nested(spark, keyed):
    a = {r.k for r in sp.sample_fraction(keyed, 0.2, "k").collect()}
    b = {
        r.k
        for r in sp.sample_fraction(keyed.repartition(17, "lang"), 0.2, "k").collect()
    }
    assert a == b  # pure function of the key — partitioning is irrelevant
    small = {r.k for r in sp.sample_fraction(keyed, 0.05, "k").collect()}
    assert small <= a  # same salt ⇒ nested samples
    assert abs(len(a) / 4000 - 0.2) < 0.03  # rate is right
    other = {r.k for r in sp.sample_fraction(keyed, 0.2, "k", salt="eval").collect()}
    assert other != a  # different salt ⇒ independent sample


def test_sample_fraction_md5_matches_python_and_duckdb(spark, keyed):
    import duckdb

    got = sorted(
        r.k for r in sp.sample_fraction(keyed, 0.3, "k", hash_fn="md5").collect()
    )
    want_py = sorted(k for k in range(4000) if _md5_u(str(k)) < 0.3)
    assert got == want_py
    con = duckdb.connect()
    want_duck = sorted(
        k
        for (k,) in con.execute(
            """
            SELECT k FROM range(4000) t(k)
            WHERE CAST(('0x'||substring(md5(CAST(k AS VARCHAR)),1,15)) AS BIGINT)
                  / 1152921504606846976.0 < 0.3
            """
        ).fetchall()
    )
    assert got == want_duck


def test_stratified_sample_rates_and_default_drop(spark, keyed):
    out = sp.stratified_sample(
        keyed, "lang", {"en": 1.0, "fr": 0.3}, key_col="k"
    ).collect()
    by_lang: dict[str, int] = {}
    for r in out:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang["en"] == 1000  # fraction 1.0 keeps the whole stratum
    assert abs(by_lang["fr"] / 1000 - 0.3) < 0.06
    assert "de" not in by_lang and "yo" not in by_lang  # default 0.0 drops


def test_sample_n_per_stratum_exact_and_deterministic(spark, keyed):
    out = sp.sample_n_per_stratum(keyed, "lang", 25, "k", hash_fn="md5")
    rows = out.collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.k)
    assert {len(v) for v in by_lang.values()} == {25}
    # exact expected set: the 25 smallest (u, key) per stratum
    for lang, got in by_lang.items():
        keys = [k for k in range(4000) if ["en", "fr", "de", "yo"][k % 4] == lang]
        want = [k for _, k in sorted((_md5_u(str(k)), k) for k in keys)[:25]]
        assert sorted(got) == sorted(want), lang
    # partition-invariant
    again = sp.sample_n_per_stratum(
        keyed.repartition(13, "k"), "lang", 25, "k", hash_fn="md5"
    ).collect()
    assert {(r.k, r.lang) for r in again} == {(r.k, r.lang) for r in rows}


def test_sample_n_per_stratum_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(500)] + [(1000 + i, "tiny") for i in range(3)],
        "k long, lang string",
    )
    out = sp.sample_n_per_stratum(df, "lang", 10, "k").collect()
    by_lang: dict[str, int] = {}
    for r in out:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang == {"big": 10, "tiny": 3}  # min(n, |stratum|)


def test_sample_plans_are_scan_local(spark, keyed):
    """sample_fraction / stratified_sample must stay shuffle-free — the
    filter is row-local and belongs on the scan."""
    for df in (
        sp.sample_fraction(keyed, 0.2, "k"),
        sp.stratified_sample(keyed, "lang", {"en": 0.5}, key_col="k"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


# ------------------------------------------------------------------ mixture


def test_mixture_plan_math():
    counts = {"a": 100, "b": 50}
    # equal target halves: feasible total without upsampling = 100
    plan = sp.mixture_plan(counts, {"a": 1, "b": 1})
    assert plan == {"a": pytest.approx(0.5), "b": pytest.approx(1.0)}
    # explicit total
    plan = sp.mixture_plan(counts, {"a": 0.5, "b": 0.5}, total=40)
    assert plan == {"a": pytest.approx(0.2), "b": pytest.approx(0.4)}
    # upsampling allowed: b repeats up to 2 epochs
    plan = sp.mixture_plan(counts, {"a": 0.2, "b": 0.8}, total=100,
                           max_epochs=2)
    assert plan == {"a": pytest.approx(0.2), "b": pytest.approx(1.6)}
    # rate caps at max_epochs (shortfall detectable)
    plan = sp.mixture_plan(counts, {"a": 0.1, "b": 0.9}, total=200,
                           max_epochs=2)
    assert plan["b"] == 2.0
    # zero-weight sources are dropped from the plan
    assert "a" not in sp.mixture_plan(counts, {"a": 0, "b": 1})
    with pytest.raises(ValueError):
        sp.mixture_plan(counts, {"zzz": 1.0})


def test_mixture_sample_exact_md5_mirror(spark):
    rows = [(i, "a" if i < 100 else "b") for i in range(140)]  # 100 a, 40 b
    df = spark.createDataFrame(rows, "k long, src string")
    got = {
        (r.k, r.epoch)
        for r in sp.mixture_sample(
            df, "src", {"a": 0.5, "b": 0.5}, "k",
            total=120, max_epochs=2, hash_fn="md5",
        ).collect()
    }
    # rates: a -> 60/100 = 0.6, b -> 60/40 = 1.5
    expect = set()
    for k, src in rows:
        rate = 0.6 if src == "a" else 1.5
        for e in range(-(-int(rate) // 1) + 1):
            thresh = min(1.0, rate - e)
            if thresh <= 0:
                continue
            if _md5_u(f"{k}\x1f\x1fepoch{e}") < thresh:
                expect.add((k, e))
    assert got == expect
    # every epoch-0 'b' row is present (rate >= 1 => full first epoch)
    assert {(k, 0) for k, s in rows if s == "b"} <= got


def test_mixture_sample_proportions_and_determinism(spark):
    rows = [(i, "big" if i % 5 else "small") for i in range(20000)]
    df = spark.createDataFrame(rows, "k long, src string")
    out = sp.mixture_sample(df, "src", {"big": 0.5, "small": 0.5}, "k")
    agg = {r.src: r.n for r in out.groupBy("src").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # small source (4000 rows) fully kept; big sampled to ~4000
    assert agg["small"] == 4000
    assert abs(agg["big"] - 4000) < 300
    again = sp.mixture_sample(df, "src", {"big": 0.5, "small": 0.5}, "k")
    assert {(r.k, r.epoch) for r in out.collect()} == {
        (r.k, r.epoch) for r in again.collect()
    }


def test_mixture_sample_plan_is_row_local(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, src string")
    out = sp.mixture_sample(df, "src", {"a": 1, "b": 1}, "k", max_epochs=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan and "Join" not in plan
