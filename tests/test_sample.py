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
