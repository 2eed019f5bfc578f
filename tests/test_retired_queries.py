"""Registry slots rotated out in rounds 4-5 (rule_range,
stats_percentiles, dedup_exact_duplicates, text_fingerprint,
rule_const, export_purl) remain part of the engine's
public query surface — this is the pytest coverage the rotation comment
in queries.py promises: each retired query still runs AND still
hash-matches its DuckDB oracle SQL, exactly the adjudication it had as
a registry slot, just driven from here instead of the 50-entry driver
contract."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from faang_pydantics_validation_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()

RETIRED = [
    ("rule_range", Q.q_rule_range, Q.SQL_RULE_RANGE),
    ("stats_percentiles", Q.q_stats_percentiles, Q.SQL_STATS_PERCENTILES),
    (
        "dedup_exact_duplicates",
        Q.q_dedup_exact_duplicates,
        Q.SQL_DEDUP_EXACT_DUPLICATES,
    ),
    ("text_fingerprint", Q.q_text_fingerprint, Q.SQL_TEXT_FINGERPRINT),
    ("rule_const", Q.q_rule_const, Q.SQL_RULE_CONST),
    # round-5 rotation: P1's PURL synthesis stays driver-adjudicated
    # inside export_biosample's *_purl columns; the dedicated slot went
    # to classifier_score
    ("export_purl", Q.q_export_purl, Q.SQL_EXPORT_PURL),
]


def _norm(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def _frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    return len(lines), hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name,fn,sql", RETIRED, ids=[r[0] for r in RETIRED])
def test_retired_query_still_hash_matches_its_oracle(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    s_n, s_h = _frame_hash(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = duck.sql(sql)
    d_n, d_h = _frame_hash(rel.columns, rel.fetchall())
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in rel.columns
    )
    assert (s_n, s_h) == (d_n, d_h), f"{name}: {s_n}/{s_h} vs {d_n}/{d_h}"
