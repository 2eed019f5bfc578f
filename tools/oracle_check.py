"""Dev-loop mirror of the driver's correctness gate: run every queries()
entry in Spark AND its oracle_sql() in DuckDB at sf0.01; compare row
counts and order-insensitive value hashes.

Usage: python tools/oracle_check.py [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return len(lines), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from faang_pydantics_validation_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_n, spark_h = frame_hash(scols, srows)
        if name not in oracles:
            print(f"rows  {name}: {spark_n} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        duck_n, duck_h = frame_hash(dcols, drows)
        ok = (spark_n, spark_h) == (duck_n, duck_h) and sorted(scols) == sorted(dcols)
        status = "ok   " if ok else "FAIL "
        print(
            f"{status} {name}: spark {spark_n}/{spark_h} duck {duck_n}/{duck_h}"
            f" cols={'=' if sorted(scols)==sorted(dcols) else (scols, dcols)}"
            f" [{time.monotonic()-t0:.1f}s]"
        )
        if not ok:
            failures.append(name)
            # show a few differing lines for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = {"\x01".join(norm_cell(r[i]) for i in order_s) for r in srows}
            dset = {"\x01".join(norm_cell(r[i]) for i in order_d) for r in drows}
            for line in list(sset - dset)[:3]:
                print(f"        spark-only: {line!r}")
            for line in list(dset - sset)[:3]:
                print(f"        duck-only:  {line!r}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
