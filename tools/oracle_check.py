"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir and
compares against ``oracle_sql()`` via DuckDB: row count, column-name set,
and order-insensitive value comparison (columns sorted by name, rows
sorted canonically, floats compared with tight tolerance since the
driver hashes — we also report exact-string equality to flag risk).

Usage:
    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon_cell(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # IEEE -0.0 == 0.0; DuckDB round() keeps the sign of
            # zero (round(-1e-5, 2) = -0.0) where Spark's F.round never
            # emits -0.0 — display noise, not a value divergence (round-8)
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(name: str, spark_df, con) -> dict:
    import __spark_entry__ as entry_mod

    oracle = entry_mod.oracle_sql().get(name)
    t0 = time.time()
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    spark_t = time.time() - t0
    res = {"name": name, "spark_rows": len(spark_rows), "spark_sec": round(spark_t, 2)}
    if oracle is None:
        res["status"] = "ROWS_ONLY"
        return res
    cur = con.execute(oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    res["duck_rows"] = len(duck_rows)
    if sorted(spark_cols) != sorted(duck_cols):
        res["status"] = "SCHEMA_MISMATCH"
        res["spark_cols"] = spark_cols
        res["duck_cols"] = duck_cols
        return res
    if len(spark_rows) != len(duck_rows):
        res["status"] = "ROWCOUNT_MISMATCH"
        return res
    a = canon_rows(spark_cols, [tuple(r) for r in spark_rows])
    b = canon_rows(duck_cols, duck_rows)
    if a == b:
        res["status"] = "MATCH"
    else:
        res["status"] = "VALUE_MISMATCH"
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        res["first_diffs"] = diffs
        res["sorted_cols"] = sorted(spark_cols)
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duck_con(sf_dir)
    failures = 0
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            res = compare(name, fn(spark, sf_dir), con)
        except Exception:
            failures += 1
            print(f"{name}: ERROR\n{traceback.format_exc()}")
            continue
        ok = res["status"] in ("MATCH", "ROWS_ONLY")
        failures += 0 if ok else 1
        print(res)
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
