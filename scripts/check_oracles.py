"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
through DuckDB on the same parquet, then compares row count, column names
and an order-insensitive value multiset.  Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb

import __spark_entry__ as entrymod
from neo4j_graphrag_python_spark.sources.tables import DRIVER_TABLES
from neo4j_graphrag_python_spark.session import build_spark


def normalize(df):
    """pandas → sorted list of value-tuples with stable repr."""
    import math

    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows={len(spark_pdf):7d}  (rows-only, no oracle)")
            continue
        duck_pdf = con.execute(oracles[name]).df()
        sc, sv = normalize(spark_pdf)
        dc, dv = normalize(duck_pdf)
        ok_cols = sc == dc
        ok_rows = len(sv) == len(dv)
        ok_vals = sv == dv
        status = "OK " if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status} rows={len(sv)}/{len(dv)} cols={'=' if ok_cols else f'{sc} vs {dc}'}"
            + ("" if ok_vals else " VALUES-DIFFER")
        )
        if status == "FAIL":
            failures.append(name)
            diff_a = [r for r in sv if r not in set(dv)][:3]
            diff_b = [r for r in dv if r not in set(sv)][:3]
            print("   spark-only:", diff_a)
            print("   duck-only :", diff_b)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
