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


def dtype_mismatches(spark_pdf, duck_pdf):
    """Integer-vs-float dtype drift between engines.

    The driver's value hash is dtype-sensitive: a Spark BIGINT column and a
    DuckDB column that materializes as float64 (e.g. ``sum(BIGINT)`` →
    HUGEINT → float64 in pandas) hash differently even when every value is
    numerically equal.  This bit us twice (events_sessionize r1,
    corpus_stats_rollup r2), so flag any column where one side is an integer
    dtype and the other is floating — the fix is a ``CAST(... AS BIGINT)``
    in the oracle SQL (or an explicit cast on the Spark side).
    """
    import pandas.api.types as ptypes

    bad = []
    for c in set(spark_pdf.columns) & set(duck_pdf.columns):
        s, d = spark_pdf[c].dtype, duck_pdf[c].dtype
        s_int = ptypes.is_integer_dtype(s)
        d_int = ptypes.is_integer_dtype(d)
        s_flt = ptypes.is_float_dtype(s)
        d_flt = ptypes.is_float_dtype(d)
        if (s_int and d_flt) or (s_flt and d_int):
            bad.append(f"{c}: spark={s} oracle={d}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import os

    if os.environ.get("ORACLE_STOCK_SESSION") == "1":
        # driver-harness simulation: the real gate runs under a STOCK
        # SparkSession (200 shuffle partitions, no session.py tuning) —
        # results must be partitioning-independent there too
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-stock")
            .getOrCreate()
        )
    else:
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
        bad_dtypes = dtype_mismatches(spark_pdf, duck_pdf)
        ok_dtypes = not bad_dtypes
        status = "OK " if (ok_cols and ok_rows and ok_vals and ok_dtypes) else "FAIL"
        print(
            f"{name:28s} {status} rows={len(sv)}/{len(dv)} cols={'=' if ok_cols else f'{sc} vs {dc}'}"
            + ("" if ok_vals else " VALUES-DIFFER")
            + ("" if ok_dtypes else f" DTYPE-DRIFT {bad_dtypes}")
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
