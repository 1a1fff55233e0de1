"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row-count + schema
+ order-insensitive values.

Usage: python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from elastic_stream_spark.session import get_spark  # noqa: E402
from elastic_stream_spark.sources.envelope import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare_one(name, qfn, sql, spark, con, sf_dir) -> dict:
    t0 = time.time()
    sdf = qfn(spark, sf_dir).toPandas()
    t_spark = time.time() - t0
    out = {"name": name, "spark_rows": len(sdf), "spark_s": round(t_spark, 2)}
    if sql is None:
        out["status"] = "rows-only"
        return out
    t0 = time.time()
    odf = con.sql(sql).df()
    out["duck_s"] = round(time.time() - t0, 2)
    out["oracle_rows"] = len(odf)
    if sorted(sdf.columns) != sorted(odf.columns):
        out["status"] = "SCHEMA-MISMATCH"
        out["spark_cols"] = sorted(sdf.columns)
        out["oracle_cols"] = sorted(odf.columns)
        return out
    a, b = normalize(sdf), normalize(odf)
    if len(a) != len(b):
        out["status"] = "ROWCOUNT-MISMATCH"
        return out
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
        out["status"] = "OK"
    except AssertionError as e:
        out["status"] = "VALUE-MISMATCH"
        out["detail"] = str(e).split("\n")[0:6]
        # show first differing rows
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            out["first_diff"] = {
                "row": int(i),
                "spark": a.loc[i].to_dict(),
                "oracle": b.loc[i].to_dict(),
            }
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("compare")
    con = duck_con(sf_dir)
    n_ok = n_bad = 0
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        try:
            res = compare_one(name, qfn, oracles.get(name), spark, con, sf_dir)
        except Exception as e:
            res = {"name": name, "status": "ERROR", "error": repr(e)[:500]}
        ok = res.get("status") in ("OK", "rows-only")
        n_ok += ok
        n_bad += not ok
        print(("PASS " if ok else "FAIL ") + str(res), flush=True)
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
