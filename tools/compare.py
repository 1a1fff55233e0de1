"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row-count + schema
+ order-insensitive values.

Usage: python tools/compare.py [--json OUT.json] [sf_dir] [query ...]

With --json, writes a driver-style artifact (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err per query) covering EVERY
registry entry — the committed CORRECTNESS_FULL_r{N}.json evidence for
queries beyond the driver gate's 50-row window.
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


def _driver_row(res: dict) -> dict:
    """Map a compare result to the driver's CORRECTNESS row shape."""
    status = res.get("status")
    if status == "rows-only":
        return {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": res.get("spark_rows"),
            "oracle_rows": None,
            "err": "no_oracle",
        }
    if status == "ERROR":
        return {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": res.get("error"),
        }
    return {
        "rows_match": status not in ("ROWCOUNT-MISMATCH",),
        "schema_match": status != "SCHEMA-MISMATCH",
        "hash_match": status == "OK",
        "spark_rows": res.get("spark_rows"),
        "oracle_rows": res.get("oracle_rows"),
        "err": None if status == "OK" else status,
    }


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("compare")
    con = duck_con(sf_dir)
    n_ok = n_bad = 0
    rows: dict[str, dict] = {}
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
        rows[name] = _driver_row(res)
        print(("PASS " if ok else "FAIL ") + str(res), flush=True)
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"wrote {json_out} ({len(rows)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
