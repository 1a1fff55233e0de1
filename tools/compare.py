"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row-count + schema
+ order-insensitive values.

STRICT comparator (round 5): both frames are rendered to canonical
per-cell strings (ints without ``.0``, floats via shortest-round-trip
repr, NULL for missing) and compared EXACTLY — no atol, no dtype
coercion — plus a per-column dtype-KIND parity check (int vs float is a
failure even when the values are numerically equal, because the driver's
hash sees ``123`` vs ``123.0``).  Round 4 proved the need: the previous
lenient compare (check_dtype=False + atol) green-lit four queries whose
DuckDB oracles aggregated integers with ``sum()`` — DuckDB returns
HUGEINT, pandas materializes float64, and the driver's exact hash failed
on all four while this tool said OK.

Usage: python tools/compare.py [--json OUT.json] [sf_dir] [query ...]

With --json, writes a driver-style artifact (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err per query) covering EVERY
registry entry — the committed CORRECTNESS_FULL_r{N}.json evidence for
queries beyond the driver gate's 50-row window.
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from elastic_stream_spark.session import get_spark  # noqa: E402
from elastic_stream_spark.functions.materialize import (  # noqa: E402
    unpersist_materialized,
)
from elastic_stream_spark.sources.envelope import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    """Canonical string for one cell — the comparison currency.  Ints
    render without a decimal point; floats via repr (shortest round-trip,
    so an integral float keeps its ``.0`` and CANNOT collide with an
    int); NULL/NaN uniformly as ``NULL``."""
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:
            return "NULL"
        return repr(f)
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, pd.Timestamp):
        return (v.tz_localize(None) if v.tzinfo else v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if v is pd.NaT or (isinstance(v, float) and v != v):
        return "NULL"
    return str(v)


def _col_kind(s: pd.Series) -> str:
    """Dtype KIND for parity checking: int/float/bool/datetime/str/list/
    decimal/bytes.  Object columns classify by their first non-null
    value; an all-null or empty column is 'unknown' (matches anything —
    there are no values to hash differently)."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    nn = s.dropna()
    if not len(nn):
        return "unknown"
    v = nn.iloc[0]
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, pd.Timestamp):
        return "datetime"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    return "str"


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, every cell rendered canonical, rows sorted
    by all columns — mirrors the driver's sort-columns-then-hash-values
    methodology."""
    df = df[sorted(df.columns)]
    out = pd.DataFrame(
        {c: [_canon_cell(v) for v in df[c].tolist()] for c in df.columns},
        dtype=str,
    )
    if len(out):
        out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out


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
    if len(sdf) != len(odf):
        out["status"] = "ROWCOUNT-MISMATCH"
        return out
    kinds_bad = {}
    for c in sorted(sdf.columns):
        ks, ko = _col_kind(sdf[c]), _col_kind(odf[c])
        if "unknown" not in (ks, ko) and ks != ko:
            kinds_bad[c] = f"spark={ks} oracle={ko}"
    if kinds_bad:
        out["status"] = "DTYPE-MISMATCH"
        out["dtype_diffs"] = kinds_bad
        return out
    a, b = canonicalize(sdf), canonicalize(odf)
    if a.equals(b):
        out["status"] = "OK"
        return out
    out["status"] = "VALUE-MISMATCH"
    neq = (a != b)
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
    """Map a compare result to the driver's CORRECTNESS row shape.
    rows_match is only reported True/False when the comparison actually
    reached the row-count check (None for schema mismatches — unknown)."""
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
    if status == "SCHEMA-MISMATCH":
        return {
            "rows_match": None,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": res.get("spark_rows"),
            "oracle_rows": res.get("oracle_rows"),
            "err": status,
        }
    return {
        "rows_match": status != "ROWCOUNT-MISMATCH",
        "schema_match": True,
        "hash_match": status == "OK",
        "spark_rows": res.get("spark_rows"),
        "oracle_rows": res.get("oracle_rows"),
        "err": None if status == "OK" else status,
    }


def main():
    # --json may appear anywhere; the first non-flag arg is the sf dir,
    # the rest are query-name filters — validated against the registry so
    # a typo (or a misplace flag) fails loudly instead of silently
    # matching zero queries.
    args = sys.argv[1:]
    json_out = None
    pos: list[str] = []
    i = 0
    while i < len(args):
        if args[i].startswith("--json="):
            json_out = args[i].split("=", 1)[1]
            i += 1
        elif args[i] == "--json":
            if i + 1 >= len(args):
                raise SystemExit(
                    "usage: compare.py [--json OUT.json] [sf_dir] [query ...]"
                )
            json_out = args[i + 1]
            i += 2
        else:
            pos.append(args[i])
            i += 1
    sf_dir = pos[0] if pos else "/root/testdata/sf0.001"
    only = set(pos[1:])
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - qs.keys()
    if unknown:
        raise SystemExit(f"unknown query names: {sorted(unknown)}")
    spark = get_spark("compare")
    con = duck_con(sf_dir)
    n_ok = n_bad = 0
    rows: dict[str, dict] = {}
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        # drop persist()-cached intermediates between queries: the dedup
        # family's materializations register with the CacheManager
        # (strong refs until unpersist) and would otherwise pin every
        # cached table for the whole 88-query session, pressuring
        # storage memory for later queries.  Session memos (pair set /
        # CC labels) are localCheckpoints — unaffected.
        spark.catalog.clearCache()
        unpersist_materialized(spark)
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
