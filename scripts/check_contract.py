"""Mimic the driver's correctness gate: run every __spark_entry__ query on
Spark AND its oracle_sql on DuckDB at sf0.01; compare row count, schema
(column names), and sorted values (exact for ints/strings/bools, 1e-9 for
floats). Usage: python scripts/check_contract.py [sf_dir] [query ...]"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from binlogsub_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"schema mismatch: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"]
    if len(got) != len(exp):
        problems.append(f"rowcount mismatch: spark={len(got)} oracle={len(exp)}")
        return problems
    cols = sorted(got.columns)
    g = got[cols].copy()
    e = exp[cols].copy()
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(e[c]) or pd.api.types.is_datetime64_any_dtype(g[c]):
            g[c] = pd.to_datetime(g[c]).astype("datetime64[us]")
            e[c] = pd.to_datetime(e[c]).astype("datetime64[us]")
    g = g.sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = e.sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_float_dtype(e[c]) or pd.api.types.is_float_dtype(g[c]):
            ga = g[c].astype(float).to_numpy()
            ea = e[c].astype(float).to_numpy()
            ok = np.allclose(ga, ea, rtol=0, atol=1e-9, equal_nan=True)
            exact = np.array_equal(ga, ea, equal_nan=True)
            if not ok:
                bad = np.where(~np.isclose(ga, ea, rtol=0, atol=1e-9, equal_nan=True))[0][:3]
                problems.append(f"col {c}: float mismatch at rows {bad.tolist()} spark={ga[bad]} oracle={ea[bad]}")
            elif not exact:
                problems.append(f"col {c}: NOT bit-exact (within 1e-9) — driver hash may fail")
        else:
            if not g[c].astype(object).where(pd.notna(g[c]), None).equals(
                e[c].astype(object).where(pd.notna(e[c]), None)
            ):
                neq = (g[c].astype(str) != e[c].astype(str)).to_numpy().nonzero()[0][:3]
                problems.append(f"col {c}: value mismatch rows {neq.tolist()} spark={g[c].iloc[neq].tolist()} oracle={e[c].iloc[neq].tolist()}")
    return problems


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="contract-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            if len(got) == 0 and name not in ("dedup_simhash",):
                print(f"     WARNING: 0 rows")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(got)} rows, {dt:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"OK   {name} ({len(got)} rows, {dt:.1f}s)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
