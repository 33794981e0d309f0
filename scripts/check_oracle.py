#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB at the
given scale factor, then compare row count, column names, and values
(order-insensitive, exact after each query's own rounding).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from time_series_data_trimmer_spark.session import TABLES, get_spark

_args = [a for a in sys.argv[1:] if not a.startswith("--json")]
_json_out = next(
    (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
)
for _a in sys.argv[1:]:
    # A bare "--json" (no =path) would be silently filtered out of the
    # positionals and produce no report file — fail loudly (ADVICE r10).
    if _a.startswith("--json") and not _a.startswith("--json="):
        sys.exit(f"check_oracle: {_a!r} has no output path — use --json=PATH")
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rows {len(got)} vs oracle {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"cols {sorted(got.columns)} vs {sorted(want.columns)}")
        return problems
    if problems:
        return problems
    # dtype agreement: the driver's schema compare may be type-strict
    for c in sorted(got.columns):
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        gi, wi = got[c].dtype.itemsize, want[c].dtype.itemsize
        if (gk, gi) != (wk, wi) and not (gk == wk == "O"):
            problems.append(f"dtype {c}: spark {got[c].dtype} vs oracle {want[c].dtype}")
    if problems:
        return problems
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
            gv = gv.astype(float)
            wv = wv.astype(float)
            both_nan = np.isnan(gv) & np.isnan(wv)
            neq = ~both_nan & (gv != wv)
            if neq.any():
                i = int(np.argmax(neq))
                maxdiff = np.nanmax(np.abs(gv[neq] - wv[neq]))
                problems.append(
                    f"col {c}: {int(neq.sum())} value mismatches "
                    f"(first at row {i}: {gv[i]!r} vs {wv[i]!r}; maxdiff {maxdiff:g})"
                )
        else:
            neq = gv != wv
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches (first {gv[i]!r} vs {wv[i]!r})"
                )
    return problems


def main() -> int:
    spark = get_spark("oracle-check")
    con = duck_connect(SF_DIR)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            results[name] = {"ok": False, "problems": [f"spark error: {exc}"[:300]]}
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            results[name] = {"ok": True, "rows_only": True, "rows": len(got)}
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            results[name] = {"ok": False, "problems": [f"duckdb error: {exc}"[:300]]}
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(got)} rows match ({time.time()-t0:.1f}s)")
        results[name] = {
            "ok": not problems,
            "rows": len(got),
            "sec": round(time.time() - t0, 2),
            "problems": problems or None,
        }
    if _json_out:
        import json

        with open(_json_out, "w") as fh:
            json.dump(
                {"sf_dir": SF_DIR, "failures": failures, "results": results},
                fh,
                indent=1,
            )
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
