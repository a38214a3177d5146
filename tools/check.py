"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet tables, canonicalizes both frames (columns sorted by name, rows
sorted by all columns), and reports:

  PASS   — exact value equality (what the driver's value-hash needs)
  CLOSE  — equal within 1e-9 but not bit-exact (hash would FAIL — fix it)
  ROWS   — rows-only query (no oracle): report row count
  FAIL   — shape/type/value mismatch

Usage: python tools/check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from cuny_courses_spark.registry import oracles, queries  # noqa: E402
from cuny_courses_spark.session import get_session  # noqa: E402
from cuny_courses_spark.sources.loaders import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(sp: pd.DataFrame, du: pd.DataFrame) -> tuple[str, str]:
    sp, du = canon(sp), canon(du)
    if list(sp.columns) != list(du.columns):
        return "FAIL", f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return "FAIL", f"row counts differ: spark={len(sp)} duck={len(du)}"
    dtype_notes = []
    for c in sp.columns:
        s, d = sp[c], du[c]
        if str(s.dtype) != str(d.dtype):
            dtype_notes.append(f"{c}: {s.dtype} vs {d.dtype}")
        s_is_float = np.issubdtype(s.dtype, np.floating) or np.issubdtype(
            d.dtype, np.floating
        )
        try:
            if s_is_float:
                sv = s.astype("float64").to_numpy()
                dv = d.astype("float64").to_numpy()
                exact = np.array_equal(sv, dv, equal_nan=True)
                if not exact:
                    close = np.allclose(sv, dv, atol=1e-9, rtol=1e-12, equal_nan=True)
                    if close:
                        return "CLOSE", f"col {c} equal to 1e-9 but not bit-exact"
                    bad = np.nanmax(np.abs(sv - dv)) if len(sv) else 0
                    return "FAIL", f"col {c} max abs diff {bad}"
            else:
                if not s.astype(str).equals(d.astype(str)):
                    mism = (s.astype(str) != d.astype(str)).to_numpy().nonzero()[0][:3]
                    ex = [(c, i, s.iloc[i], d.iloc[i]) for i in mism]
                    return "FAIL", f"col {c} value mismatch, e.g. {ex}"
        except Exception as e:  # dtype coercion failure etc.
            return "FAIL", f"col {c} compare error: {e}"
    note = ("; dtypes: " + ", ".join(dtype_notes)) if dtype_notes else ""
    return "PASS", f"{len(sp)} rows{note}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_session("check")
    con = duck_con(args.sf)
    qs, os_ = queries(), oracles()
    names = args.names or sorted(qs)
    n_pass = n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name:<28} SKIP  (not registered)")
            continue
        t0 = time.time()
        try:
            sp = qs[name](spark, args.sf).toPandas()
        except Exception:
            print(f"{name:<28} FAIL  spark error:")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in os_:
            print(f"{name:<28} ROWS  {len(sp)} rows  ({time.time()-t0:.2f}s)")
            n_pass += 1
            continue
        try:
            du = con.execute(os_[name]).df()
        except Exception as e:
            print(f"{name:<28} FAIL  duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        status, msg = compare(sp, du)
        ok = status in ("PASS",)
        n_pass += ok
        n_fail += not ok
        print(f"{name:<28} {status:<5} {msg}  ({time.time()-t0:.2f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail/close of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
