"""DuckDB-oracle comparison utilities (shared by tools/check.py and tests).

Mirrors the driver's correctness gate: canonicalize both frames (columns
sorted by name, rows sorted by all columns) and demand exact value equality
— CLOSE (≤1e-9 but not bit-exact) is reported distinctly because the
driver's value-hash would fail on it.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from cuny_courses_spark.sources.loaders import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the driver's view registration.

    Tables absent from ``sf_dir`` are simply not registered (r6: the
    bench's synthetic docs corpora carry only documents/embeddings, and
    the eager view-creation IOException took the whole connection down
    before the query it could have served ever ran). Querying a missing
    table then fails per-query with DuckDB's normal missing-relation
    error — same visibility, correct blast radius.
    """
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(sp: pd.DataFrame, du: pd.DataFrame) -> tuple[str, str]:
    """Returns (status, message); status ∈ {PASS, CLOSE, FAIL}."""
    sp, du = canon(sp), canon(du)
    if list(sp.columns) != list(du.columns):
        return (
            "FAIL",
            f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}",
        )
    if len(sp) != len(du):
        return "FAIL", f"row counts differ: spark={len(sp)} duck={len(du)}"
    dtype_notes = []
    for c in sp.columns:
        s, d = sp[c], du[c]
        if str(s.dtype) != str(d.dtype):
            dtype_notes.append(f"{c}: {s.dtype} vs {d.dtype}")
        is_float = np.issubdtype(s.dtype, np.floating) or np.issubdtype(
            d.dtype, np.floating
        )
        try:
            if is_float:
                sv = s.astype("float64").to_numpy()
                dv = d.astype("float64").to_numpy()
                if not np.array_equal(sv, dv, equal_nan=True):
                    if np.allclose(sv, dv, atol=1e-9, rtol=1e-12, equal_nan=True):
                        return "CLOSE", f"col {c} equal to 1e-9 but not bit-exact"
                    bad = np.nanmax(np.abs(sv - dv)) if len(sv) else 0
                    return "FAIL", f"col {c} max abs diff {bad}"
            else:
                if not s.astype(str).equals(d.astype(str)):
                    mism = (s.astype(str) != d.astype(str)).to_numpy().nonzero()[0][:3]
                    ex = [(c, int(i), s.iloc[i], d.iloc[i]) for i in mism]
                    return "FAIL", f"col {c} value mismatch, e.g. {ex}"
        except Exception as e:
            return "FAIL", f"col {c} compare error: {e}"
    note = ("; dtypes: " + ", ".join(dtype_notes)) if dtype_notes else ""
    return "PASS", f"{len(sp)} rows{note}"
