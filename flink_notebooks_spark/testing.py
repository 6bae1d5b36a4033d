"""Oracle-comparison helpers shared by pytest and tools/verify_local.py.

Mirrors the driver's correctness gate: row count + column names + value
equality on (columns sorted by name, rows sorted by all columns).
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, µs timestamps, int64 ints,
    rows sorted by all columns (stable)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = equal)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return [
            f"columns spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        ]
    if len(spark_pdf) != len(oracle_pdf):
        return [f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}"]
    s, o = canon(spark_pdf), canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = sv.astype("float64")
            ov = ov.astype("float64")
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                problems.append(
                    f"col {c}: {(~eq).sum()} float mismatches, "
                    f"maxdiff={(sv - ov).abs().max():.3e}"
                )
        else:
            sv = sv.astype(object).where(~pd.isna(sv), None)
            ov = ov.astype(object).where(~pd.isna(ov), None)
            neq = [i for i, (x, y) in enumerate(zip(sv, ov)) if x != y]
            if neq:
                i = neq[0]
                problems.append(
                    f"col {c}: {len(neq)} mismatches, first row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r}"
                )
    return problems
