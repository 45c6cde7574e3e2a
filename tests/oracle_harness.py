"""Local mirror of the driver's correctness gate: run each registered query
in Spark and its oracle SQL in DuckDB over the same parquet dir; compare
column names, row count, and the driver-style canonicalized values.

The driver's compare (CORRECTNESS_r*.json) materializes BOTH sides as pandas
frames, sorts columns by name, sorts rows, then stringifies cells with their
dtypes intact before hashing. That makes it dtype-sensitive: DuckDB returns
integer SUMs as HUGEINT which pandas materializes as float64 ("6533.0"),
while Spark emits int64 ("6533") — a value-identical result still fails.
It also crashes on list-typed cells (unhashable in the pandas sort).
Round 1 used a value-normalizing compare here, which masked both failure
classes (VERDICT r1 "What's wrong" #4) — this version reproduces the
driver's behavior so the local gate goes red before the driver does.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from code_challenge___data_engineer___machinemax_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# --- value-normalizing canonical form (golden corpus only) ------------------
# The golden files pin DuckDB rows via fetchall() and are replayed by Spark
# with no DuckDB in the loop; _norm smooths Python-value representation drift
# (Decimal vs float, date vs datetime). The DRIVER gate compare below is
# intentionally NOT normalizing — do not use it for driver-parity checks.


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through a fixed precision so double formatting quirks
        # (not value differences) can't fail the compare
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def normalized_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: lower-cased columns sorted by name, rows
    sorted by every column (raises on unhashable cells, exactly like the
    driver), cells stringified WITH dtypes intact."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols).reset_index(drop=True)
    return pdf.astype(str)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    o_pdf = con.sql(sql).df()
    s_pdf = spark_df.toPandas()
    s_cols = sorted(c.lower() for c in s_pdf.columns)
    o_cols = sorted(c.lower() for c in o_pdf.columns)
    if s_cols != o_cols:
        return False, f"columns differ: spark={s_cols} oracle={o_cols}"
    if len(s_pdf) != len(o_pdf):
        return False, f"row counts differ: spark={len(s_pdf)} oracle={len(o_pdf)}"
    try:
        sn = canonicalize(s_pdf)
        on = canonicalize(o_pdf)
    except TypeError as e:  # unhashable cell (list/dict) — driver errors too
        return False, f"canonicalization failed (driver would ERR): {e}"
    if not sn.equals(on):
        neq = (sn != on).any(axis=1)
        bad = neq[neq].index[:3]
        diffs = [
            (i, {c: (sn.at[i, c], on.at[i, c]) for c in sn.columns if sn.at[i, c] != on.at[i, c]})
            for i in bad
        ]
        return False, f"values differ; first diffs {diffs}"
    return True, "ok"
