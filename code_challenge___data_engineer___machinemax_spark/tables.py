"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` so Catalyst gets full pushdown/pruning; no
schema inference cost (parquet carries its schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read it as long nanos and convert
        # (floor to micros, matching DuckDB's nanos->micros truncation).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ltz(df)
    return _ltz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _ltz(df: DataFrame) -> DataFrame:
    """Normalize every TIMESTAMP_NTZ column to session-zone TIMESTAMP.

    The testdata has shipped timestamps both as TIMESTAMP(MICROS,
    isAdjustedToUTC=false) — which Spark reads as TIMESTAMP_NTZ — and as
    UTC-adjusted/nanos layouts that land as TIMESTAMP. NTZ breaks epoch
    arithmetic (cast to long / unix_micros are illegal on NTZ) and changes
    toPandas dtypes, so the engine pins one semantic: the session is UTC
    (session.get_spark), where the NTZ->LTZ cast is micros-identity and
    every downstream expression and the DuckDB oracle agree."""
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, suffix: str = "", replace: bool = True
) -> list[str]:
    """Register every testdata table as a temp view (``lineitem``, ``orders``
    ... optionally suffixed) so the whole engine surface is reachable from
    raw ``spark.sql`` — the same contract the DuckDB oracle gets. Returns
    the view names.

    CLOBBERS same-named temp views by default (createOrReplaceTempView) —
    a session mixing its own ``orders`` view loses it. Pass a ``suffix``
    to namespace the views, or ``replace=False`` to keep any view that
    already exists under the name (whatever data it points at)."""
    names = []
    for name in TABLES:
        view = f"{name}{suffix}"
        if not replace and spark.catalog.tableExists(view):
            names.append(view)
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names


def run_sql(spark: SparkSession, sf_dir: str, sql: str, suffix: str = ""):
    """One-call SQL interface: register views (optionally suffixed —
    reference the suffixed names in ``sql`` to avoid clobbering caller
    views), run the statement."""
    register_views(spark, sf_dir, suffix=suffix)
    return spark.sql(sql)
