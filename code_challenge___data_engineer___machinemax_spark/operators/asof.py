"""As-of join — Spark lacks a native one (guide: 'As-of / range join').

Two implementations with identical semantics (backward as-of: each left row
matched to the latest right row with right_ts <= left_ts, per key):

- ``asof_join``: pure built-ins via the union-tag trick — tag right rows 0
  and left rows 1, sort within key by (ts, tag), and carry the most recent
  right values forward with last(ignorenulls) over a running window. One
  shuffle+sort per join (exactly a sort-merge join's cost), no Python.
- ``asof_join_pandas``: ``applyInPandas`` + ``pd.merge_asof`` per key group
  — the escape hatch when semantics grow beyond what the window trick
  expresses (tolerance windows, nearest-direction). Arrow-batched.

Both keep right-side ties deterministic by pre-deduplicating the right side
to one row per (key, ts) — the max by ``right_seq`` wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dedup_right(right: DataFrame, on: str, right_ts: str, right_seq: str | None) -> DataFrame:
    if right_seq is None:
        return right.dropDuplicates([on, right_ts])
    w = W.partitionBy(on, right_ts).orderBy(F.desc(right_seq))
    return (
        right.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_seq: str | None = None,
) -> DataFrame:
    """Backward as-of join via union-tag + running last(ignorenulls).

    Output: all left columns + ``value_cols`` (NULL when no right row
    precedes) + ``matched_ts`` (the matched right timestamp).
    """
    right = _dedup_right(right, on, right_ts, right_seq)
    left_cols = left.columns

    tagged_left = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    tagged_right = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != on],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows (tag 0) sort before left rows at equal ts -> inclusive <=
    w = W.partitionBy(on).orderBy("__t", "__side").rowsBetween(W.unboundedPreceding, 0)
    carried = unioned.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in value_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("matched_ts"),
    )
    return carried.filter(F.col("__side") == 1).select(
        F.col(on),
        F.col("__t").alias(left_ts),
        *[F.col(c) for c in left_cols if c not in (on, left_ts)],
        *[F.col(f"__m_{c}").alias(c) for c in value_cols],
        "matched_ts",
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_seq: str | None = None,
) -> DataFrame:
    """Same semantics via applyInPandas + pd.merge_asof per key group."""
    import pandas as pd

    right = _dedup_right(right, on, right_ts, right_seq)
    l_sel = left
    r_sel = right.select(on, right_ts, *value_cols)

    out_fields = (
        [(c, left.schema[c].dataType) for c in left.columns]
        + [(c, right.schema[c].dataType) for c in value_cols]
        + [("matched_ts", right.schema[right_ts].dataType)]
    )
    from pyspark.sql import types as T

    out_schema = T.StructType([T.StructField(n, t) for n, t in out_fields])

    tagged = l_sel.withColumn("__side", F.lit(1)).unionByName(
        r_sel.withColumn("__side", F.lit(0)), allowMissingColumns=True
    )

    # plain lists only — closing over the DataFrames would drag the
    # SparkContext into the pickled closure
    left_columns = list(left.columns)
    out_names = [f[0] for f in out_fields]
    value_names = list(value_cols)

    def per_key(pdf: pd.DataFrame):
        lpdf = pdf[pdf["__side"] == 1].sort_values(left_ts)
        rpdf = pdf[pdf["__side"] == 0].sort_values(right_ts)
        rpdf = rpdf[[on, right_ts, *value_names]].rename(columns={right_ts: "matched_ts"})
        if len(lpdf) == 0:
            return pd.DataFrame(columns=out_names)
        merged = pd.merge_asof(
            lpdf[left_columns],
            rpdf.drop(columns=[on]),
            left_on=left_ts,
            right_on="matched_ts",
            direction="backward",
        )
        return merged[out_names]

    return tagged.groupBy(on).applyInPandas(per_key, out_schema)
