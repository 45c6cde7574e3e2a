"""Fixed schemas for the engine's own tables.

The article schema is the one real schema in the reference system: 7 string
fields extracted by the spider (reference newsspider.py:39-49), confirmed by
the test fixture (apitestmongo.py:24-32) and the API projection (api.py:27-35).
All nullable except ``url`` (the de-facto primary key, README.md:27-28).
"""

from __future__ import annotations

from pyspark.sql import types as T

ARTICLE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("section", T.StringType(), True),
        T.StructField("keywords", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# One row per fetched page: input to admission filters + extraction
# (reference newsspider.py:34-49, index.py:125-134).
RAW_PAGE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("html", T.StringType(), True),
    ]
)

# Crawl frontier / visited state (reference index.py:117-119).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), True),
    ]
)

# Download ledger for the "downloaded m / n" report (reference index.py:199-212).
DOWNLOAD = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)
