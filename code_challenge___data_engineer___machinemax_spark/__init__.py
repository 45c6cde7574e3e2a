"""PySpark-native analytics engine with the capabilities of the reference
news-ETL pipeline (crawl -> cleanse -> store -> keyword search), generalized
to a full batch/streaming relational + training-data-pipeline surface.

Reference: /root/reference (vinodworks/Code-Challenge---Data-Engineer---Machinemax).
The reference delegates querying to MongoDB's text index (api.py:22-26) and
crawling to Scrapy / a BFS loop (newsspider.py, index.py). Here everything is
one engine: Spark DataFrames for dataflow, Parquet for storage, Spark SQL
expressions for the search/query surface.
"""

__version__ = "0.1.0"
