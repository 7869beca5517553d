"""Raw-file lake readers (SURVEY.md §2.1 S7/S8, §2.3 J4).

The reference reads lake documents INSIDE its UDF — ``open(file_path)`` per
row (``spark/lib/utils.py:22-30``) with a broken container-path rewrite hack
(``utils.py:24-27``). The engine inverts this: documents are scanned by Spark
itself (``spark.read.text(wholetext)`` / ``binaryFile``), keyed by
``input_file_name()``, and JOINED to metadata — the lake↔metadata equi-join
the reference performed implicitly (J4). Path resolution happens at scan
planning, not per row in Python.

Scale: ``wholetext`` makes one row per file (no splitting) — right for
document corpora of many small files; for large files or many-millions-of-
files layouts, the parquet lake (sources/tables.write_partitioned) is the
primary representation and this reader is the ingest edge that feeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_text_lake", "read_binary_lake", "join_lake_to_metadata"]


def read_text_lake(spark: SparkSession, glob_path: str) -> DataFrame:
    """(file_path, content) rows, one per file, read as whole text."""
    return (
        spark.read.option("wholetext", True)
        .text(glob_path)
        .select(F.input_file_name().alias("file_path"), F.col("value").alias("content"))
    )


def read_binary_lake(spark: SparkSession, glob_path: str) -> DataFrame:
    """(file_path, content bytes, length, modificationTime) via the
    binaryFile source — the multimodal ingest edge."""
    return (
        spark.read.format("binaryFile")
        .load(glob_path)
        .select(
            F.col("path").alias("file_path"),
            F.col("content"),
            F.col("length"),
            F.col("modificationTime"),
        )
    )


def join_lake_to_metadata(
    lake: DataFrame, metadata: DataFrame, on: str = "file_path"
) -> DataFrame:
    """J4 made explicit: metadata rows ⋈ document content on the path key.
    The metadata side carries the catalog columns; the lake side the payload.
    Catalyst broadcasts whichever side is small."""
    return metadata.join(lake, on=on, how="left")
