"""S13: parse-JSON source — per-page JSON files whose FILENAME order is
the reading order.

The reference globs ``*.json`` and iterates ``sorted(...)``
(`books/src/loader.py:57-66`), each file holding one parsed page whose
``items`` list is already in reading order (:123-159). The Spark shape:
one distributed ``spark.read.json`` over the glob, the ordering key
recovered from ``input_file_name()`` — positional file order becomes an
explicit column instead of iteration order (the SURVEY §7.3 "explicit
keys, not positions" rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_json_pages(
    spark: SparkSession,
    path_glob: str,
    schema: str | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """Read per-page JSON files → one row per file with (doc_id,
    file_order, …fields). ``doc_id`` = the filename stem; ``file_order``
    = the file's rank in name-sorted order (the reading order key).

    The rank window is over file names only — one row per FILE, so the
    exchange is metadata-sized regardless of page contents.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("multiLine", multi_line).json(path_glob)
    fname = F.input_file_name()
    stem = F.regexp_extract(fname, r"([^/]+)\.json$", 1)
    df = df.withColumn("_file", fname).withColumn("doc_id", stem)
    order = F.dense_rank().over(Window.orderBy("_file")) - 1
    return df.withColumn("file_order", order.cast("long")).drop("_file")
