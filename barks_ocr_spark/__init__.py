"""barks_ocr_spark — a PySpark-native document-extraction analytics engine.

A from-scratch rebuild of the *capabilities* of the reference extraction
system (glk1001/barks-ocr): interleaved text+media document extraction
(boilerplate strip, OCR-noise repair, hyphenation/paragraph merge,
reading-order span emission), comic-page box grouping / panel assignment,
inverted full-text index, entity tagging, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text stats).

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
with vectorized pandas/Arrow kernels (mapInPandas / pandas_udf) for the
non-relational text/geometry work. No RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
