"""Distinct-count sketching with a deterministic, cross-engine hash.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but
its estimate is engine-specific — no external oracle can replay it. The
K-minimum-values sketch (Bar-Yossef et al. 2002) with a deterministic
md5-derived hash gives the same accuracy class AND an exactly
reproducible estimate: any engine hashing the same values produces the
identical k smallest hashes, hence the identical estimate — which is
also the property that makes KMV sketches MERGEABLE across partitions,
days, or engines (union the hash sets, keep the k smallest).

est = (k-1) / h_(k) with h in [0,1) (normalized 32-bit md5 prefix);
exact count when a group holds fewer than k distinct hashes.

Scale shape: the distinct (group, hash) pre-aggregation rides map-side
partial aggregation (the same shuffle an exact countDistinct pays on a
single pass); the k-th order statistic is a per-group window over the
deduped hashes. The sketch's real win at 100 TB is incremental: store
each partition's/day's k-set (k longs) and merge, instead of
re-scanning history for every rollup window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = 4294967296.0  # 2^32 — the normalization denominator


def _hash32(col) -> F.Column:
    """First 8 md5 hex chars as a long in [0, 2^32) — deterministic and
    re-derivable in ANY engine (DuckDB: CAST('0x'||substr(md5(..),1,8)
    AS UBIGINT))."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def _pre_trim_k_smallest(hashes: DataFrame, group_col: str, k: int) -> DataFrame:
    """Narrow (shuffle-free) per-batch trim: keep only the k smallest
    distinct hashes per group within each Arrow batch.

    Any subset-wise k-smallest filter preserves the global k smallest
    distinct hashes, so the downstream distinct+window is unchanged —
    but a giant group now ships ≤ k rows per input batch into the
    shuffle instead of its entire distinct hash set (ADVICE r3 KMV
    shuffle trim; pinned by test_kmv_pre_trim_bounds_shuffle_rows).
    The projection entering the trim is two columns (group, 8-byte
    hash), so the Arrow transfer is small relative to the shuffle it
    removes."""
    from collections.abc import Iterator

    import pandas as pd

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield (
                b.sort_values("_h", kind="mergesort")
                .drop_duplicates([group_col, "_h"])
                .groupby(group_col, sort=False)
                .head(k)
            )

    return hashes.mapInPandas(_gen, hashes.schema)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 16,
    pre_trim: bool = True,
) -> DataFrame:
    """(group, est_distinct): KMV distinct-count estimate of
    ``value_col`` per group, deterministic across engines/runs/
    partitionings.

    ``pre_trim`` inserts a narrow per-batch k-smallest filter before
    the global shuffle (see _pre_trim_k_smallest) — identical result,
    bounded shuffle. Disable for tiny inputs where the extra Arrow
    stage costs more than it saves."""
    hashes = df.select(
        F.col(group_col), _hash32(F.col(value_col)).alias("_h")
    )
    if pre_trim:
        hashes = _pre_trim_k_smallest(hashes, group_col, k)
    hashes = hashes.distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    ranked = hashes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    per = ranked.groupBy(group_col).agg(
        F.count("*").alias("_n"), F.max("_h").alias("_hk")
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("_hk").cast("double") / F.lit(_HASH_SPACE))
    )
    return per.select(group_col, F.round(est, 6).alias("est_distinct"))
