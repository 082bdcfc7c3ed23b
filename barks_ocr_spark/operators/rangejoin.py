"""Banded range join: point-in-interval joins that scale.

``point JOIN intervals ON lo <= x < hi`` has no hash key, so Spark
plans it as a (broadcast) nested-loop — fine for a broadcast-sized
interval dim, quadratic disaster when both sides are large. The banded
form restores a hash key: pick a band width w, explode each interval
to one row per w-aligned band it overlaps, map each point to its single
band, equi-join on the band, then re-check the exact predicate. A point
matches an interval in exactly one band (its own), so no dedup pass is
needed; the shuffle is the same hash exchange a plain equi-join pays,
sized by points + Σ interval_width/w.

Pick w near the median interval width: too small multiplies the
interval side, too large turns bands into skewed mini-cross-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    x_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``lo <= x < hi`` (half-open), via band-key equi-join — never a
    nested loop. Returns all point columns + all interval columns."""
    w = float(band_width)
    p = points.withColumn("_band", F.floor(F.col(x_col) / w).cast("long"))
    i = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive, so floor(hi/w) can be one band past
                # the interval's end — kept anyway: one spurious
                # candidate band per interval is cheaper than an
                # epsilon hack that silently loses matches at large
                # magnitudes, and the exact post-filter removes it
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    joined = p.join(i, "_band").filter(
        (F.col(x_col) >= F.col(lo_col)) & (F.col(x_col) < F.col(hi_col))
    )
    return joined.drop("_band")
