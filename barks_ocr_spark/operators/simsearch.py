"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k against a query vector.
  The query is a literal folded into the plan (broadcast by value); the
  scan is embarrassingly parallel, the only shuffle is the final top-k
  (a TakeOrdered, not a full sort).
- ``cosine_pairs``: all pairs ≥ threshold, via sign-LSH bucketing so the
  self-join never goes O(n²) across buckets.
- ``lsh_topk``: the scale path — prune with sign-LSH hamming distance,
  then exact-rescore only the surviving fraction.

Dot products use `F.aggregate`/`F.zip_with` on array columns (JVM-side,
no Python). A vectorized Pandas-UDF path is deliberately NOT used here:
the built-ins keep the whole plan in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from barks_ocr_spark.operators.cacheutil import persist_tracked as _persist

def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``query_vec`` over the embeddings table."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    score = cosine(F.col(vec_col).cast("array<double>"), q)
    return (
        embeddings.select(
            F.col(id_col), F.round(score, 6).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


_LCG_M = 2147483647


def plane_weights_int(p: int, dim: int) -> list[int]:
    """Deterministic hyperplane weights in [-1000, 1000] from a pure-
    integer LCG over (plane, dim) — reproducible in ANY engine (the
    DuckDB oracle re-derives the identical literals), no hash functions.
    """
    out = []
    for d in range(dim):
        x = (1103515245 * (p * 8191 + d) + 12345) % _LCG_M
        out.append(int(x % 2001) - 1000)
    return out


def sign_lsh_bits(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Sign-LSH signature: bit p = 1 iff Σ_d w[p][d] · ⌊v[d]·1e6⌋ > 0.

    Two deliberate choices make this cross-engine exact (and thus fully
    oracle-able in ANSI SQL) and cheap:
    - the plane weights are plan-time LITERAL integer arrays (not
      recomputed per row per plane, as the earlier xxhash64 variant did);
    - the dot product is exact integer arithmetic on ⌊v·1e6⌋-quantized
      components, so the sign decision can never diverge between engines
      on summation order (float folds could flip near-zero signs).

    ``dim`` must equal the embedding length (64 for the driver tables).
    The plane loop unrolls at plan-build time.
    """
    vint = F.transform(
        vec, lambda x: F.floor(x.cast("double") * 1_000_000).cast("long")
    )
    total = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(
            *[F.lit(v).cast("long") for v in plane_weights_int(p, dim)]
        )
        pdot = F.aggregate(
            F.zip_with(vint, w, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        total = total + F.when(pdot > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return total


def centroid_ints(c: int, dim: int) -> list[int]:
    """Deterministic IVF centroid ``c`` as integers in [-1000, 1000] —
    same integer-LCG family as :func:`plane_weights_int`, disjoint seed
    space, so ANY engine (the DuckDB oracle included) re-derives the
    identical literals."""
    return plane_weights_int(c + 100_003, dim)


def ivf_cell(vec: Column, n_centroids: int = 16, dim: int = 64) -> Column:
    """IVF-flat cell assignment: argmax_c ⟨⌊v·1e6⌋, centroid_c⟩, ties to
    the lowest cell id (0-based).

    Exact integer arithmetic end to end (quantized components × literal
    integer centroids), so the cell decision can never diverge between
    engines on float summation order. At write time a production table
    stores this cell and is bucketed/partitioned by it, so probes become
    partition pruning; here the column is computed on scan because the
    driver tables carry no cell column.
    """
    vint = F.transform(
        vec, lambda x: F.floor(x.cast("double") * 1_000_000).cast("long")
    )
    scores = []
    for c in range(n_centroids):
        w = F.array(*[F.lit(v).cast("long") for v in centroid_ints(c, dim)])
        scores.append(
            F.aggregate(
                F.zip_with(vint, w, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        )
    arr = F.array(*scores)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def ivf_probe_cells(
    query_vec: list[float], n_centroids: int = 16, nprobe: int = 4
) -> list[int]:
    """The ``nprobe`` cells nearest the query (exact driver-side ints,
    same ordering the SQL oracle derives: score desc, cell id asc)."""
    import math

    dim = len(query_vec)
    qint = [math.floor(float(v) * 1_000_000) for v in query_vec]
    scored = [
        (sum(q * w for q, w in zip(qint, centroid_ints(c, dim))), c)
        for c in range(n_centroids)
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [c for _, c in scored[:nprobe]]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: scan only the ``nprobe`` inverted
    lists nearest the query, exact-rescore their members.

    Scale shape: with the cell column materialized at write time and the
    table partitioned by it, this plan reads nprobe/n_centroids of the
    corpus and touches no shuffle except the final TakeOrdered. With
    nprobe = n_centroids it degrades gracefully to exact brute force
    (pinned by test_ivf_full_probe_equals_brute_force).
    """
    if dim is None:
        dim = len(query_vec)
    probe = ivf_probe_cells(query_vec, n_centroids, nprobe)
    v = F.col(vec_col).cast("array<double>")
    pruned = embeddings.filter(ivf_cell(v, n_centroids, dim).isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = cosine(v, q)
    return (
        pruned.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ivf_write(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    dim: int = 64,
) -> None:
    """Materialize the IVF index: embeddings written partitioned by cell.

    This is the write-time half of the contract :func:`ivf_topk`'s
    docstring promises: cell assignment happens ONCE here, and probes
    become parquet partition pruning — a query touches nprobe/n_centroids
    of the files and never evaluates the centroid argmax at read time.
    Repartitioning by cell before the write gives one file per cell per
    shuffle partition rather than every task writing every cell.
    """
    v = F.col(vec_col).cast("array<double>")
    (
        embeddings.withColumn("cell", ivf_cell(v, n_centroids, dim))
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a materialized IVF index (:func:`ivf_write` output).

    The cell filter is a partition-column predicate, so Catalyst prunes
    to the nprobe probe directories at planning time (PartitionFilters
    in the scan — pinned by test_ivf_indexed_partition_pruning); the
    non-probe (n_centroids - nprobe)/n_centroids of the corpus is never
    read, decoded, or scored."""
    probe = ivf_probe_cells(query_vec, n_centroids, nprobe)
    pruned = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = cosine(F.col(vec_col).cast("array<double>"), q)
    return (
        pruned.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Self-join bucketed on the sign-LSH signature; near-identical vectors
    almost always share it. For exact completeness at lower thresholds,
    raise the hamming budget via lsh_topk-style multi-probe instead.
    """
    v = F.col(vec_col).cast("array<double>")
    with_sig = _persist(  # feeds both self-join sides — compute LSH bits once
        embeddings.select(
            F.col(id_col).alias("vid"), v.alias("v"),
            sign_lsh_bits(v, n_planes, dim).alias("sig"),
        )
    )
    with_sig.count()  # eager: lazy cache would recompute on broadcast side
    a = with_sig.select(
        F.col("vid").alias("id_a"), F.col("v").alias("v_a"), "sig"
    )
    b = with_sig.select(
        F.col("vid").alias("id_b"), F.col("v").alias("v_b"), "sig"
    )
    pairs = a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
    score = cosine(F.col("v_a"), F.col("v_b"))
    return pairs.select(
        "id_a", "id_b", F.round(score, 6).alias("score")
    ).filter(F.col("score") >= threshold)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: prune candidates whose sign-LSH signature is
    > max_hamming bits from the query's, exact-rescore the rest.

    At 10^12 rows the prune typically keeps <1% of the table; the
    rescore is the same exact cosine as brute force, so recall failures
    are visible by diffing against ``brute_force_topk`` on a sample.
    """
    if dim is None:
        dim = len(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    q_sig = sign_lsh_bits(q, n_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    with_sig = embeddings.select(
        F.col(id_col), v.alias("v"), sign_lsh_bits(v, n_planes, dim).alias("sig")
    )
    pruned = with_sig.filter(
        F.bit_count(F.col("sig").bitwiseXOR(q_sig)) <= max_hamming
    )
    score = cosine(F.col("v"), q)
    return (
        pruned.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
