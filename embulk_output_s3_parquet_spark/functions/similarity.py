"""Similarity search over an embedding column (task brief): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH bucketing as the
scale path, and embedding-cosine near-duplicate pairs.

Dot products run in ``F.aggregate``/``F.zip_with`` -- JVM expressions over
``array<float>``, no Python. The LSH path reduces a 100 TB all-pairs problem
to per-bucket joins: shuffle volume is rows x 1 bucket key instead of rows^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine vs a literal query vector.

    Scan-parallel, then a k-row final ordering -- the baseline ANN answers
    are measured against."""
    q = F.array(*[F.lit(float(x)) for x in query])
    sim = F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4)
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def hyperplane_bucket(
    vec_col: str, planes: list[list[float]]
) -> Column:
    """Sign-pattern bucket id from fixed random hyperplanes (SRP-LSH)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(F.col(vec_col).cast("array<double>"), arr) >= 0, 1).otherwise(0)
        bucket = bucket + (bit.cast("long") * F.lit(2**i).cast("long"))
    return bucket


def lsh_topk(
    df: DataFrame,
    query: list[float],
    planes: list[list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket.
    At scale the bucket column is a partition/cluster key, so the scan
    prunes to ~1/2^planes of the data."""
    import numpy as np

    qb = 0
    for i, p in enumerate(planes):
        if float(np.dot(np.asarray(p), np.asarray(query))) >= 0:
            qb += 2**i
    q = F.array(*[F.lit(float(x)) for x in query])
    bucketed = df.withColumn("bucket", hyperplane_bucket(vec_col, planes))
    sim = F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4)
    return (
        bucketed.filter(F.col("bucket") == qb)
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (argmax dot product -- centroids are expected L2-normalized-ish).

    Centroids are literal arrays, so assignment is pure JVM expressions; at
    scale the cluster id becomes a partition/cluster key and queries probe
    only `nprobe` cells."""
    v = F.col(vec_col).cast("array<double>")
    best_id = F.lit(0)
    best_dot = dot(v, F.array(*[F.lit(float(x)) for x in centroids[0]]))
    for i, c in enumerate(centroids[1:], start=1):
        d = dot(v, F.array(*[F.lit(float(x)) for x in c]))
        best_id = F.when(d > best_dot, F.lit(i)).otherwise(best_id)
        best_dot = F.greatest(d, best_dot)
    return df.withColumn("ivf_cell", best_id.cast("int"))


def ivf_centroids_from_sample(
    df: DataFrame, n_cells: int = 16, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic coarse centroids: the first n_cells vectors by id
    (a seeded-sample stand-in for k-means; the Spark-side plumbing --
    assignment, cell pruning -- is identical either way)."""
    rows = (
        df.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score only vectors in the query's `nprobe` nearest cells."""
    import numpy as np

    q = np.asarray(query)
    dots = [float(np.dot(q, np.asarray(c))) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: -dots[i])[:nprobe]
    assigned = ivf_assign(df, centroids, vec_col)
    qcol = F.array(*[F.lit(float(x)) for x in query])
    sim = F.round(cosine(F.col(vec_col).cast("array<double>"), qcol), 4)
    return (
        assigned.filter(F.col("ivf_cell").isin(probe))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs. With ``planes`` the join is bucketed
    (scale path, may miss cross-bucket pairs); without, exact all-pairs."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    if planes:
        base = base.withColumn("bucket", hyperplane_bucket("v", planes))
        join_keys = ["bucket"]
        a = base.select(*join_keys, F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(*join_keys, F.col("id").alias("id_b"), F.col("v").alias("vb"))
        joined = a.join(b, join_keys)
    else:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        joined = a.crossJoin(b)
    sim = F.round(dot(F.col("va"), F.col("vb")) / (norm(F.col("va")) * norm(F.col("vb"))), 6)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
