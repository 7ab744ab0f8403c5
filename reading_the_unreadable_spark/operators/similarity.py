"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the probe vector(s), fold the dot
  product with native ``zip_with``/``aggregate`` (JVM-side, no Python) —
  the baseline that always works.
- sign-LSH bucketed ANN: bucket vectors by the sign pattern of leading
  dimensions (a deterministic random-hyperplane stand-in), equi-join
  probes to candidates on the bucket, then rank within bucket.  This is
  the 100 TB path: the self-join key is the bucket, never a cross join.

All arithmetic is promoted to double with a fixed fold order so the
DuckDB oracle (list_cosine_similarity over DOUBLE[]) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force top-k by cosine to the embedding of ``query_vec_id``
    (broadcast single-row probe; excludes the probe itself)."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        _as_double(F.col("embedding")).alias("qvec")
    )
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(_as_double(F.col("embedding")), F.col("qvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    # top-k via TakeOrdered (distributed partial top-k per partition, no
    # single-partition global window); rank is then assigned on k rows.
    topk = scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)
    # lit(1) partition key: same single-partition execution over the k rows,
    # without WindowExec's no-partition warning flooding logs
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", "label", "cos_sim"
    )


def sign_bucket(v: Column, n_dims: int = 4) -> Column:
    """Deterministic LSH bucket: sign bits of the first n_dims components."""
    parts = [
        F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_dims)
    ]
    return F.concat(*parts)


def ann_lsh_topk(
    embeddings: DataFrame, n_probes: int = 10, k: int = 3, n_dims: int = 4
) -> DataFrame:
    """Bucketed approximate top-k: probes = vec_id < n_probes; candidates
    share the probe's sign bucket.  Output (probe_id, rank, vec_id, cos)."""
    base = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("vec"),
        sign_bucket(F.col("embedding"), n_dims).alias("bucket"),
    )
    probes = base.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("vec").alias("pvec"),
        "bucket",
    )
    cand = base.select(F.col("vec_id"), F.col("vec"), "bucket")
    scored = (
        F.broadcast(probes)
        .join(cand, "bucket")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine(F.col("pvec"), F.col("vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "vec_id", "cos_sim")
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid, one row per (label, dim) — IVF coarse-quantizer
    training step expressed as posexplode + groupBy."""
    return (
        embeddings.select(
            "label", F.posexplode(_as_double(F.col("embedding"))).alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("centroid"), F.count("*").alias("n_vecs"))
    )
