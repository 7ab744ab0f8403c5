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


# -------------------------- random-hyperplane LSH with multiprobe (scale ANN)
# Deterministic hyperplane weights shared bit-for-bit with the DuckDB
# oracle: at 2^n_bits buckets the candidate set per probe is ~n/2^bits of
# the corpus, and Hamming-1 multiprobe recovers the recall a single
# bucket loses — the standard production trade (more planes = smaller
# buckets, more probes = recall back).
ANN_BITS = 12
ANN_DIM = 64
_ANN_SEED = 20260816


def _gen_planes(n_bits: int = ANN_BITS, dim: int = ANN_DIM) -> list[list[float]]:
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(_ANN_SEED))
    # round to 6dp so the literals embed identically in Spark and SQL
    return [[round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(n_bits)]


HYPERPLANES = _gen_planes()


def hyperplane_bucket(v: Column, planes: list[list[float]] | None = None) -> Column:
    """Integer LSH bucket: bit i = sign of the projection onto plane i.
    The projection is a left-fold dot product (same association order as
    the oracle's explicit sum, so the sign is bit-reproducible)."""
    planes = planes or HYPERPLANES
    bucket = F.lit(0).cast("int")
    for i, p in enumerate(planes):
        proj = dot(v, F.array(*[F.lit(w) for w in p]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_multiprobe_topk(
    embeddings: DataFrame, n_probes: int = 10, k: int = 3
) -> DataFrame:
    """ANN top-k via random-hyperplane LSH + Hamming-1 multiprobe:
    candidates live in ONE bucket each; every probe searches its own
    bucket plus the ``ANN_BITS`` buckets one bit-flip away (explode on
    the probe side — the small side — never the corpus side).  The join
    is a bucket equi-join with the probe side broadcast: per-probe work
    is ~(bits+1)·n/2^bits candidates, independent of corpus pair count."""
    base = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("vec"),
        hyperplane_bucket(_as_double(F.col("embedding"))).alias("bucket"),
    )
    flips = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(ANN_BITS)],
    )
    probes = (
        base.filter(F.col("vec_id") < n_probes)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("vec").alias("pvec"),
            F.explode(flips).alias("bucket"),
        )
    )
    scored = (
        F.broadcast(probes)
        .join(base, "bucket")
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


def ann_multiprobe_oracle_sql(n_probes: int = 10, k: int = 3) -> str:
    """DuckDB replica: identical plane literals, identical left-to-right
    projection sums, identical multiprobe bucket list."""
    projs = []
    for p in HYPERPLANES:
        terms = " + ".join(
            f"(embedding[{j + 1}]::DOUBLE * ({w!r}))" for j, w in enumerate(p)
        )
        projs.append(f"({terms})")
    bucket = " + ".join(
        f"(CASE WHEN {proj} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, proj in enumerate(projs)
    )
    flip_list = ", ".join(f"xor(bucket, {1 << i})" for i in range(ANN_BITS))
    return f"""
        WITH base AS (
          SELECT vec_id, embedding::DOUBLE[] AS vec, ({bucket}) AS bucket
          FROM embeddings),
        probes AS (
          SELECT vec_id AS probe_id, vec AS pvec,
                 unnest([bucket, {flip_list}]) AS bucket
          FROM base WHERE vec_id < {n_probes}),
        scored AS (
          SELECT p.probe_id, c.vec_id,
                 round(list_cosine_similarity(p.pvec, c.vec), 6) AS cos_sim
          FROM probes p JOIN base c ON p.bucket = c.bucket
          WHERE p.probe_id != c.vec_id)
        SELECT probe_id, rank::INT AS rank, vec_id, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored) WHERE rank <= {k}
    """


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


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space dedup
    variant: candidates are generated by the hyperplane-LSH bucket
    (Hamming-1 multiprobe on the replicated side, so pairs whose buckets
    differ by one sign bit are still found), then gated by exact cosine ≥
    threshold.  Join key is the bucket — pair space is Σ over buckets of
    |bucket|·(bits+1), never n²."""
    base = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("vec"),
        hyperplane_bucket(_as_double(F.col("embedding"))).alias("bucket"),
    )
    flips = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(ANN_BITS)],
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("vec").alias("vec_b_v"),
        F.explode(flips).alias("bucket"),
    )
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("vec_a_v"), "bucket")
    cos = F.round(cosine(F.col("vec_a_v"), F.col("vec_b_v")), 6)
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_oracle_sql(threshold: float = 0.95) -> str:
    projs = []
    for p in HYPERPLANES:
        terms = " + ".join(
            f"(embedding[{j + 1}]::DOUBLE * ({w!r}))" for j, w in enumerate(p)
        )
        projs.append(f"({terms})")
    bucket = " + ".join(
        f"(CASE WHEN {proj} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, proj in enumerate(projs)
    )
    flip_list = ", ".join(f"xor(bucket, {1 << i})" for i in range(ANN_BITS))
    return f"""
        WITH base AS (
          SELECT vec_id, embedding::DOUBLE[] AS vec, ({bucket}) AS bucket
          FROM embeddings),
        b AS (
          SELECT vec_id AS vec_b, vec AS vec_b_v,
                 unnest([bucket, {flip_list}]) AS bucket
          FROM base)
        SELECT a.vec_id AS vec_a, b.vec_b,
               round(list_cosine_similarity(a.vec, b.vec_b_v), 6) AS cos_sim
        FROM base a JOIN b ON a.bucket = b.bucket
        WHERE a.vec_id < b.vec_b
          AND round(list_cosine_similarity(a.vec, b.vec_b_v), 6) >= {threshold}
    """


# ----------------------------------------------------------------- IVF ANN
def _cell_vectors(embeddings: DataFrame) -> DataFrame:
    """Coarse-quantizer cells: per-label centroid VECTORS (label, cvec).
    6dp-rounded per dimension so Spark's partial-agg averaging and the
    oracle's single-pass averaging agree exactly."""
    return (
        label_centroids(embeddings)
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "centroid"))),
                lambda s: s["centroid"],
            ).alias("cvec")
        )
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    n_probes: int = 10,
    k: int = 3,
    nprobe_cells: int = 2,
) -> DataFrame:
    """IVF approximate top-k — the inverted-file scale path:

    1. train the coarse quantizer (per-label centroid cells — at real
       scale a k-means loop over a sample; cells stay tiny and are
       BROADCAST);
    2. assign every vector to its nearest cell (broadcast join + rank,
       one pass over the corpus);
    3. probes search only their ``nprobe_cells`` closest cells' inverted
       lists — the classic recall/cost dial.

    Per-probe work is nprobe_cells/n_cells of the corpus, never all of
    it; the big side is touched by exactly one broadcast-join pass for
    assignment and one bucket equi-join for search."""
    cells = _cell_vectors(embeddings).select(
        F.col("label").alias("cell"), "cvec"
    )
    base = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("vec"))
    sim_to_cell = F.round(cosine(F.col("vec"), F.col("cvec")), 6)
    scored_cells = base.join(F.broadcast(cells)).select(
        "vec_id", "vec", "cell", sim_to_cell.alias("cell_sim")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cell_sim"), F.asc("cell")
    )
    ranked = scored_cells.withColumn("cell_rank", F.row_number().over(w_assign))
    assigned = ranked.filter(F.col("cell_rank") == 1).select(
        "vec_id", "vec", "cell"
    )
    probe_cells = (
        ranked.filter(
            (F.col("vec_id") < n_probes) & (F.col("cell_rank") <= nprobe_cells)
        )
        .select(F.col("vec_id").alias("probe_id"), F.col("vec").alias("pvec"), "cell")
    )
    scored = (
        F.broadcast(probe_cells)
        .join(assigned, "cell")
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


def ann_ivf_oracle_sql(
    n_probes: int = 10, k: int = 3, nprobe_cells: int = 2, dim: int = ANN_DIM
) -> str:
    return f"""
        WITH cents AS (
          SELECT label, d,
                 round(avg(embedding[d]::DOUBLE), 6) AS c
          FROM embeddings, (SELECT unnest(generate_series(1, {dim})) AS d)
          GROUP BY label, d),
        cells AS (
          SELECT label AS cell, list(c ORDER BY d) AS cvec
          FROM cents GROUP BY label),
        scored_cells AS (
          SELECT e.vec_id, e.embedding::DOUBLE[] AS vec, c.cell,
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6)
                   AS cell_sim
          FROM embeddings e, cells c),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY cell_sim DESC, cell) AS cell_rank
          FROM scored_cells),
        assigned AS (
          SELECT vec_id, vec, cell FROM ranked WHERE cell_rank = 1),
        probe_cells AS (
          SELECT vec_id AS probe_id, vec AS pvec, cell
          FROM ranked WHERE vec_id < {n_probes} AND cell_rank <= {nprobe_cells}),
        scored AS (
          SELECT p.probe_id, a.vec_id,
                 round(list_cosine_similarity(p.pvec, a.vec), 6) AS cos_sim
          FROM probe_cells p JOIN assigned a ON p.cell = a.cell
          WHERE p.probe_id != a.vec_id)
        SELECT probe_id, rank::INT AS rank, vec_id, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored) WHERE rank <= {k}
    """
