"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. Queries are broadcast;
  the corpus scan is embarrassingly parallel; per-query top-k via
  window rank. At 100 TB this is one full scan per query batch —
  correct but O(corpus).
- LSH-bucketed ANN: random-hyperplane signature buckets; queries only
  probe their own bucket (plus multiprobe neighbors at distance 1).
  The scale path: corpus bucketed once (write-time partition key),
  each query touches |corpus|/2^bits rows.

Dot products run through F.aggregate/zip_with on double-cast arrays —
JVM-side, no Python. The float→double cast keeps Spark and DuckDB
bit-identical (both then sum left-to-right over the same values).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns. try_divide, not
    `/`: under ANSI mode (Spark 4 default) a single all-zero vector —
    a padding row, a dead image embedding — would throw
    DIVIDE_BY_ZERO and kill the whole job; null drops out of top-k
    rankings instead (desc ordering puts nulls last)."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self), deterministic
    tie-break on corpus id. Queries are broadcast → no shuffle of the
    corpus; the only wide op is the per-query top-k, which Spark runs
    as a windowed rank over query-partitioned rows."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")) + 1e-9, 6).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())  # zero-vector pairs drop out
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy dependency in
    executors — plain python, broadcast as literals)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit j = sign(dot(v, plane_j))."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, arr) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-flat ANN: a KMeans coarse quantizer partitions the corpus
    into n_cells inverted lists; each query exact-reranks only its
    n_probe nearest cells — candidate fraction ≈ n_probe/n_cells of
    the corpus. At 100 TB the cell id is the write-time partition key
    (partition-pruned probes); the quantizer trains on a sample. This
    is the clustered-data complement to ann_lsh_topk: LSH needs no
    training but probes fixed hyperplane buckets; IVF adapts cells to
    the data distribution."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("features", array_to_vector("cvec"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c)
    c_assigned = model.transform(c).select("neighbor_id", "cvec", "cell")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    cent_df = F.broadcast(
        corpus.sparkSession.createDataFrame(
            [(i, v) for i, v in enumerate(centroids)], "cell int, centroid array<double>"
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    # rank cells per query by centroid distance, probe the top n_probe
    qc = q.crossJoin(cent_df).withColumn(
        "dist",
        F.aggregate(
            F.zip_with("qvec", "centroid", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cell")
    probes = qc.withColumn("cr", F.row_number().over(wq)).filter(
        F.col("cr") <= n_probe
    ).select("query_id", "qvec", "cell")

    scored = (
        c_assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")) + 1e-9, 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("cosine").isNotNull())  # zero-vector pairs drop out
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 6,
    tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: exact rerank inside the query's LSH buckets
    across `tables` independent hyperplane tables (+ hamming-1 probe
    buckets per table). One table is rarely enough: per-bit collision
    prob for cosine θ is 1−θ/π, so recall decays as pᵇ — L tables
    recover 1−(1−r)ᴸ. Candidate fraction ≈ tables·(1+bits)/2ᵇⁱᵗˢ of
    the corpus; bits/tables trade recall vs scan cost. Recall is
    contract-tested against cosine_topk in tests/test_llmdata.py.
    At 100 TB the (table, bucket) pair is the corpus partition key so
    each query probe is a partition-pruned read, not a scan."""
    from pyspark.sql import Window

    all_planes = [hyperplanes(dim, bits, seed=42 + t) for t in range(tables)]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).select(
        "neighbor_id",
        "cvec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), lsh_bucket(F.col("cvec"), all_planes[t]).alias("bucket")
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("neighbor_id", "cvec", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).select(
        "query_id",
        "qvec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), lsh_bucket(F.col("qvec"), all_planes[t]).alias("bucket")
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("query_id", "qvec", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("qbucket"))
    if multiprobe:
        probes = F.array(
            F.col("qbucket"), *[F.col("qbucket").bitwiseXOR(F.lit(1 << j)) for j in range(bits)]
        )
        q = q.select("query_id", "qvec", "tbl", F.explode(probes).alias("bucket"))
    else:
        q = q.select("query_id", "qvec", "tbl", F.col("qbucket").alias("bucket"))

    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")) + 1e-9, 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("cosine").isNotNull())  # zero-vector pairs drop out
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
