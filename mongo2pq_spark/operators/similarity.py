"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query set is broadcast, so cost is |queries| × |corpus| dot
  products with no shuffle on the corpus side; fine for small query
  sets at any corpus size.
- ``embedding_near_dup_pairs``: all-pairs above a cosine threshold —
  quadratic, for modest corpora / verification.
- ``lsh_bucket_assignments`` / ``lsh_topk``: random-hyperplane LSH —
  the scale path. Each vector lands in one of 2^H buckets; candidate
  search becomes an equi-join on the bucket id. Hyperplanes are
  deterministic (fixed-seed LCG), so results are reproducible and
  oracle-checkable.

All math is built-in higher-order functions (JVM codegen); no Python
UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2pq_spark.functions.hashing import _lcg
from mongo2pq_spark.functions.vectors import cosine, dot

DEFAULT_HYPERPLANES = 16


def hyperplanes(n: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim (fixed
    LCG — the same constants are baked into oracle SQL)."""
    gen = _lcg(seed)
    return [
        [(next(gen) % 2_000_001) / 1_000_000.0 - 1.0 for _ in range(dim)]
        for _ in range(n)
    ]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).

    Similarity is rounded to 6 dp BEFORE ranking so ordering is stable
    across engines; ties break on neighbor id.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("query_vec"), F.col("vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (vec_a < vec_b)."""
    a = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def lsh_bucket_column(
    vec_col: Column,
    n_hyperplanes: int = DEFAULT_HYPERPLANES,
    dim: int = 64,
    seed: int = 7,
) -> Column:
    """sign-bucket id as a plain Column expression (bit h set ⇔
    dot(v, hyperplane_h) > 0) — attachable in-place with zero shuffles."""
    planes = hyperplanes(n_hyperplanes, dim, seed)
    bucket = None
    for h, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(c) for c in plane])
        bit = F.when(
            dot(vec_col, plane_col) > 0, F.lit(1).cast("bigint") * (1 << h)
        ).otherwise(F.lit(0).cast("bigint"))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_bucket_assignments(
    df: DataFrame,
    n_hyperplanes: int = DEFAULT_HYPERPLANES,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """vector → sign-bucket id (narrow projection, no shuffle)."""
    return df.select(
        F.col(id_col),
        lsh_bucket_column(F.col(vec_col), n_hyperplanes, dim, seed).alias("bucket"),
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: int = 10_000,
) -> DataFrame:
    """IVF-style ANN: a KMeans coarse quantizer (Spark ML, fixed seed)
    partitions the corpus into inverted lists; each query probes its
    ``n_probe`` nearest centroids and ranks exact cosine only within
    those lists.

    Scale shape: training runs on a bounded sample; assignment is a
    narrow projection; the probe join is an equi-join on cluster id —
    cost ≈ n_probe/n_clusters of brute force. Results are
    deterministic (fixed seed + fixed init) but approximate, so this
    registers as a rows-only check; recall vs brute force is asserted
    in tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import Window

    corpus_vec = df.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    # train the quantizer on a bounded, DETERMINISTIC sample (ordered
    # limit), never the full corpus — 20 KMeans passes over 100 TB
    # would dwarf the search itself; assignment still covers every row
    train = corpus_vec.orderBy(id_col).limit(max_train_rows)
    model = KMeans(k=n_clusters, seed=seed, maxIter=20).fit(train)
    assigned = model.transform(corpus_vec).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("prediction").alias("cluster"),
    )

    centroids = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroid_rows = df.sparkSession.createDataFrame(
        centroids, "cluster int, centroid array<double>"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # each query ranks centroids by distance, keeps n_probe lists
    q_cent = q.crossJoin(F.broadcast(centroid_rows)).select(
        "query_id",
        "qv",
        "cluster",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.col("centroid"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("dist"),
    )
    w_probe = Window.partitionBy("query_id").orderBy("dist", "cluster")
    probed = (
        q_cent.withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "qv", "cluster")
    )
    sims = (
        probed.join(assigned, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    n_hyperplanes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket, then exact
    cosine ranks within bucket. Recall < 1 by construction; use
    fewer hyperplanes (bigger buckets) for higher recall."""
    from pyspark.sql import Window

    # bucket attached in-place (narrow projection) — re-joining the
    # corpus to its own assignments on id would add a full shuffle
    vecs = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_column(F.col(vec_col), n_hyperplanes, dim, seed).alias("bucket"),
    )
    a = vecs.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("bucket"),
    )
    b = vecs.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("bucket"),
    )
    sims = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
