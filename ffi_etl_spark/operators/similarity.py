"""Similarity search over embedding columns (array<float>).

  * knn_bruteforce — exact top-k: broadcast the (small) query set
    against the corpus, fold cosine JVM-side, window top-k. The right
    baseline AND the right 100 TB plan when |queries| is small: the
    corpus is scanned once, never shuffled; only (|queries|·k) rows
    survive to the final (tiny) sort.
  * ann_sign_lsh — sign-bit hyperplane buckets: candidates share a
    bucket, so the cross product shrinks from n² to Σ bucket².
    Embedding-cosine near-dup detection uses the same bucket join.

Cosine is a sequential double fold (functions/vectors.py) —
deterministic and DuckDB-comparable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ffi_etl_spark.functions.vectors import cosine, sign_bucket


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (self-matches excluded).
    Output: query_id, neighbor_id, cosine_sim, rank."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ann_sign_lsh_pairs(
    corpus: DataFrame,
    bits: int = 8,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: bucket by coordinate-sign LSH, verify
    cosine within buckets. Output: id_a, id_b, cosine_sim."""
    b = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        sign_bucket(F.col(vec_col), bits).alias("_bucket"),
    )
    left = b.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_bucket")
    right = b.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_bucket")
    return (
        left.join(right, (left["_bucket"] == right["_bucket"]) & (left["id_a"] < right["id_b"]))
        .withColumn("cosine_sim", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def compute_centroids(
    corpus: DataFrame,
    dim: int,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Elementwise-mean centroid per partition label — the IVF 'coarse
    quantizer' trained outside the engine in a real deployment; here the
    corpus's own label column stands in for the k-means assignment.

    One hash aggregation (dim avg aggregates); output is K rows."""
    return corpus.groupBy(F.col(label_col).alias("centroid_id")).agg(
        F.array(
            *[
                F.avg(F.element_at(F.col(vec_col), i + 1).cast("double"))
                for i in range(dim)
            ]
        ).alias("centroid")
    )


def assign_to_centroid(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment, fully narrow: the K
    centroids collapse into ONE broadcast row holding an array of
    (centroid_id, centroid) structs, and the argmax is a higher-order
    fold over that array — no per-vector window, no shuffle of the
    corpus at all. The strict (sim, id)-total-order comparison in the
    fold makes the result independent of the array's build order, and
    ties break on the lower centroid_id.

    (Previous formulation cross-joined K rows per vector and ranked
    with a Window.partitionBy(id) — that shuffles n·K rows twice; this
    one moves only the K-row centroid table.)"""
    packed = F.broadcast(
        centroids.agg(
            F.collect_list(F.struct("centroid_id", "centroid")).alias("_cents")
        )
    )
    # Score each centroid exactly once (transform), THEN fold for the
    # argmax — referencing sim() inside the fold lambda would re-derive
    # the 64-dim cosine on every comparison branch.
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            c["centroid_id"].alias("cid"),
            cosine(F.col(vec_col), c["centroid"]).alias("sim"),
        ),
    )
    first = F.element_at(scored, 1)
    rest = F.slice(scored, 2, F.greatest(F.size(scored) - 1, F.lit(0)))
    best = F.aggregate(
        rest,
        first,
        lambda acc, c: F.when(
            (c["sim"] > acc["sim"])
            | ((c["sim"] == acc["sim"]) & (c["cid"] < acc["cid"])),
            c,
        ).otherwise(acc),
    )
    return (
        corpus.crossJoin(packed)
        .withColumn("_best", best)
        .select(id_col, vec_col, F.col("_best.cid").alias("centroid_id"))
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF(nprobe=1) approximate top-k: both corpus and queries are
    assigned to their nearest centroid; each query searches ONLY its
    cell. The scale path when |queries| is large: the candidate join is
    an equi-join on centroid_id instead of a full cross product, so
    work scales with Σ cell² not n·q. Output matches knn_bruteforce
    minus cross-cell neighbors (the recall/cost dial is nprobe)."""
    cents = compute_centroids(corpus, dim, label_col, vec_col)
    c = assign_to_centroid(corpus, cents, id_col, vec_col).withColumnsRenamed(
        {id_col: "neighbor_id", vec_col: "_cv"}
    )
    q = assign_to_centroid(queries, cents, id_col, vec_col).withColumnsRenamed(
        {id_col: "query_id", vec_col: "_qv"}
    )
    scored = (
        c.join(q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ann_brp_lsh_pairs(
    corpus: DataFrame,
    threshold: float = 1.0,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-pair search via stock pyspark.ml
    ``BucketedRandomProjectionLSH`` (Euclidean): the library counterpart
    to the hand-rolled sign-LSH. Seeded for determinism, but the random
    hyperplanes are engine-private — differential testing uses the
    sign-LSH/IVF tiers; this tier exists for MLlib interop (same
    ``approxSimilarityJoin`` scale path: bucket join, no cross
    product). Output: id_a, id_b, euclid_dist."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, threshold, distCol="euclid_dist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            "euclid_dist",
        )
    )
