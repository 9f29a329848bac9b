"""IVF-style approximate nearest neighbor (SURVEY L3 scale path).

Inverted-file (IVF) search, Spark-native:
1. Train a coarse quantizer (k-means over a sample) — driver-side
   centroids, tiny.
2. Assign every corpus vector to its nearest centroid (map-only;
   centroids broadcast via literal arrays).
3. At query time, probe the `n_probe` nearest centroid cells and score
   only vectors in those cells — a bucket-pruned join instead of a full
   scan. Recall/speed trades with n_probe.

Complementary to BucketedRandomProjectionLSH (operators/similarity.py):
IVF adapts to data distribution (clusters), LSH is data-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jobhouse_spark.functions.vectors import dot_product


def _nearest_centroid_expr(vec_col, centroids: list[list[float]], k: int = 1):
    """Column expr: index of the (k-th set of) nearest centroid(s) by
    squared L2 — computed as JVM expressions over literal arrays."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    # indices of the k smallest distances
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.zip_with(dists, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
    return F.slice(F.array_sort(pairs), 1, k).getField("i")


def train_centroids(
    corpus: DataFrame, vec_col: str = "embedding", n_cells: int = 16, seed: int = 42
) -> list[list[float]]:
    """K-means coarse quantizer via pyspark.ml (sampled fit)."""
    from pyspark.ml.clustering import KMeans  # noqa: PLC0415
    from pyspark.ml.functions import array_to_vector  # noqa: PLC0415

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells per query; exact-score within."""
    assign = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _nearest_centroid_expr(F.col(vec_col), centroids, k=1)[0].alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            _nearest_centroid_expr(F.col(vec_col), centroids, k=n_probe)
        ).alias("cell"),
    )
    pairs = assign.join(F.broadcast(probes), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn(
        "score", dot_product(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score", "rn")
    )
