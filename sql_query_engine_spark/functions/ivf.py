"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for similarity search beside random-hyperplane LSH
(functions/similarity.py): a k-means coarse quantizer partitions the
corpus into Voronoi cells; a query scores only the ``n_probe`` nearest
cells. At 100 TB this is the standard ANN layout — the cell id becomes a
partition/cluster key, candidate generation is an equi-join on it, and
recall/cost is tuned by (n_cells, n_probe).

Training runs as Spark jobs (assignment via Arrow/NumPy matmul batches,
centroid update via explode + groupBy mean); only the K×dim centroid
matrix ever touches the driver. Centroid means are float reductions, so
cell boundaries can wobble in the last ULP between runs — results are
therefore checked by *recall against the exact brute force* rather than a
value-exact oracle (the one approximate operator family where that is the
honest check; see tests/test_scale_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_centroids", "ivf_topk"]


def _assign_udf(centroids):
    """mapInPandas batch assigner: vec → nearest centroid id (L2)."""
    import numpy as np
    import pandas as pd

    c_mat = np.asarray(centroids, dtype=np.float64)  # (K, dim)
    c_sq = (c_mat * c_mat).sum(axis=1)

    def _assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            # argmin ||v - c||² = argmin (||c||² - 2 v·c)
            d = c_sq[None, :] - 2.0 * (v @ c_mat.T)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": d.argmin(axis=1).astype("int32")}
            )

    return _assign


def train_centroids(
    emb: DataFrame, n_cells: int = 16, n_iter: int = 5
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column; returns K×dim centroids.

    Deterministic init (first ``n_cells`` vectors by vec_id). Each round:
    one Arrow-batched assignment pass + one explode/groupBy mean — all
    distributed; only centroids are collected.
    """
    par = emb.sparkSession.sparkContext.defaultParallelism
    emb = emb.repartition(par).select("vec_id", "embedding")
    first = emb.orderBy("vec_id").limit(n_cells).collect()
    centroids = [list(map(float, r.embedding)) for r in first]

    for _ in range(n_iter):
        assigned = emb.mapInPandas(_assign_udf(centroids), "vec_id long, cell int")
        means = (
            emb.join(assigned, "vec_id")
            .select("cell", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = {(r.cell, r.pos): r.m for r in means}
        centroids = [
            [new.get((c, p), centroids[c][p]) for p in range(len(centroids[0]))]
            for c in range(n_cells)
        ]
    return centroids


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 8,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k probing the ``n_probe`` nearest cells.

    Corpus vectors carry their cell id (one assignment pass); each query
    expands to its n_probe nearest cells and candidates come from an
    equi-join on the cell id — the same join-on-coarse-key shape as the
    LSH variant, with learned (data-adaptive) cells instead of random
    hyperplanes.
    """
    import numpy as np

    if centroids is None:
        centroids = train_centroids(emb, n_cells=n_cells)
    par = emb.sparkSession.sparkContext.defaultParallelism
    spark = emb.sparkSession

    base = emb.repartition(par).select("vec_id", "embedding")
    assigned = base.mapInPandas(_assign_udf(centroids), "vec_id long, cell int")
    corpus = base.join(assigned, "vec_id").withColumn(
        "n2",
        F.expr(
            "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
            " cast(0 as double), (acc, v) -> acc + v)"
        ),
    )

    # query → its n_probe nearest cells (tiny, computed driver-side)
    q_rows = corpus.filter(F.col("vec_id") < n_queries).collect()
    c_mat = np.asarray(centroids, dtype=np.float64)
    c_sq = (c_mat * c_mat).sum(axis=1)
    probe_rows = []
    for r in q_rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        d = c_sq - 2.0 * (c_mat @ v)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((r.vec_id, int(cell)))
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "query_id long, cell int")
    )

    q = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    cand = (
        probes.join(q, "query_id")
        .join(corpus, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.expr(
                "aggregate(zip_with(q_emb, embedding,"
                " (x, y) -> cast(x as double) * cast(y as double)),"
                " cast(0 as double), (acc, v) -> acc + v)"
            )
            / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("n2")))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )
