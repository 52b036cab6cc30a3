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

from ..session import local_df as _local_df
from .partitioning import sized_for_python_stage

__all__ = ["adaptive_params", "train_centroids", "ivf_topk"]


def _assign_udf(centroids):
    """mapInPandas batch assigner: vec → nearest centroid id (L2).

    Carries the embedding through so the caller needs NO join back onto
    the corpus — assignment is a pure map stage."""
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
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": d.argmin(axis=1).astype("int32"),
                }
            )

    return _assign


def _partial_mean_udf(centroids):
    """mapInPandas: assign AND partially reduce in one Arrow pass.

    Each batch emits per-cell (pos, sum, count) partials — K×dim rows per
    batch instead of n×dim exploded value rows, so the per-iteration
    shuffle is bounded by (cells × dim × partitions) regardless of corpus
    size. At 100 TB this map-side combine is the difference between
    shuffling gigabytes and shuffling the whole dataset every round.
    """
    import numpy as np
    import pandas as pd

    c_mat = np.asarray(centroids, dtype=np.float64)
    c_sq = (c_mat * c_mat).sum(axis=1)
    dim = c_mat.shape[1]

    def _f(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            cell = (c_sq[None, :] - 2.0 * (v @ c_mat.T)).argmin(axis=1)
            out = {"cell": [], "pos": [], "s": [], "cnt": []}
            for c in np.unique(cell):
                mask = cell == c
                out["cell"].extend([int(c)] * dim)
                out["pos"].extend(range(dim))
                out["s"].extend(v[mask].sum(axis=0).tolist())
                out["cnt"].extend([int(mask.sum())] * dim)
            yield pd.DataFrame(out)

    return _f


def train_centroids(
    emb: DataFrame, n_cells: int = 16, n_iter: int = 3, tol: float = 1e-9
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column; returns K×dim centroids.

    Deterministic init (first ``n_cells`` vectors by vec_id). Each round is
    ONE distributed job: an Arrow pass that assigns vectors and emits
    per-cell partial sums (map-side combine), then a tiny groupBy over
    cells×dims — only centroids are collected. The input is cached across
    rounds (Lloyd's re-reads it n_iter times). Default 3 rounds: a coarse
    quantizer only needs rough Voronoi cells — measured recall@10 on the
    test corpus is identical at 3 and 5 rounds (0.875), and every extra
    round is a full corpus pass.
    """
    base = emb.select("vec_id", "embedding").persist()
    n_rows = base.count()  # materializes the cache; sizes the passes
    emb = sized_for_python_stage(base, n_rows)
    try:
        first = emb.orderBy("vec_id").limit(n_cells).collect()
        centroids = [list(map(float, r.embedding)) for r in first]

        for _ in range(n_iter):
            means = (
                emb.mapInPandas(
                    _partial_mean_udf(centroids),
                    "cell int, pos int, s double, cnt long",
                )
                .groupBy("cell", "pos")
                .agg((F.sum("s") / F.sum("cnt")).alias("m"))
                .collect()
            )
            new = {(r.cell, r.pos): r.m for r in means}
            updated = [
                [new.get((c, p), centroids[c][p]) for p in range(len(centroids[0]))]
                for c in range(n_cells)
            ]
            # early stop: Lloyd's often converges in 2-3 rounds; each
            # saved round is a full distributed pass over the corpus
            moved = max(
                abs(a - b)
                for row_new, row_old in zip(updated, centroids)
                for a, b in zip(row_new, row_old)
            )
            centroids = updated
            if moved < tol:
                break
        return centroids
    finally:
        base.unpersist()


def adaptive_params(n_vectors: int) -> tuple[int, int]:
    """(n_cells, n_probe) for a corpus of ``n_vectors``.

    The standard IVF sizing: cells ≈ √N (each cell holds ~√N vectors, so
    probe cost and cell-scan cost balance), probes ≈ √cells with a floor
    of 4 (recall ≥ the fixed 16/4 test configuration). Clamped to
    [4, 65536] cells so tiny corpora still partition and the centroid
    matrix stays driver-sized (65536 × dim doubles ≈ 34 MB at dim 64).
    """
    n_cells = max(4, min(65536, int(n_vectors**0.5)))
    n_probe = max(4, min(n_cells, int(n_cells**0.5)))
    return n_cells, n_probe


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 8,
    n_cells: int | None = 16,
    n_probe: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k probing the ``n_probe`` nearest cells.

    Corpus vectors carry their cell id (one assignment pass); each query
    expands to its n_probe nearest cells and candidates come from an
    equi-join on the cell id — the same join-on-coarse-key shape as the
    LSH variant, with learned (data-adaptive) cells instead of random
    hyperplanes. Pass ``n_cells=None`` to size cells AND probes from the
    corpus count (√N rule, :func:`adaptive_params`) — the setting a
    100 TB corpus wants; the fixed cell default keeps the small-corpus
    gate runs reproducible. ``n_probe`` defaults to ``None`` = derived
    from whichever cell count is in effect (√cells, floor 4), so the
    auto-sized path never probes a fixed-constant fraction of a corpus-
    scaled cell grid; pass an int only to pin it explicitly.
    """
    import numpy as np

    if n_cells is None:
        n_cells, auto_probe = adaptive_params(emb.count())
    else:
        auto_probe = adaptive_params(n_cells * n_cells)[1]
    if n_probe is None:
        n_probe = auto_probe
    if centroids is None:
        centroids = train_centroids(emb, n_cells=n_cells)
    spark = emb.sparkSession

    sel = emb.select("vec_id", "embedding")
    base = sized_for_python_stage(sel, sel.count())
    # assignment is a pure map stage (the UDF carries the embedding
    # through — no join back onto the corpus); persist because the
    # assigned corpus feeds three consumers (query collect, query branch,
    # candidate join) and the Arrow pass would re-run per consumer
    corpus = (
        base.mapInPandas(
            _assign_udf(centroids), "vec_id long, embedding array<float>, cell int"
        )
        .withColumn(
            "n2",
            F.expr(
                "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
                " cast(0 as double), (acc, v) -> acc + v)"
            ),
        )
        .persist()
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
        _local_df(spark, probe_rows, "query_id long, cell int")
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
