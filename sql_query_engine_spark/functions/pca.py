"""Distributed PCA over an embedding column: Gram-aggregate + eigensolve.

The big-data PCA decomposition (the classic tall-skinny pattern, e.g.
Spark MLlib's own RowMatrix.computePrincipalComponents): the corpus is
huge in N but small in d, so

1. each partition folds its Arrow batches into a LOCAL d×d Gram partial
   and a d-vector sum partial with one BLAS ``X.T @ X`` — map-side work,
   no shuffle of vectors;
2. the ≤ n_partitions × (d² + d + 1) partial rows (a few MB even at
   1000 executors) come to the driver and are summed in a FIXED sort
   order — bit-deterministic totals regardless of task scheduling, the
   same discipline as the repo's content-hash operators;
3. the centered covariance eigensolves on the driver (d×d — microseconds)
   and the top-k eigenvectors broadcast back as literals into a pure-JVM
   zip_with projection.

One corpus pass, one driver-side d×d solve, one map-only projection.
Sign convention: each component's largest-|loading| coordinate is made
positive, so outputs are reproducible run-to-run.

No SQL oracle: an eigendecomposition has no DuckDB twin — correctness is
pinned in tests against numpy's full PCA on the collected corpus
(cosine |v_spark · v_np| ≈ 1 per component, projections equal up to the
fixed sign), the honest rows-only pattern the IVF/PQ queries established.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_and_mean", "principal_components", "pca_project"]

_PARTIAL_SCHEMA = "pid int, idx int, val double"


def gram_and_mean(emb: DataFrame, dim: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact (Gram, sum, count) of the embedding column, deterministically.

    Index layout of the long-format partials: [0, d²) flattened Gram,
    [d², d²+d) coordinate sums, d²+d the row count.
    """

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        g = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        if n == 0:
            return
        vals = np.concatenate([g.ravel(), s, [float(n)]])
        yield pd.DataFrame(
            {
                "pid": np.full(len(vals), pid, dtype=np.int32),
                "idx": np.arange(len(vals), dtype=np.int32),
                "val": vals,
            }
        )

    parts = (
        emb.select("embedding")
        .mapInPandas(_partials, _PARTIAL_SCHEMA)
        .collect()
    )
    # fixed (idx, pid) order ⇒ float sums independent of task scheduling
    totals = np.zeros(dim * dim + dim + 1)
    for row in sorted(parts, key=lambda r: (r["idx"], r["pid"])):
        totals[row["idx"]] += row["val"]
    gram = totals[: dim * dim].reshape(dim, dim)
    sums = totals[dim * dim : dim * dim + dim]
    n = int(totals[-1])
    return gram, sums, n


def principal_components(emb: DataFrame, dim: int, k: int = 2):
    """Top-k eigenvectors of the CENTERED covariance, sign-fixed.

    Returns (components: k×d ndarray, mean: d ndarray).
    """
    gram, sums, n = gram_and_mean(emb, dim)
    if n == 0:
        raise ValueError("PCA needs a non-empty corpus")
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    comps = []
    for j in range(1, k + 1):
        v = eigvecs[:, -j]
        if v[np.argmax(np.abs(v))] < 0:  # deterministic sign
            v = -v
        comps.append(v)
    return np.asarray(comps), mean


def pca_project(emb: DataFrame, dim: int, k: int = 2) -> DataFrame:
    """Per-vector projections onto the top-k principal components.

    The eigenvectors ride the plan as array literals inside a zip_with
    fold — the projection stage is whole-stage codegen, map-only, and
    never moves the embedding column.
    """
    comps, mean = principal_components(emb, dim, k)
    cols = [c for c in ("vec_id", "label") if c in emb.columns]
    out = emb.select(*cols, "embedding")
    for j in range(k):
        offset = float(np.dot(comps[j], mean))
        v_lit = ", ".join(f"{x!r}D" for x in comps[j])
        expr = (
            f"round(aggregate(zip_with(embedding, array({v_lit}), "
            f"(x, y) -> cast(x as double) * y), cast(0 as double), "
            f"(acc, v) -> acc + v) - {offset!r}D, 6)"
        )
        out = out.withColumn(f"pc{j + 1}_r6", F.expr(expr))
    return out.drop("embedding")
