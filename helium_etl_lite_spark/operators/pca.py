"""Distributed PCA over an embedding column.

The 100 TB-safe decomposition: the only thing that ever leaves the
executors is a d x d covariance accumulator (d = embedding dimension,
64 here -> 4096 doubles), built in ONE pass with per-batch numpy
matmuls inside mapInPandas. The eigendecomposition itself is a
driver-side numpy call on that d x d matrix — O(d^3) work on 32 KB of
state, independent of corpus size — and the projection back over the
corpus is a narrow mapInPandas matmul against the broadcast component
matrix. No row ever shuffles; the reduce moves n_partitions * d^2
doubles.

This is the standard big-data PCA factoring (covariance sketch +
small dense solve) rather than a distributed Lanczos — exact for the
full covariance spectrum, which is what whitening/compression of
embedding columns needs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_batches(vec_col: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0)],
                    "xtx": [(X.T @ X).ravel()],
                }
            )

    return gen


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """One-pass covariance + driver eigh. Returns (mean: np.ndarray[d],
    components: np.ndarray[k, d], explained_var: np.ndarray[k]).

    The aggregation sums the per-batch moment rows elementwise via
    posexplode + sum-by-index: with d=64 that is 4096 * n_batches tiny
    rows through one hash agg — control-plane sized at any corpus
    scale. Eigenvector signs are canonicalized (largest-|x| component
    positive) so repeated fits on the same data agree.
    """
    n_total, s, xtx = _moments_of(df, vec_col)
    mean = s / n_total
    cov = xtx / n_total - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign canonicalization: largest-|x| entry of each component positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pc",
) -> DataFrame:
    """Project each vector onto the fitted components: a narrow
    mapInPandas matmul against the closure-captured (k, d) matrix —
    no shuffle, no join, scales linearly."""
    mu = mean.copy()
    W = components.copy()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = (X - mu) @ W.T
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(P)})

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, {out_col} array<double>"
    )


def _moments_of(df: DataFrame, vec_col: str):
    """(n, sum, flattened X^T X) of a batch — the sufficient statistics
    of PCA. d is taken from the first row."""
    head = df.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("moments: input has no rows (or a NULL first vector)")
    d = len(head[0])
    moments = df.select(vec_col).mapInPandas(
        _moment_batches(vec_col),
        schema="n long, s array<double>, xtx array<double>",
    )
    summed = (
        moments.select("n", F.posexplode(F.concat("s", "xtx")).alias("i", "v"))
        .groupBy("i")
        .agg(
            F.sum("v").alias("v"),
            F.sum(F.when(F.col("i") == 0, F.col("n"))).alias("n0"),
        )
    )
    rows = summed.collect()
    n_total = next(int(r["n0"]) for r in rows if r["i"] == 0)
    flat = np.zeros(d + d * d)
    for r in rows:
        flat[r["i"]] = r["v"]
    return n_total, flat[:d], flat[d:].reshape(d, d)


def moments_update(spark, batch: DataFrame, state_path: str, vec_col: str = "embedding") -> dict:
    """Incremental PCA, write side: fold a batch's moment statistics
    (n, sum vector, X^T X) into a persisted JSON state. Moments are
    ADDITIVE, so the fold-in is exact — refitting from the folded state
    equals a from-scratch fit over the union corpus (tested to 1e-9) —
    and costs one pass over the BATCH, never the corpus. State size is
    O(d^2) (~32 KB at d=64) regardless of corpus size: the same
    sufficient-statistics discipline as the dedup hash state, for the
    embedding column. Idempotence is the caller's job (land the batch,
    then fold, like dedup_state_add)."""
    import json
    import os

    n, s, xtx = _moments_of(batch, vec_col)
    if os.path.exists(state_path):
        with open(state_path) as f:
            st = json.load(f)
        if len(st["s"]) != len(s):
            raise ValueError(
                f"moment state dimension {len(st['s'])} != batch {len(s)}"
            )
        n += st["n"]
        s = s + np.array(st["s"])
        xtx = xtx + np.array(st["xtx"]).reshape(xtx.shape)
    st = {"n": int(n), "s": list(map(float, s)), "xtx": list(map(float, xtx.ravel()))}
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(st, f)
    os.replace(tmp, state_path)
    return st


def fit_pca_from_state(state_path: str, k: int = 8):
    """Incremental PCA, read side: eigensolve straight from the folded
    moment state — no data pass at all. Same output contract as
    fit_pca (mean, sign-canonicalized components, explained var)."""
    import json

    with open(state_path) as f:
        st = json.load(f)
    n, s = st["n"], np.array(st["s"])
    d = len(s)
    xtx = np.array(st["xtx"]).reshape(d, d)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]
