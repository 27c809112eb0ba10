"""Phase-linking analogue: lag-covariance Gram + dominant eigenvector.

CovSAR's inner loop builds an N x N sample covariance across epochs per pixel
(covsar/covariance.py:27-43) and extracts the per-pixel phase time series as
the dominant eigenvector via batched `numpy.linalg.eigh`
(covsar/library.py:113-146, `eig_decomp`), with the eigenvector gauge fixed by
normalizing to the first element (covsar/library.py:134-138) and a temporal
coherence quality metric (covsar/library.py:160-168, `compute_tc`).

Engine form: per (source, eigen-span) group — the span is the next-coarser
retention tier, so one "stack" = the finer-tier epochs inside one coarser
window — embed the token-count series into a P-lag trajectory matrix, form the
P x P Gram G = X X^T / M, and emit the leading eigenpair. Batched eigh over
(B, P, P) with NO per-row Python, exactly like the reference's chunked eigh
(covsar/library.py:121-128).

Determinism / exact-match (SURVEY.md §7.4): the kernel sorts each group by
epoch canonically before building X (Spark groups arrive unordered, unlike
the reference's glob-sorted file lists, covsar/closure_inten.py:70), so the
float pipeline sees bit-identical inputs regardless of partitioning; the
single-threaded oracle calls the SAME pure function `lagcov_eig` on the same
series, making the comparison sensitive to every piece of Spark plumbing
(grouping, gap-fill, ordering) while kernel math itself is validated
separately on planted-structure fixtures (FIXTURES.md F3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EIGEN_P, EIGEN_SCHEMA, EIGEN_SPAN

_GAUGE_EPS = 1e-12


def lagcov_eig(x: np.ndarray, p: int = EIGEN_P) -> tuple[float, float, np.ndarray]:
    """Pure kernel: series -> (leading eigenvalue, temporal coherence, eigvec).

    ``x`` must be the canonical (time-ordered, gap-filled) float64 series.
    If the series is shorter than ``p`` the lag dimension shrinks to len(x).
    Gauge: first element with |v_i| > eps is made positive (the real-valued
    analogue of the reference's first-element phase normalization).
    tc = lam / trace(G): fraction of series energy in the dominant mode.
    """
    x = np.asarray(x, dtype=np.float64)
    p_eff = min(p, len(x))
    if p_eff == 0:
        return 0.0, 0.0, np.zeros(0)
    m = len(x) - p_eff + 1
    # trajectory (Hankel) matrix: X[l, t] = x[t + l]
    X = np.lib.stride_tricks.sliding_window_view(x, m)  # (p_eff, m)
    G = (X @ X.T) / m
    w, V = np.linalg.eigh(G)
    lam = float(w[-1])
    v = V[:, -1].copy()
    nz = np.nonzero(np.abs(v) > _GAUGE_EPS)[0]
    if nz.size and v[nz[0]] < 0:
        v = -v
    tr = float(np.trace(G))
    tc = lam / tr if tr > _GAUGE_EPS else 0.0
    return lam, tc, v


def lagcov_eig_batch(series: list[np.ndarray], p: int = EIGEN_P):
    """Batched variant: groups whose series share a length run through ONE
    strided-view + batched-gemm + batched-`eigh` call, fully vectorized
    including the gauge fix (covsar/library.py:121-128 pattern, but with no
    per-span Python at all)."""
    out = [None] * len(series)
    by_len: dict[int, list[int]] = {}
    for i, s in enumerate(series):
        by_len.setdefault(len(s), []).append(i)
    for n, idxs in by_len.items():
        p_eff = min(p, n)
        if p_eff == 0:
            for i in idxs:
                out[i] = (0.0, 0.0, np.zeros(0))
            continue
        m = n - p_eff + 1
        B = len(idxs)
        stack = np.empty((B, n), dtype=np.float64)
        for b, i in enumerate(idxs):
            stack[b] = series[i]
        # contiguous copy: the strided-view gemm uses a different BLAS
        # micro-kernel than the contiguous one and breaks bit-equality with
        # the single-span oracle path (exact-match gate, SURVEY.md §7.4)
        Xs = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(stack, m, axis=1)
        )  # (B, p_eff, m)
        G = Xs @ Xs.transpose(0, 2, 1) / m
        w, V = np.linalg.eigh(G)  # batched
        lam = w[:, -1]
        vecs = V[:, :, -1].copy()
        tr = np.trace(G, axis1=1, axis2=2)  # same summation order as the
        # single-span oracle path (einsum orders differently -> tc bit-drift)
        # vectorized gauge: flip rows whose first |.|>eps element is negative
        big = np.abs(vecs) > _GAUGE_EPS
        has = big.any(axis=1)
        first = np.argmax(big, axis=1)
        signs = vecs[np.arange(B), first]
        flip = has & (signs < 0)
        vecs[flip] *= -1.0
        tc = np.where(tr > _GAUGE_EPS, lam / np.where(tr > _GAUGE_EPS, tr, 1.0), 0.0)
        for b, i in enumerate(idxs):
            out[i] = (float(lam[b]), float(tc[b]), vecs[b])
    return out


def eigen_rollup(
    rollup: DataFrame,
    tier: str,
    p: int = EIGEN_P,
    value_col: str = "token_count",
    span_buckets: int = 32,
) -> DataFrame:
    """Per-(source, eigen-span) dominant eigenpair of the lag-cov Gram.

    Input: a (preferably gap-filled) tier rollup. One shuffle, hashed on
    (source, span-bucket): grouping per individual span would mean one Arrow
    round-trip per tiny group, so spans are bucketed — each Python-side frame
    carries many spans of one source and the kernel runs ONE batched eigh per
    series length. Group size stays bounded: spans/bucket x (span/tier) rows.
    """
    span = EIGEN_SPAN[tier]
    with_span = (
        rollup.withColumn("span_s", (F.floor(F.col("epoch_s") / span) * span).cast("long"))
        .withColumn("_bkt", F.pmod(F.floor(F.col("span_s") / span), F.lit(span_buckets)))
        .select("source", "_bkt", "span_s", "epoch_s", F.col(value_col).cast("double").alias("val"))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # one pandas frame may hold MANY (source, span) groups when keys are
        # co-partitioned; groupby locally and run one batched eigh per length
        keys, series = [], []
        for (src, sp), g in pdf.groupby(["source", "span_s"], sort=True):
            g = g.sort_values("epoch_s", kind="mergesort")
            keys.append((src, sp, len(g)))
            series.append(g["val"].to_numpy(np.float64))
        res = lagcov_eig_batch(series, p)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "span_s": [k[1] for k in keys],
                "n_epochs": [k[2] for k in keys],
                "lam": [r[0] for r in res],
                "tc": [r[1] for r in res],
                "eig": [r[2] for r in res],
            }
        )

    return with_span.groupBy("source", "_bkt").applyInPandas(kernel, EIGEN_SCHEMA)
