"""LTTB downsample (operators/downsample.py) vs an explicit-loop reference
implementation written straight from the Steinarsson 2013 definition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from covsar_spark.operators.downsample import lttb, lttb_indices


def _ref_lttb(x, y, n_out):
    """Independent loop-style LTTB: explicit bucket walk, explicit triangle
    area 0.5*|x_a(y_b-y_c) + x_b(y_c-y_a) + x_c(y_a-y_b)|, first-max ties."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(np.floor(i * every)) + 1
        hi = int(np.floor((i + 1) * every)) + 1
        hi = min(hi, n - 1)
        nlo = int(np.floor((i + 1) * every)) + 1
        nhi = min(int(np.floor((i + 2) * every)) + 1, n - 1)
        if i == n_out - 3:  # last interior bucket -> centroid is final point
            cx, cy = float(x[n - 1]), float(y[n - 1])
        else:
            cx = float(np.mean(x[nlo:nhi]))
            cy = float(np.mean(y[nlo:nhi]))
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = 0.5 * abs(
                float(x[a]) * (float(y[j]) - cy)
                + float(x[j]) * (cy - float(y[a]))
                + cx * (float(y[a]) - float(y[j]))
            )
            if area > best_area:
                best, best_area = j, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel


@pytest.mark.parametrize("n,n_out", [(500, 24), (101, 3), (64, 63), (1000, 100)])
def test_lttb_indices_match_reference(n, n_out):
    rng = np.random.default_rng(n + n_out)
    x = np.cumsum(rng.integers(1, 20, n)).astype(np.int64)
    y = np.round(np.cumsum(rng.normal(0, 3, n)) + 10 * np.sin(x / 50.0), 4)
    got = lttb_indices(x, y, n_out)
    want = _ref_lttb(x, y, n_out)
    assert list(got) == want


def test_lttb_keeps_endpoints_and_subset():
    rng = np.random.default_rng(3)
    x = np.arange(400, dtype=np.int64) * 7
    y = rng.normal(0, 1, 400)
    idx = lttb_indices(x, y, 20)
    assert idx[0] == 0 and idx[-1] == 399
    assert len(idx) == 20
    assert (np.diff(idx) > 0).all()  # strictly increasing -> a subset, x-ordered


def test_lttb_degenerate_passthrough():
    x = np.arange(5, dtype=np.int64)
    y = np.ones(5)
    assert list(lttb_indices(x, y, 10)) == [0, 1, 2, 3, 4]  # n_out >= n
    assert list(lttb_indices(x, y, 2)) == [0, 1, 2, 3, 4]  # n_out < 3


def test_lttb_keeps_extremes_of_a_spike_train():
    """Shape preservation, the property LTTB exists for: giant isolated
    spikes survive a 10x downsample (mean/decimation would lose them)."""
    n = 600
    x = np.arange(n, dtype=np.int64)
    y = np.zeros(n)
    spikes = [50, 175, 333, 480]
    for s in spikes:
        y[s] = 500.0
    idx = set(lttb_indices(x, y, 60).tolist())
    for s in spikes:
        assert s in idx, f"spike at {s} lost"


def test_lttb_spark_matches_kernel(spark):
    rng = np.random.default_rng(9)
    rows = []
    for s in range(4):
        n = 120 + 60 * s
        x = np.cumsum(rng.integers(1, 30, n)).astype(np.int64)
        y = np.round(rng.normal(0, 5, n), 2)
        rows.append(pd.DataFrame({"source": f"s{s}", "epoch_s": x, "value": y}))
    pdf = pd.concat(rows, ignore_index=True)
    got = (
        lttb(spark.createDataFrame(pdf), 24, keys=("source",))
        .toPandas()
        .sort_values(["source", "sel_rank"])
        .reset_index(drop=True)
    )
    for s, g in pdf.groupby("source"):
        g = g.sort_values(["epoch_s", "value"], kind="mergesort").reset_index(drop=True)
        idx = lttb_indices(g.epoch_s.to_numpy(), g.value.to_numpy(), 24)
        sub = got[got.source == s]
        assert list(sub.epoch_s) == list(g.epoch_s.to_numpy()[idx])
        assert list(sub.value) == list(g.value.to_numpy()[idx])
        assert list(sub.sel_rank) == list(range(24))


def test_lttb_chunked_equals_per_chunk(spark):
    """chunk_s bounds per-task state; output == concatenating LTTB over each
    (series, chunk) slice independently."""
    rng = np.random.default_rng(21)
    n = 900
    x = np.cumsum(rng.integers(10, 50, n)).astype(np.int64)
    y = np.round(rng.normal(0, 2, n), 3)
    pdf = pd.DataFrame({"source": "c0", "epoch_s": x, "value": y})
    chunk = 3600
    got = (
        lttb(spark.createDataFrame(pdf), 12, keys=("source",), chunk_s=chunk)
        .toPandas()
        .sort_values(["epoch_s"])
        .reset_index(drop=True)
    )
    want_x = []
    for _, g in pdf.groupby(pdf.epoch_s // chunk):
        g = g.sort_values(["epoch_s", "value"], kind="mergesort").reset_index(drop=True)
        idx = lttb_indices(g.epoch_s.to_numpy(), g.value.to_numpy(), 12)
        want_x.extend(g.epoch_s.to_numpy()[idx].tolist())
    assert list(got.epoch_s) == sorted(want_x)
    assert "_chunk" not in got.columns


def test_lttb_integer_path_matches_float_reference():
    """Integer inputs take the exact (division-free) path; on data whose
    float64 rounding error is far below the area gaps, it must agree with
    the float-arithmetic reference loop exactly."""
    rng = np.random.default_rng(77)
    for trial in range(6):
        n = int(rng.integers(60, 400))
        n_out = int(rng.integers(8, 40))
        x = np.cumsum(rng.integers(1, 900, n)).astype(np.int64) + 1_700_000_000
        y = rng.integers(-10_000, 10_000, n).astype(np.int64)
        got = lttb_indices(x, y, n_out)
        want = _ref_lttb(x, y, n_out)
        assert list(got) == want, f"trial {trial}: n={n} n_out={n_out}"


def test_lttb_integer_path_translation_invariant():
    rng = np.random.default_rng(5)
    x = np.cumsum(rng.integers(1, 50, 300)).astype(np.int64)
    y = rng.integers(0, 5000, 300).astype(np.int64)
    base = lttb_indices(x, y, 17)
    assert list(lttb_indices(x + 1_700_000_000, y + 123_456, 17)) == list(base)
