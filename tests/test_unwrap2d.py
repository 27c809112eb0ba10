"""2-D least-squares phase unwrap (operators/unwrap2d.py) — the engine form
of the reference's external-snaphu step (covsar/unwrap.py). Invariants:

- the FFT Poisson solver exactly inverts the mirror-BC 5-point Laplacian;
- residue-free planted surfaces are recovered EXACTLY up to the mean-zero
  gauge (the property the contract entries' exact SQL oracles rest on);
- the Laplacian identity lap(phi) == div(W(grad psi)) holds even WITH
  residues (the LS normal equations themselves);
- the tiled distributed form equals the single-solve form.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from covsar_spark.operators.unwrap2d import (
    _divergence,
    laplacian_neumann,
    ls_unwrap_grid,
    poisson_neumann,
    unwrap_2d,
    unwrap_2d_tiled,
    wrap_np,
)


def _planted(h: int, w: int, ax: float, ay: float, amp: float) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ax * xx + ay * yy + amp * np.sin(2 * math.pi * xx / w) * np.cos(
        2 * math.pi * yy / h
    )


def test_poisson_inverts_laplacian():
    rng = np.random.default_rng(7)
    phi = rng.standard_normal((23, 17))
    phi -= phi.mean()
    back = poisson_neumann(laplacian_neumann(phi))
    np.testing.assert_allclose(back, phi, atol=1e-10)


def test_residue_free_exact_recovery():
    true = _planted(40, 56, 0.9, -0.7, 1.3)
    got = ls_unwrap_grid(wrap_np(true))
    np.testing.assert_allclose(got, true - true.mean(), atol=1e-8)


def test_laplacian_identity_holds_with_residues():
    """A phase vortex makes the field non-unwrappable exactly; the LS
    solution still satisfies its normal equations lap(phi) = rho."""
    h, w = 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    vortex = np.arctan2(yy - h / 2 + 0.5, xx - w / 2 + 0.5)
    psi = wrap_np(vortex + 0.15 * xx)
    dx, dy = wrap_np(np.diff(psi, axis=1)), wrap_np(np.diff(psi, axis=0))
    rho = _divergence(dx, dy)
    phi = ls_unwrap_grid(psi)
    # rho sums to zero by construction, so the zero-mode projection in the
    # solver drops nothing and the identity is exact
    np.testing.assert_allclose(laplacian_neumann(phi), rho, atol=1e-9)
    assert np.isfinite(phi).all() and abs(phi.mean()) < 1e-9


def _raster_df(spark, specs):
    rows = []
    for name, (h, w, ax, ay, amp) in specs.items():
        true = _planted(h, w, ax, ay, amp)
        psi = wrap_np(true)
        for i in range(h):
            for j in range(w):
                rows.append((name, i, j, float(psi[i, j]), float(true[i, j])))
    pdf = pd.DataFrame(rows, columns=["source", "y", "x", "phase", "true"])
    return spark.createDataFrame(pdf), pdf


SPECS = {
    "r_a": (40, 40, 0.8, -0.6, 1.2),
    "r_b": (40, 40, -1.1, 0.4, 0.9),
}


def test_spark_single_matches_numpy_and_truth(spark):
    df, pdf = _raster_df(spark, SPECS)
    got = (
        unwrap_2d(df.select("source", "y", "x", "phase"), ["source"])
        .toPandas()
        .sort_values(["source", "y", "x"])
        .reset_index(drop=True)
    )
    for name in SPECS:
        g = got[got["source"] == name]
        t = pdf[pdf["source"] == name].sort_values(["y", "x"])
        true = t["true"].to_numpy()
        np.testing.assert_allclose(
            g["unwrapped"].to_numpy(), true - true.mean(), atol=1e-8
        )


@pytest.mark.parametrize("tile", [16, 40])
def test_spark_tiled_matches_single(spark, tile):
    """tile=16 → 3x3 tile grid per raster; tile=40 → single tile (the
    no-seam degenerate path)."""
    df, pdf = _raster_df(spark, SPECS)
    got = (
        unwrap_2d_tiled(df.select("source", "y", "x", "phase"), ["source"], tile=tile)
        .toPandas()
        .sort_values(["source", "y", "x"])
        .reset_index(drop=True)
    )
    for name in SPECS:
        g = got[got["source"] == name]
        t = pdf[pdf["source"] == name].sort_values(["y", "x"])
        true = t["true"].to_numpy()
        np.testing.assert_allclose(
            g["unwrapped"].to_numpy(), true - true.mean(), atol=1e-8
        )


def test_dense_grid_required(spark):
    pdf = pd.DataFrame(
        {"source": ["s"] * 3, "y": [0, 0, 1], "x": [0, 1, 1], "phase": [0.0, 0.1, 0.2]}
    )
    with pytest.raises(Exception, match="dense grid"):
        unwrap_2d(spark.createDataFrame(pdf), ["source"]).toPandas()
