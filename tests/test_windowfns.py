"""W1 cumulative product: sign/zero branches vs a numpy cumprod, and the
reference wrap convention boundary (pi wraps to -pi, covsar/closures.py:162)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from covsar_spark.functions.complexmath import wrap_phase
from covsar_spark.operators.windowfns import phase_cumprod, running_product


def test_running_product_matches_numpy(spark):
    factors = [1.5, -2.0, 0.5, -1.0, 3.0, 0.0, 2.0, -4.0]
    pdf = pd.DataFrame({"k": ["a"] * len(factors), "i": range(len(factors)), "x": factors})
    out = (
        running_product(spark.createDataFrame(pdf), "x", ["k"], ["i"])
        .orderBy("i")
        .toPandas()["running_prod"]
        .to_numpy()
    )
    want = np.cumprod(factors)
    np.testing.assert_allclose(out, want, rtol=1e-12, atol=0)
    assert out[5] == 0.0 and out[-1] == 0.0  # zero factor pins the tail


def test_wrap_phase_boundary(spark):
    df = spark.range(1).select(
        wrap_phase(F.lit(math.pi)).alias("at_pi"),
        wrap_phase(F.lit(-math.pi)).alias("at_neg_pi"),
        wrap_phase(F.lit(3 * math.pi + 0.5)).alias("big"),
    )
    row = df.first()
    # reference convention [-pi, pi): +pi maps to -pi
    assert abs(row["at_pi"] - (-math.pi)) < 1e-12
    assert abs(row["at_neg_pi"] - (-math.pi)) < 1e-12
    assert abs(row["big"] - (-math.pi + 0.5)) < 1e-9


def test_phase_cumprod_is_phasor_product(spark):
    phis = [0.3, 2.8, -1.1, 3.0, 0.7]
    pdf = pd.DataFrame({"k": ["a"] * len(phis), "i": range(len(phis)), "phi": phis})
    out = phase_cumprod(spark.createDataFrame(pdf), "phi", ["k"], ["i"]).orderBy("i").toPandas()
    z = np.cumprod(np.exp(1j * np.array(phis)))
    np.testing.assert_allclose(out["cum_re"], z.real, atol=1e-12)
    np.testing.assert_allclose(out["cum_im"], z.imag, atol=1e-12)
    # angles wrapped to [-pi, pi)
    assert ((out["cum_phase"] >= -math.pi) & (out["cum_phase"] < math.pi)).all()


def test_unwrap_phase_matches_numpy(spark):
    """Window-algebra unwrap == np.unwrap on random wrapped series per key,
    including multi-cycle jumps."""
    rng = np.random.default_rng(17)
    rows = []
    for key in ("a", "b"):
        # a smooth walk with deliberate multi-wrap jumps, then wrapped
        steps = rng.normal(0, 1.2, 300)
        steps[::37] += rng.choice([-9.0, 9.0], size=len(steps[::37]))
        true = np.cumsum(steps)
        wrapped = np.mod(true + np.pi, 2 * np.pi) - np.pi
        for i, w in enumerate(wrapped):
            rows.append((key, i, float(w)))
    pdf = pd.DataFrame(rows, columns=["k", "i", "ph"])
    from covsar_spark.operators.windowfns import unwrap_phase

    got = (
        unwrap_phase(spark.createDataFrame(pdf), "ph", ["k"], ["i"])
        .toPandas()
        .sort_values(["k", "i"])
    )
    for key in ("a", "b"):
        g = got[got["k"] == key]
        want = np.unwrap(g["ph"].to_numpy())
        np.testing.assert_allclose(g["unwrapped"].to_numpy(), want, atol=1e-9)


def test_unwrap_phase_exact_pi_boundary(spark):
    """d = -pi and d = +pi exactly must NOT jump (np.unwrap keeps both);
    the one-sided ceil form added a spurious +2pi at d = -pi."""
    import numpy as np
    import pandas as pd

    from covsar_spark.operators.windowfns import unwrap_phase

    ph = np.array([0.0, -np.pi, -np.pi + 0.1, 0.1, 0.1 + np.pi])
    pdf = pd.DataFrame({"k": ["a"] * len(ph), "i": range(len(ph)), "ph": ph})
    got = (
        unwrap_phase(spark.createDataFrame(pdf), "ph", ["k"], ["i"])
        .toPandas().sort_values("i")["unwrapped"].to_numpy()
    )
    np.testing.assert_allclose(got, np.unwrap(ph), atol=1e-12)


def test_cumulative_product_null_skips_like_sql(spark):
    """NULL factors are skipped (SQL aggregate convention — DuckDB's
    windowed product() oracle ignores NULL rows), NOT propagated like
    np.cumprod's NaN. The behavior is deliberate and must match the oracle
    engine exactly."""
    import duckdb
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from covsar_spark.operators.windowfns import cumulative_product

    pdf = pd.DataFrame({"i": range(5), "x": [2.0, None, -3.0, 0.5, None]})
    w = W.orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    got = (
        spark.createDataFrame(pdf)
        .withColumn("cp", cumulative_product(F.col("x"), w))
        .toPandas().sort_values("i")["cp"].to_numpy()
    )
    want = duckdb.sql(
        "SELECT product(x) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "FROM (SELECT unnest([0,1,2,3,4]) AS i, unnest([2.0, NULL, -3.0, 0.5, NULL]) AS x)"
    ).df().iloc[:, 0].to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12)
