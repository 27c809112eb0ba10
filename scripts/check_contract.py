"""Local mimic of the driver's correctness gate: run each contract query in
Spark AND its DuckDB oracle at sf=0.01, compare row count, column names, and
order-insensitive values (signbit-aware: -0.0 != +0.0, like the driver's
value hash). Usage:
    python scripts/check_contract.py [--sf-dir /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from covsar_spark.schemas import TESTDATA_TABLES  # noqa: E402
from covsar_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def duck_conn():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")  # unify int widths; exact ≤2^53
        if str(df[c].dtype) == "bool":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        errs.append(f"columns {sorted(got.columns)} != {sorted(exp.columns)}")
        return errs
    if len(got) != len(exp):
        errs.append(f"rows {len(got)} != {len(exp)}")
        return errs
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f":
            gf, ef = gv.astype(float), ev.astype(float)
            # The driver compares value HASHES, which see the IEEE sign bit:
            # -0.0 vs +0.0 must fail here too, even though -0.0 == +0.0.
            ok = (
                (gv == ev)
                & (np.signbit(gf) == np.signbit(ef))
            ) | (np.isnan(gf) & np.isnan(ef))
        else:
            ok = gv == ev
        if not np.asarray(ok).all():
            bad = np.nonzero(~np.asarray(ok))[0][:3]
            errs.append(f"col {c}: {len(bad)}+ mismatches e.g. {gv[bad]} vs {ev[bad]}")
    return errs


def main():
    from covsar_spark import contract

    global SF_DIR
    args = sys.argv[1:]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        if i + 1 >= len(args):
            sys.exit("usage: check_contract.py [--sf-dir DIR] [name ...]")
        SF_DIR = args[i + 1]
        del args[i : i + 2]
    names = args or list(contract.QUERIES)
    spark = get_spark("contract_check", cores=8, shuffle_partitions=8)
    con = duck_conn()
    n_ok = 0
    for name in names:
        fn = contract.QUERIES.get(name)
        if fn is None:
            print(f"FAIL {name}: unknown query name")
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            continue
        sql = contract.ORACLE.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            n_ok += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            continue
        errs = compare(name, got, exp)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"ok   {name}: {len(got)} rows match ({time.time()-t0:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok}/{len(names)} passing")


if __name__ == "__main__":
    main()
