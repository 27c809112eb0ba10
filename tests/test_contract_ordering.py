"""Driver-cap ordering guards: the verification driver only checks the FIRST
50 entries of queries(), so export order is a correctness-reporting concern
(round-2 lesson: 12 entries silently unverified, 3 of them never green)."""

from __future__ import annotations

DRIVER_CAP = 50


def test_ordered_queries_loses_nothing():
    from covsar_spark import contract

    q = contract.ordered_queries()
    assert sorted(q) == sorted(contract.QUERIES)


def test_priority_entries_inside_cap():
    from covsar_spark import contract

    cap = list(contract.ordered_queries())[:DRIVER_CAP]
    missing = [n for n in contract.DRIVER_PRIORITY if n in contract.QUERIES and n not in cap]
    assert not missing, f"priority entries past the driver cap: {missing}"


def test_only_demoted_or_rows_only_past_cap():
    """Every oracle-bearing entry that spills past the cap must be an
    explicitly demoted duplicate — adding a new entry without updating the
    priority lists should fail here, not silently unverify something."""
    from covsar_spark import contract

    over = list(contract.ordered_queries())[DRIVER_CAP:]
    bad = [n for n in over if n in contract.ORACLE and n not in contract.DRIVER_DEMOTED]
    assert not bad, f"oracle entries past the cap but not in DRIVER_DEMOTED: {bad}"


def test_every_query_has_oracle_or_is_known_rows_only():
    """Rows-only entries are the documented kernel set — a new operator
    should ship with a SQL oracle unless it genuinely has none."""
    from covsar_spark import contract

    known_rows_only = {
        "closure_pair_correction",
        "corrected_drift",
        "chi2_significance",
        "eigen_1m",
        "eigen_mle_1m",
        "eigen_complex_1m",
        "compress_chunks",
        "nl_phase_fit_1m",
        "multimodal_audio",
        # ann_lsh_topk, ann_ivf_topk, near_dup_lsh, multimodal_features,
        # multimodal_resize (+ new multimodal_frames/audio_stats) graduated
        # to exact oracles in round 4 (md5-derived integer planes/centroids,
        # docs-derived md5-chain media, SQL banker's-rounding resize rebuild)
    }
    rows_only = {n for n in contract.QUERIES if n not in contract.ORACLE}
    assert rows_only == known_rows_only, rows_only ^ known_rows_only


def test_suite_checksum_covers_only_demoted_entries():
    """The demoted_suite entries exist to carry in-cap evidence for entries
    OUTSIDE the cap — a promoted entry should leave its rowexpr dict (its
    direct driver row supersedes the checksum), and every covered name must
    still be a registered oracle entry."""
    from covsar_spark import contract

    covered = set()
    for rowexprs in (contract._SUITE_ROWEXPR_3, contract._SUITE_ROWEXPR_4):
        for name in rowexprs:
            assert name in contract.DRIVER_DEMOTED, f"{name} covered but not demoted"
            assert name in contract.ORACLE, f"{name} covered but has no oracle"
        covered |= set(rowexprs)
    # every demoted entry keeps an in-cap checksum row (round-7 invariant)
    uncovered = set(contract.DRIVER_DEMOTED) - covered
    assert not uncovered, f"demoted without a suite checksum row: {uncovered}"


def test_demoted_entries_still_pass_their_oracles(spark):
    """Demoted-past-the-cap oracle entries are invisible to the external
    driver gate, so regressions in them must fail HERE (round-3 advice):
    run every DRIVER_DEMOTED entry against its DuckDB oracle at sf0.001."""
    import importlib.util
    import os

    import duckdb

    from covsar_spark import contract
    from covsar_spark.schemas import TESTDATA_TABLES

    spec = importlib.util.spec_from_file_location(
        "check_contract", os.path.join(os.path.dirname(__file__), "..", "scripts", "check_contract.py")
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name in contract.DRIVER_DEMOTED:
        sql = contract.ORACLE.get(name)
        if sql is None:
            continue
        got = contract.QUERIES[name](spark, sf_dir).toPandas()
        exp = con.sql(sql).df()
        errs = cc.compare(name, got, exp)
        if errs:
            failures.append(f"{name}: {'; '.join(errs)}")
    assert not failures, "\n".join(failures)
