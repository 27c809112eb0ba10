"""Deterministic synthetic tokens tables (FIXTURES.md F1/F2/F3). No external
data; everything a pure function of (seed, row index). Mirrors the reference's
simulation-as-oracle methodology (covsar/read_image.py:34-70,
covsar/gamma_s_sim.py:32-51): plant structure, then check the engine recovers it.

Written with pyarrow directly (no Spark needed for generation) as
Iceberg-layout parquet directories.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import EPOCH0_UNIX, HORIZON_S

SOURCES = [
    "web", "code", "books", "wiki", "news", "forums", "papers", "legal",
    "math", "chat", "docs", "mail", "social", "patents", "subs", "misc",
]
VOCAB = 50257
MAX_LEN = 2048
# source weights are Zipf-ish (computed in gen_tokens) — deliberately skewed
# so salting paths are exercised


def stable_ts_offset(doc_ids: list[str] | np.ndarray, horizon_s: int = HORIZON_S) -> np.ndarray:
    """crc32(doc_id) % horizon — matches Spark's `crc32` builtin exactly."""
    return np.array(
        [zlib.crc32(d.encode()) % horizon_s for d in doc_ids], dtype=np.int64
    )


def gen_tokens(
    n_rows: int, seed: int = 42, n_sources: int = 0, payload_tokens: bool = True
) -> dict[str, np.ndarray | list]:
    """F1 tokens table as columnar arrays. ``n_sources`` > 16 switches to
    synthetic source names (bench-scale runs that need a wider key space).
    ``payload_tokens=False`` stubs each tokens array to one element while
    keeping the full lognormal ``n_tok`` — ONLY for scale benchmarks where
    the pipeline provably never scans the tokens column (column pruning);
    correctness fixtures always carry real payloads."""
    rng = np.random.default_rng(seed)
    doc_id = np.array([f"doc-{i:012d}" for i in range(n_rows)])
    lens = np.clip(rng.lognormal(4.0, 1.2, n_rows).astype(np.int64), 1, MAX_LEN)
    stored = lens if payload_tokens else np.ones(n_rows, dtype=np.int64)
    flat = rng.integers(0, VOCAB, size=int(stored.sum()), dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(stored, out=offsets[1:])
    # honor the REQUESTED width exactly: 1..16 slices the named sources
    # (was silently all 16 — the points/sec denominator lied by up to 2x for
    # narrow requests; round-4 review); 0 = default full named set
    if n_sources <= 0:
        names = SOURCES
    elif n_sources <= len(SOURCES):
        names = SOURCES[:n_sources]
    else:
        names = [f"s{i:03d}" for i in range(n_sources)]
    w = 1.0 / np.arange(1, len(names) + 1) ** 1.1
    w /= w.sum()
    src_idx = rng.choice(len(names), size=n_rows, p=w)
    source = np.array(names, dtype=object)[src_idx]
    return {
        "doc_id": doc_id,
        "flat_tokens": flat,
        "offsets": offsets,
        "n_tok": lens.astype(np.int32),
        "source": source,
    }


def _to_arrow(cols: dict) -> pa.Table:
    # LargeList (int64 offsets): int32 offsets overflow once total token
    # count passes 2^31 (~19M payload rows at the lognormal mean) and the
    # cast raised mid-fixture-write (round-4 review)
    tokens = pa.LargeListArray.from_arrays(
        pa.array(cols["offsets"], type=pa.int64()),
        pa.array(cols["flat_tokens"], type=pa.int32()),
    )
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(cols["n_tok"], type=pa.int32()),
            "source": pa.array(cols["source"], type=pa.string()),
        }
    )


# F2 gap spec: (source, tier-seconds, list of window indices removed).
# books: minutes 10-19 of hour 3; web: all of hour 5 (FIXTURES.md F2).
GAPS: list[tuple[str, range]] = [
    ("books", range(3 * 60 + 10, 3 * 60 + 20)),  # minute-of-horizon indices
    ("web", range(5 * 60, 6 * 60)),
]


def apply_gaps(cols: dict, horizon_s: int = HORIZON_S) -> dict:
    """Deterministically drop rows landing in the F2 gap windows.

    ``horizon_s`` MUST match the horizon the pipeline will run with: gap
    placement derives from crc32 % horizon, so a fixture gapped at the
    default 7 days run at a 56-day horizon has its gaps land elsewhere and
    a gap-fill test silently validates nothing (round-4 review)."""
    off = stable_ts_offset(cols["doc_id"], horizon_s)
    minute = off // 60
    keep = np.ones(len(off), dtype=bool)
    for src, rng_ in GAPS:
        lo, hi = rng_.start, rng_.stop
        keep &= ~((cols["source"] == src) & (minute >= lo) & (minute < hi))
    idx = np.nonzero(keep)[0]
    lens = cols["offsets"][1:] - cols["offsets"][:-1]
    new_lens = lens[idx]
    new_off = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_off[1:])
    flat = np.concatenate(
        [cols["flat_tokens"][cols["offsets"][i] : cols["offsets"][i + 1]] for i in idx]
    ) if len(idx) else np.array([], dtype=np.int32)
    return {
        "doc_id": cols["doc_id"][idx],
        "flat_tokens": flat,
        "offsets": new_off,
        "n_tok": cols["n_tok"][idx],
        "source": cols["source"][idx],
    }


def write_tokens(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    gappy: bool = False,
    n_sources: int = 0,
    payload_tokens: bool = True,
    horizon_s: int = HORIZON_S,
) -> str:
    """Write the F1 (or F2) table as a parquet dir; returns the path."""
    cols = gen_tokens(n_rows, seed, n_sources=n_sources, payload_tokens=payload_tokens)
    if gappy:
        cols = apply_gaps(cols, horizon_s)
    os.makedirs(out_dir, exist_ok=True)
    tbl = _to_arrow(cols)
    # several row groups / files so Spark gets real parallelism on scan
    n_files = max(1, min(32, n_rows // 10000))
    step = (tbl.num_rows + n_files - 1) // n_files
    for f in range(n_files):
        part = tbl.slice(f * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(out_dir, f"part-{f:04d}.parquet"))
    return out_dir


def gen_planted(n_sources: int = 4, p: int = 16, seed: int = 7):
    """F3 planted rank-1 + noise series per source (decay_model analogue,
    covsar/read_image.py:55-70). Returns (source, epoch_s, value) arrays."""
    rng = np.random.default_rng(seed)
    t = np.arange(p)
    signal = 1.0 + 0.5 * np.sin(2 * np.pi * t / p)  # fixed smooth series
    rows_src, rows_ts, rows_val = [], [], []
    for s in range(n_sources):
        scale = 1.0 + s
        noise = rng.normal(0, 0.05, p)
        rows_src += [f"planted-{s}"] * p
        rows_ts += list(EPOCH0_UNIX + 60 * t)
        rows_val += list(signal * scale + noise)
    return (
        np.array(rows_src, dtype=object),
        np.array(rows_ts, dtype=np.int64),
        np.array(rows_val, dtype=np.float64),
    )
