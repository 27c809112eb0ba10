"""Codec golden vectors + round-trip properties (FIXTURES.md F4)."""

from __future__ import annotations

import numpy as np
import pytest

from covsar_spark.operators.codecs import (
    decode_dod,
    decode_dod_many,
    decode_xor,
    decode_xor_many,
    encode_dod,
    encode_dod_many,
    encode_xor,
    encode_xor_many,
)


# --- hand-verified golden vectors -----------------------------------------


def test_dod_golden_regular_cadence():
    # t0=1000, deltas all 60 -> dod all 0: 64+64 bits header + one '0' bit per
    # point after the second = 130 bits -> 17 bytes
    ts = np.int64(1000) + 60 * np.arange(10, dtype=np.int64)
    blob = encode_dod(ts)
    assert len(blob) == (64 + 64 + 8 + 7) // 8
    # header is t0 then d0, big-endian
    assert blob[:8] == (1000).to_bytes(8, "big")
    assert blob[8:16] == (60).to_bytes(8, "big")
    assert blob[16] == 0  # eight '0' control bits
    assert np.array_equal(decode_dod(blob, 10), ts)


def test_dod_golden_small_jitter():
    # dod=+1 -> '10' + 7 bits of 64 = 0b10_1000000 (9 bits)
    ts = np.array([0, 10, 21], dtype=np.int64)  # d=10,11 -> dod=1
    blob = encode_dod(ts)
    tail = blob[16]
    assert tail >> (8 - 9 + 8) == 0b1  # first bit '1'
    assert (tail & 0b11000000) == 0b10000000
    assert np.array_equal(decode_dod(blob, 3), ts)


def test_xor_golden_constant_series():
    # identical values -> one 64-bit header + '0' per subsequent value
    v = np.full(9, 3.14159)
    blob = encode_xor(v)
    assert len(blob) == 8 + 1
    assert blob[:8] == np.float64(3.14159).tobytes()[::-1]  # big-endian bits
    assert blob[8] == 0
    assert np.array_equal(decode_xor(blob, 9), v)


def test_xor_golden_single_point():
    blob = encode_xor(np.array([1.5]))
    assert len(blob) == 8
    assert np.array_equal(decode_xor(blob, 1), np.array([1.5]))


def test_empty():
    assert encode_dod(np.array([], dtype=np.int64)) == b""
    assert encode_xor(np.array([], dtype=np.float64)) == b""
    assert len(decode_dod(b"", 0)) == 0
    assert len(decode_xor(b"", 0)) == 0


# --- round-trip properties --------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 3, 17, 60, 1440, 5000])
def test_dod_roundtrip_random(n):
    rng = np.random.default_rng(n)
    # mixture: regular cadence + jitter of every bucket size + huge jumps
    d = rng.choice([60, 60, 60, 61, 59, 300, 3600, 10**9, -50], size=n - 1) if n > 1 else []
    ts = np.concatenate([[rng.integers(-(2**40), 2**40)], d]).cumsum().astype(np.int64)
    assert np.array_equal(decode_dod(encode_dod(ts), n), ts)


@pytest.mark.parametrize(
    "case, arr",
    [
        ("monotonic_counts", np.arange(100, dtype=np.float64) * 17.0),
        ("sign_flips", np.array([1.0, -1.0, 2.5, -2.5, 0.0, -0.0, 3.0])),
        ("denormals", np.array([5e-324, 1e-310, 2.2250738585072014e-308, 0.0])),
        ("nan_inf", np.array([np.nan, np.inf, -np.inf, 1.0, np.nan])),
        ("single", np.array([42.0])),
        ("constant", np.zeros(50)),
    ],
)
def test_xor_roundtrip_cases(case, arr):
    got = decode_xor(encode_xor(arr), len(arr))
    assert np.array_equal(got.view(np.uint64), arr.view(np.uint64)), case


@pytest.mark.parametrize("n", [2, 64, 1000, 4096])
def test_xor_roundtrip_random(n):
    rng = np.random.default_rng(n)
    v = rng.normal(0, 1e6, n)
    m = rng.random(n) < 0.3
    v[m] = np.round(v[m])  # integral values -> long trailing-zero runs
    v = np.where(rng.random(n) < 0.2, 100.0, v)  # runs of equal values
    got = decode_xor(encode_xor(v), n)
    assert np.array_equal(got.view(np.uint64), v.view(np.uint64))


def test_segmented_decode_matches_scalar():
    """decode_*_many (vectorized lockstep rounds across segments, the r9
    decompress hot-path rewrite) must be BIT-identical to per-blob
    decode_dod/decode_xor on segments exercising every dod bucket, the
    zero-XOR path, empty and length-1 segments, and mixed lengths."""
    rng = np.random.default_rng(7)
    ts_list, val_list = [], []
    for _ in range(200):
        n = int(rng.integers(0, 70))
        base = int(rng.integers(0, 1 << 40))
        steps = rng.choice(
            [60, 61, 59, 3600, -120, 10**7, 10**12 // 7],
            size=max(n - 1, 0),
            p=[0.6, 0.1, 0.1, 0.08, 0.06, 0.04, 0.02],
        )
        ts = np.concatenate([[base], base + np.cumsum(steps)]) if n else np.zeros(0, np.int64)
        ts_list.append(ts.astype(np.int64))
        scale = 10.0 ** rng.integers(-3, 9, size=n).astype(np.float64)
        vals = np.where(rng.random(n) < 0.4, 0.0, rng.normal(size=n) * scale)
        if n > 3:
            vals[2] = vals[1]  # zero-XOR control path
        val_list.append(vals.astype(np.float64))
    ns = np.array([len(a) for a in ts_list], dtype=np.int64)
    tb = [encode_dod(a) for a in ts_list]
    vb = [encode_xor(a) for a in val_list]
    assert tb == encode_dod_many(ts_list)
    assert vb == encode_xor_many(val_list)
    ref_ts = np.concatenate([decode_dod(b, int(n)) for b, n in zip(tb, ns)])
    ref_vs = np.concatenate([decode_xor(b, int(n)) for b, n in zip(vb, ns)])
    assert np.array_equal(decode_dod_many(tb, ns), ref_ts)
    assert np.array_equal(
        decode_xor_many(vb, ns).view(np.uint64), ref_vs.view(np.uint64)
    )


def test_segmented_decode_empty_batch():
    assert decode_dod_many([], np.zeros(0, np.int64)).size == 0
    assert decode_xor_many([], np.zeros(0, np.int64)).size == 0


def test_compression_wins_on_regular_data():
    """Regular cadence + slowly varying counts must compress well below raw."""
    ts = np.int64(1_700_000_000) + 60 * np.arange(1440, dtype=np.int64)
    vals = np.round(np.linspace(100, 200, 1440))
    raw = 16 * 1440
    packed = len(encode_dod(ts)) + len(encode_xor(vals))
    assert packed < raw / 4, f"compression too weak: {packed} vs raw {raw}"
