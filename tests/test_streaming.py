"""Streaming rollup: watermarked append-mode windows must agree exactly with
the batch rollup for every finalized window."""

from __future__ import annotations

import numpy as np

from covsar_spark.datagen import write_tokens
from covsar_spark.operators.rollup import rollup_tokens, with_event_time
from covsar_spark.streaming.rollup_stream import run_stream_to_memory


def test_streaming_rollup_matches_batch(spark, tmp_path):
    path = str(tmp_path / "tok")
    write_tokens(path, 2000, seed=42)
    got = run_stream_to_memory(spark, path, "1h", name="t_stream_1h").toPandas()
    batch = rollup_tokens(with_event_time(spark.read.parquet(path)), "1h").toPandas()
    # append mode only emits windows the watermark has passed; every emitted
    # window must match batch exactly, and most windows must have emitted
    merged = got.merge(batch, on=["source", "epoch_s"], suffixes=("_s", "_b"))
    assert len(merged) == len(got), "streamed window missing from batch"
    assert len(got) >= 0.5 * len(batch), f"too few finalized windows: {len(got)}/{len(batch)}"
    for c in ("token_count", "n_docs", "max_tok", "min_tok"):
        assert np.array_equal(merged[f"{c}_s"].to_numpy(), merged[f"{c}_b"].to_numpy()), c


def test_real_decoders_roundtrip():
    """WAV and PPM decoders are REAL (stdlib + numpy): encode -> decode
    reproduces the samples/pixels exactly (up to PCM16 quantization)."""
    import numpy as np

    from covsar_spark.operators.multimodal import (
        _make_ppm,
        _make_wav,
        decode_ppm,
        decode_wav,
    )

    t = np.arange(512) / 16000.0
    samples = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    got = decode_wav(_make_wav(samples))
    assert len(got) == 512
    # PCM16 quantization: truncation (1 LSB) + the 32767-encode/32768-decode
    # scale mismatch — bounded by 2 LSB
    np.testing.assert_allclose(got, samples, rtol=0, atol=2.0 / 32767)

    rng = np.random.default_rng(3)
    ppm = _make_ppm(rng, w=8, h=4)
    pix = decode_ppm(ppm)
    assert pix.shape == (8 * 4 * 3,)
    # byte-exact: the payload tail IS the pixel buffer
    np.testing.assert_array_equal(
        (pix * 255).astype(np.uint8), np.frombuffer(ppm.split(b"\n", 3)[3], np.uint8)
    )


def test_multimodal_plumbing(spark):
    from covsar_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        synth_media,
    )

    media = synth_media(spark, n=30)
    feats = extract_features(media).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 16 for f in feats["feat"])
    # deterministic: same payload -> same sha/features on re-run
    feats2 = extract_features(media).toPandas()
    m = feats.sort_values("media_id").reset_index(drop=True)
    m2 = feats2.sort_values("media_id").reset_index(drop=True)
    assert (m["payload_sha"] == m2["payload_sha"]).all()
    fs = frame_sample(media, every=2).toPandas()
    assert set(fs["frame_idx"]) == {0, 2}  # synth y4m has n_frames=4


def test_streaming_cascade_matches_batch(spark, tmp_path):
    """Continuous-aggregate maintenance: the streamed 1h tier must equal a
    batch cascade over the same finalized 1m windows exactly (integral
    sums), and the 1m tier must hold each finalized window exactly once."""
    from covsar_spark.streaming.cascade_stream import cascade_1h_from_1m, run_cascade_stream

    path = str(tmp_path / "tok")
    write_tokens(path, 2000, seed=42)
    tier_1m, tier_1h = run_cascade_stream(spark, path, str(tmp_path / "tiers"))
    m1 = spark.read.parquet(tier_1m)
    # exactly-once: every finalized (source, window) appears once
    dup = m1.groupBy("source", "epoch_s").count().filter("count > 1").count()
    assert dup == 0
    got = (
        spark.read.parquet(tier_1h)
        .select("source", "epoch_s", "token_count", "n_docs", "max_tok", "min_tok")
        .toPandas()
        .sort_values(["source", "epoch_s"])
        .reset_index(drop=True)
    )
    want = (
        cascade_1h_from_1m(m1.drop("batch_id"))
        .toPandas()
        .sort_values(["source", "epoch_s"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for c in ("token_count", "n_docs", "max_tok", "min_tok"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_binary_file_source_roundtrip(spark, tmp_path):
    """S3 raw binary scan: the binaryFile source must deliver payload bytes
    byte-identical, feeding the same decode plumbing as synth media."""
    import hashlib

    import numpy as np

    from covsar_spark.operators.multimodal import (
        _make_ppm,
        _make_wav,
        extract_features,
        read_binary_dir,
    )

    rng = np.random.default_rng(11)
    want = {}
    for i in range(6):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            payload = _make_ppm(rng)
        elif kind == "audio":
            payload = _make_wav(np.sin(np.arange(128) / 7.0).astype(np.float32))
        else:
            payload = bytes(rng.integers(0, 256, 256, dtype=np.uint8))
        (tmp_path / f"m{i:03d}.{kind}.bin").write_bytes(payload)
        want[f"m{i:03d}"] = (kind, hashlib.sha256(payload).hexdigest())
    media = read_binary_dir(spark, str(tmp_path))
    feats = extract_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 6
    for _, r in feats.iterrows():
        kind, sha = want[r["media_id"]]
        assert r["kind"] == kind
        assert r["payload_sha"] == sha  # byte-exact through the source + Arrow


def test_stateful_totals_match_batch(spark, tmp_path):
    """applyInPandasWithState running totals: the LAST update per source must
    equal the batch aggregate exactly (integral state)."""
    from covsar_spark.streaming.stateful import run_stateful_to_memory

    path = str(tmp_path / "tok_state")
    write_tokens(path, 2000, seed=42)
    out = run_stateful_to_memory(spark, path, name="t_stateful").toPandas()
    # multiple update rows per source (one per micro-batch); take the final
    final = out.sort_values("total_docs").groupby("source").tail(1)
    batch = (
        spark.read.parquet(path)
        .groupBy("source")
        .agg({"n_tok": "sum", "*": "count"})
        .toPandas()
        .rename(columns={"sum(n_tok)": "t", "count(1)": "d"})
        .set_index("source")
    )
    assert len(final) == len(batch)
    for _, r in final.iterrows():
        assert int(r["total_tokens"]) == int(batch.loc[r["source"], "t"])
        assert int(r["total_docs"]) == int(batch.loc[r["source"], "d"])
    assert (out.groupby("source").size() >= 1).all()


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the content
    hash) must emit exactly one row per distinct content, and the surviving
    hash set must equal the batch exact_dedup's — the continuous form of
    operators/dedup.exact_dedup."""
    from covsar_spark.operators.dedup import exact_dedup
    from covsar_spark.streaming.dedup_stream import run_dedup_stream_to_memory

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs")
    # 3 files so the stream processes multiple micro-batches; duplicates in
    # the fixture span batches
    docs.repartition(3).write.parquet(path)

    got = run_dedup_stream_to_memory(spark, path, name="t_dedup_stream").toPandas()
    batch = exact_dedup(spark.read.parquet(path)).toPandas()

    assert len(got) == len(batch), (len(got), len(batch))
    assert got["h"].is_unique
    assert set(got["h"]) == set(batch["h"])


def test_resize_images_real(spark):
    """PPM resize is REAL: box-average downsample matches a direct numpy
    oracle pixel-for-pixel; non-image payloads pass through byte-identical."""
    import numpy as np

    from covsar_spark.operators.multimodal import (
        _make_ppm,
        decode_ppm,
        resize_images,
        resize_ppm,
        synth_media,
    )

    # pure-kernel oracle check: constant-color image stays constant
    rng = np.random.default_rng(8)
    flat = _make_ppm(rng, w=16, h=12)
    const = b"P6\n4 4\n255\n" + bytes([10, 20, 30] * 16)
    small = resize_ppm(const, 2, 2)
    np.testing.assert_allclose(
        decode_ppm(small).reshape(2, 2, 3),
        np.tile(np.array([10, 20, 30]) / 255.0, (2, 2, 1)),
        atol=1e-6,
    )
    # 2x2-box mean oracle on a random image
    pix = decode_ppm(flat).reshape(12, 16, 3)
    want = pix.reshape(6, 2, 8, 2, 3).mean(axis=(1, 3))
    got = decode_ppm(resize_ppm(flat, 8, 6)).reshape(6, 8, 3)
    # 0.5 = round() quantum; small slack for float32 decode error
    assert np.abs(got * 255 - want * 255).max() <= 0.51

    media = synth_media(spark, n=12)
    out = resize_images(media, out_w=8, out_h=6).toPandas()
    src = media.toPandas()
    assert len(out) == 12
    for r in out.itertuples():
        if r.kind == "image":
            assert (r.width, r.height) == (8, 6)
            assert decode_ppm(bytes(r.payload)).shape == (8 * 6 * 3,)
        else:
            orig = src[src["media_id"] == r.media_id]["payload"].iloc[0]
            assert bytes(r.payload) == bytes(orig)


def test_audio_features_real_dsp(spark):
    """Pure 440 Hz tone: spectral centroid lands at ~440 Hz, RMS at
    ~1/sqrt(2) of the amplitude, ZCR at ~2*f/sr — real FFT DSP, not a fake."""
    import numpy as np
    import pandas as pd

    from covsar_spark.operators.multimodal import MEDIA_SCHEMA, _make_wav, audio_features

    sr, f, n = 16000, 440.0, 4096
    t = np.arange(n) / sr
    payload = _make_wav((0.8 * np.sin(2 * np.pi * f * t)).astype(np.float32), rate=sr)
    media = spark.createDataFrame(
        [("a-1", "audio", payload, (None, None, sr, None)),
         ("v-1", "video", b"\x00" * 16, (4, 4, None, 8))],
        MEDIA_SCHEMA,
    )
    out = audio_features(media).toPandas()
    assert list(out["media_id"]) == ["a-1"]  # non-audio filtered out
    row = out.iloc[0]
    assert abs(row.spectral_centroid_hz - f) < 15.0, row.spectral_centroid_hz
    assert abs(row.rms - 0.8 / np.sqrt(2)) < 0.01
    assert abs(row.zcr - 2 * f / sr) < 0.005


def test_resize_ppm_large_and_upsample():
    """The vectorized reduceat resample must equal the per-pixel loop oracle
    at realistic thumbnail sizes (non-divisible boxes) AND when upsampling
    (degenerate boxes -> nearest neighbor); maxval > 255 is rejected."""
    import numpy as np
    import pytest

    from covsar_spark.operators.multimodal import decode_ppm, resize_ppm

    def loop_resize(payload, out_w, out_h):
        parts = payload.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        pix = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
        ys = (np.arange(out_h + 1) * h) // out_h
        xs = (np.arange(out_w + 1) * w) // out_w
        out = np.empty((out_h, out_w, 3), dtype=np.uint8)
        for oy in range(out_h):
            y0, y1 = ys[oy], max(ys[oy + 1], ys[oy] + 1)
            row = pix[y0:y1]
            for ox in range(out_w):
                x0, x1 = xs[ox], max(xs[ox + 1], xs[ox] + 1)
                out[oy, ox] = row[:, x0:x1].reshape(-1, 3).mean(axis=0).round()
        return out

    rng = np.random.default_rng(17)
    big = rng.integers(0, 256, 300 * 200 * 3, dtype=np.uint8)
    payload = b"P6\n300 200\n255\n" + big.tobytes()
    # non-divisible downsample: 300x200 -> 97x41
    got = decode_ppm(resize_ppm(payload, 97, 41)).reshape(41, 97, 3)
    want = loop_resize(payload, 97, 41).astype(np.float32) / 255.0
    np.testing.assert_array_equal(got, want)
    # upsample: 4x3 -> 10x7 (nearest-neighbor degenerate boxes)
    tiny = b"P6\n4 3\n255\n" + rng.integers(0, 256, 36, dtype=np.uint8).tobytes()
    got_u = decode_ppm(resize_ppm(tiny, 10, 7)).reshape(7, 10, 3)
    want_u = loop_resize(tiny, 10, 7).astype(np.float32) / 255.0
    np.testing.assert_array_equal(got_u, want_u)
    # 2-byte-sample P6 rejected loudly instead of silently misdecoded
    with pytest.raises(ValueError, match="maxval"):
        resize_ppm(b"P6\n2 2\n65535\n" + bytes(24), 1, 1)
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))


def test_media_from_docs_oracle_roundtrip(spark):
    """Docs-derived media: payloads built by codegen'd md5 chains must be
    REAL-decodable (P6/WAV parse), and the integer checksums must equal a
    direct hashlib reconstruction of the same chains."""
    import hashlib

    import numpy as np

    from covsar_spark.operators.multimodal import (
        DOC_PPM_HEADER,
        DOC_WAV_HEADER,
        DOC_Y4M_FRAME,
        DOC_Y4M_HEADER,
        media_from_docs,
        media_oracle_features,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = media_oracle_features(media_from_docs(docs, n=12)).toPandas()
    src = docs.filter("doc_id < 12").select("doc_id", "text").toPandas()
    assert len(out) == 12
    texts = dict(zip(src["doc_id"].astype(int), src["text"]))
    for r in out.itertuples():
        doc_id = int(r.media_id)
        seed = hashlib.md5(texts[doc_id].encode()).hexdigest()
        n_chains = {"image": 36, "audio": 32, "video": 12}[r.kind]
        hexbody = "".join(
            hashlib.md5(f"{seed}:{r.kind}:{j}".encode()).hexdigest() for j in range(n_chains)
        )
        chains = bytes.fromhex(hexbody)
        if r.kind == "video":
            # Y4M: markers interleaved between the two frames' chain planes
            payload = (DOC_Y4M_HEADER + DOC_Y4M_FRAME + chains[:96]
                       + DOC_Y4M_FRAME + chains[96:])
        else:
            header = {"image": DOC_PPM_HEADER, "audio": DOC_WAV_HEADER}[r.kind]
            payload = header + chains
        assert r.n_bytes == len(payload)
        assert r.payload_sha == hashlib.sha256(payload.hex().encode()).hexdigest()
        body = np.frombuffer(chains, dtype=np.uint8)
        if r.kind == "audio":
            want = int(np.frombuffer(body.tobytes(), dtype="<i2").astype(np.int64).sum())
            assert int(r.n_samples) == 256
        else:
            want = int(body.astype(np.int64).sum())
            assert int(r.n_samples) == {"image": 576, "video": 192}[r.kind]
        assert int(r.byte_sum) == want


def test_decode_y4m_real():
    """Y4M container decode is REAL: planted plane bytes come back exactly,
    frame count and luma/chroma split are honored, malformed streams fail."""
    import numpy as np
    import pytest

    from covsar_spark.operators.multimodal import decode_y4m, y4m_frames_raw

    w, h = 4, 2
    y0 = np.arange(8, dtype=np.uint8)          # frame 0 luma
    uv0 = np.array([200, 201, 210, 211], np.uint8)  # 2x1 U + 2x1 V
    y1 = np.arange(100, 108, dtype=np.uint8)
    uv1 = np.array([10, 11, 20, 21], np.uint8)
    payload = (b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n"
               + b"FRAME\n" + y0.tobytes() + uv0.tobytes()
               + b"FRAME\n" + y1.tobytes() + uv1.tobytes())
    lum = decode_y4m(payload)
    assert lum.shape == (16,)  # 2 frames x 4x2 luma
    np.testing.assert_array_equal((lum * 255).astype(np.uint8), np.concatenate([y0, y1]))
    raw = y4m_frames_raw(payload)
    np.testing.assert_array_equal(raw, np.concatenate([y0, uv0, y1, uv1]))
    with pytest.raises(ValueError, match="Y4M"):
        decode_y4m(b"RIFFxxxx")
    with pytest.raises(ValueError, match="C420"):
        decode_y4m(b"YUV4MPEG2 W4 H2 C444\nFRAME\n" + bytes(24))
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(b"YUV4MPEG2 W4 H2 C420\nJUNK!\n" + bytes(12))


def test_frame_features_real_decode(spark):
    """frame_features decodes Y4M for REAL: per-frame mean luma equals a
    direct numpy computation on the planted plane bytes."""
    import numpy as np
    import pandas as pd

    from covsar_spark.operators.multimodal import MEDIA_SCHEMA, frame_features

    w, h = 4, 2
    y0 = np.arange(8, dtype=np.uint8)
    y1 = np.arange(100, 108, dtype=np.uint8)
    uv = bytes(4)
    payload = (b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n"
               + b"FRAME\n" + y0.tobytes() + uv + b"FRAME\n" + y1.tobytes() + uv)
    media = spark.createDataFrame(
        [("v-0", "video", payload, (w, h, None, 2)),
         ("a-0", "audio", b"not-video", (None, None, 16000, None))],
        MEDIA_SCHEMA,
    )
    got = frame_features(media).toPandas().sort_values("frame_idx")
    assert list(got["media_id"]) == ["v-0", "v-0"]
    np.testing.assert_allclose(
        got["mean_luma"].to_numpy(),
        [y0.mean() / 255.0, y1.mean() / 255.0],
        atol=1e-6,
    )


def test_cascade_stream_restart_resumes_exactly_once(spark, tmp_path):
    """The round-4 review finding: a RESTARTED cascade stream must resume
    batch numbering from its checkpoint (not re-number from 0 and clobber
    existing batch partitions). Two invocations over a growing source dir
    must leave every (source, window) exactly once and equal the batch
    cascade of the final 1m tier."""
    from covsar_spark.operators.rollup import rollup_tokens, with_event_time
    from covsar_spark.streaming.cascade_stream import cascade_1h_from_1m, run_cascade_stream

    src = tmp_path / "tok"
    write_tokens(str(src / "part1"), 1200, seed=42)
    out = str(tmp_path / "tiers")
    tier_1m, tier_1h = run_cascade_stream(spark, str(src / "*"), out)
    n_first = spark.read.parquet(tier_1m).count()

    # new data arrives; the stream restarts from the same checkpoint. The
    # new events carry event times inside the already-passed watermark, so
    # correct streaming semantics drop them as late — the checkpoint
    # evidence is that the restart does NOT re-read the old files and
    # re-emit every window under restarted batch numbering (the
    # pre-checkpoint behavior: duplicated windows + clobbered partitions).
    write_tokens(str(src / "part2"), 1200, seed=43)
    tier_1m, tier_1h = run_cascade_stream(spark, str(src / "*"), out)

    m1 = spark.read.parquet(tier_1m)
    assert m1.count() == n_first  # no reprocessing, no clobber, no dup-emit
    dup = m1.groupBy("source", "epoch_s").count().filter("count > 1").count()
    assert dup == 0, "restart re-emitted an already-finalized window"
    got = (
        spark.read.parquet(tier_1h)
        .select("source", "epoch_s", "token_count", "n_docs")
        .toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    )
    want = (
        cascade_1h_from_1m(m1.drop("batch_id", "epoch_day"))
        .select("source", "epoch_s", "token_count", "n_docs")
        .toPandas().sort_values(["source", "epoch_s"]).reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for c in ("token_count", "n_docs"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
