"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a struct of metadata; the
decode / feature-extract / resize / frame-sample steps are Pandas UDFs over
`mapInPandas`.

Decode status per modality:
- audio: REAL — WAV/PCM16 parsed with the stdlib `wave` module + numpy
  frombuffer (no external libs needed).
- image: REAL — binary PPM (P6) header + raw RGB parsing in numpy; resize
  (box-average resample + re-encode) is REAL numpy too.
- video: REAL for uncompressed YUV4MPEG2 (Y4M) streams — container demux +
  per-frame C420 plane extraction in pure numpy (`decode_y4m`). COMPRESSED
  codecs (h264 etc.) need ffmpeg-class libs absent from this image and fall
  back to `FAKE_DECODE`, a clearly-marked deterministic fake. The Spark-side
  plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
  identical either way and fully tested.
"""

from __future__ import annotations

import hashlib
import io
import math
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 16


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL audio decode: WAV/PCM16 -> float32 samples in [-1, 1)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode: binary PPM (P6) -> float32 pixels in [0, 1],
    flattened HxWx3."""
    # header: b"P6\n<w> <h>\n255\n" then raw RGB bytes
    parts = payload.split(b"\n", 3)
    if parts[0] != b"P6" or len(parts) < 4:
        raise ValueError("not a binary PPM")
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval > 255:
        raise ValueError("P6 maxval > 255 (2-byte samples) not supported")
    pix = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
    return pix.astype(np.float32) / float(maxval)


def decode_y4m(payload: bytes) -> np.ndarray:
    """REAL video decode: uncompressed YUV4MPEG2 (Y4M) container -> float32
    luma frames in [0, 1], flattened (n_frames * h * w).

    Pure-numpy container parse (stream header 'YUV4MPEG2 W.. H.. ... C420\\n',
    then per frame 'FRAME\\n' + raw 4:2:0 planes). Covers the uncompressed
    interchange format end-to-end; COMPRESSED codecs (h264 etc.) still need
    ffmpeg-class libs absent from this image and fall back to FAKE_DECODE.
    """
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = None
    c420 = True
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            c420 = tok[1:].startswith(b"420")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if not c420:
        raise ValueError("only C420 supported")
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    pos = nl + 1
    lumas = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        plane = np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=start)
        lumas.append(plane[: w * h])
        pos = start + frame_bytes
    return (np.concatenate(lumas).astype(np.float32) / 255.0) if lumas else np.zeros(0, np.float32)


def y4m_frames_raw(payload: bytes) -> np.ndarray:
    """All raw plane bytes (Y+U+V, every frame) of a Y4M stream as uint8 —
    the checksum view the SQL oracle can recompute from the md5 chains.
    Validates the same invariants as `decode_y4m` (header W/H, FRAME
    markers, full frames) so a corrupted stream raises instead of yielding
    silently wrong checksum bytes."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    parts = []
    pos = nl + 1
    w = h = 0
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        if len(payload) - (fnl + 1) < frame_bytes:
            raise ValueError("truncated Y4M frame")
        parts.append(np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=fnl + 1))
        pos = fnl + 1 + frame_bytes
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)


# ---------------------------------------------------------------------------
# STUB: deterministic fake decode for COMPRESSED video only (codec libs are
# not in this image; uncompressed Y4M decodes for REAL above). A real
# deployment swaps this for ffmpeg decoding; everything around it stays
# unchanged.
# ---------------------------------------------------------------------------


def FAKE_DECODE(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic pseudo-decode: bytes -> fixed-dim float32 'pixels'."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    return np.random.default_rng(seed).random(64, dtype=np.float32)


def decode(payload: bytes, kind: str) -> np.ndarray:
    if kind == "audio":
        return decode_wav(payload)
    if kind == "image":
        return decode_ppm(payload)
    if payload.startswith(b"YUV4MPEG2"):
        return decode_y4m(payload)  # video: REAL for uncompressed Y4M
    return FAKE_DECODE(payload, kind)  # compressed codecs: declared stub


def _make_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _make_ppm(rng: np.random.Generator, w: int = 16, h: int = 12) -> bytes:
    pix = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()


def _make_y4m(rng: np.random.Generator, w: int = 8, h: int = 8, n_frames: int = 4) -> bytes:
    """VALID uncompressed Y4M (C420): stream header + per-frame marker +
    raw Y/U/V planes — the real `decode_y4m` parses it."""
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h)]
    for _ in range(n_frames):
        out.append(b"FRAME\n")
        out.append(rng.integers(0, 256, frame_bytes, dtype=np.uint8).tobytes())
    return b"".join(out)


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table: VALID wav + ppm + y4m payloads —
    all three modalities parse through the REAL decoders."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload = _make_ppm(rng)
            meta = (16, 12, None, None)
        elif kind == "audio":
            t = np.arange(256) / 16000.0
            payload = _make_wav(np.sin(2 * np.pi * (200 + 10 * i) * t).astype(np.float32))
            meta = (None, None, 16000, None)
        else:
            payload = _make_y4m(rng)
            meta = (8, 8, None, 4)
        rows.append((f"m-{i:06d}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """decode -> pooled feature vector, one Arrow batch at a time.

    Output: (media_id, kind, feat array<float>, payload_sha string). The
    sha proves byte-exact payload pass-through across the Arrow boundary.
    Decode is inherently per-item (as a real PIL/libsndfile decode would
    be); the pooling vectorizes per batch."""

    def op(it):
        for pdf in it:
            feats, shas = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = decode(bytes(payload), kind)
                k = (len(raw) // dim) * dim
                pooled = raw[:k].reshape(dim, -1).mean(axis=1) if k >= dim else np.resize(raw, dim)
                feats.append(pooled.astype(np.float32))
                shas.append(hashlib.sha256(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "payload_sha": shas,
                }
            )

    return media.mapInPandas(
        op, "media_id string, kind string, feat array<float>, payload_sha string"
    )


def read_binary_dir(spark, path: str, pattern: str = "*.bin") -> DataFrame:
    """S3 raw binary scan (covsar/isceio.py:131-143 `np.fromfile` analogue):
    Spark's built-in binaryFile source — one row per file with (path,
    modificationTime, length, content) — mapped onto MEDIA_SCHEMA. Kind is
    derived from the filename stem (`<id>.<kind>.bin`); metadata defaults
    ride along for the decode step."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    return raw.select(
        F.element_at(F.split(base, r"\."), 1).alias("media_id"),
        F.element_at(F.split(base, r"\."), 2).alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (metadata-driven; pair with `frame_features` for real decoded frames)."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))).alias("frame_idx"),
    )


def frame_features(media: DataFrame, every: int = 1) -> DataFrame:
    """REAL per-frame video features: decode each Y4M stream once per Arrow
    batch, then emit (media_id, frame_idx, mean_luma, std_luma) for every
    ``every``-th frame — the frame-sampling step of a multimodal training
    pipeline with the decode actually performed (no stub on this path)."""

    def op(it):
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "mean_luma": [], "std_luma": []}
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                b = bytes(payload)
                if not b.startswith(b"YUV4MPEG2"):
                    continue  # compressed codecs have no real decoder here
                nl = b.find(b"\n")
                w = h = 0
                for tok in b[:nl].split(b" ")[1:]:
                    if tok[:1] == b"W":
                        w = int(tok[1:])
                    elif tok[:1] == b"H":
                        h = int(tok[1:])
                # stats from the EXACT integer plane bytes (float64 ops in a
                # fixed order: sum -> /n -> /255), so a SQL oracle summing
                # the same bytes lands on the identical double
                try:
                    fb = w * h + 2 * ((w // 2) * (h // 2))
                    raw = y4m_frames_raw(b).reshape(-1, fb)
                except ValueError:
                    continue  # malformed/truncated stream: skip the row,
                    # consistent with the compressed-codec skip above —
                    # never fail the whole job on one bad payload
                for idx in range(0, raw.shape[0], every):
                    ints = raw[idx, : w * h].astype(np.int64)
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["mean_luma"].append(float(ints.sum()) / (w * h) / 255.0)
                    out["std_luma"].append(float(ints.astype(np.float64).std()) / 255.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op, "media_id string, frame_idx long, mean_luma double, std_luma double"
    )


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize (pure numpy, no external libs): decode P6 PPM,
    box-average (area) downsample / nearest-neighbor upsample to
    (out_w, out_h), re-encode as P6. Deterministic and exactly testable."""
    parts = payload.split(b"\n", 3)
    if parts[0] != b"P6" or len(parts) < 4:
        raise ValueError("not a binary PPM")
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval > 255:
        raise ValueError("P6 maxval > 255 (2-byte samples) not supported")
    pix = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    # index-map resample: for each output pixel, average the input box it
    # covers (degenerates to nearest-neighbor when upsampling). Fully
    # vectorized: add.reduceat over the box boundaries in both axes — a
    # degenerate boundary pair (idx[i] >= idx[i+1], the upsampling case)
    # yields the single row/col at idx[i], which is exactly the
    # nearest-neighbor box the loop form computed.
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    rowsum = np.add.reduceat(pix.astype(np.float64), ys[:-1], axis=0)
    boxsum = np.add.reduceat(rowsum, xs[:-1], axis=1)
    ny = np.maximum(np.diff(ys), 1)
    nx = np.maximum(np.diff(xs), 1)
    mean = boxsum / (ny[:, None, None] * nx[None, :, None])
    out = mean.round().astype(np.uint8)
    return b"P6\n%d %d\n%d\n" % (out_w, out_h, maxval) + out.tobytes()


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 6) -> DataFrame:
    """Distributed image resize over the opaque-binary column: image rows are
    re-encoded at (out_w, out_h) with REAL numpy resampling; non-image rows
    pass through untouched (payload byte-identical). Same mapInPandas batch
    shape as extract_features — the per-item decode loop is inherent to
    decoding, everything else is vectorized."""

    def op(it):
        for pdf in it:
            payloads, widths, heights = [], [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if kind == "image":
                    payloads.append(resize_ppm(bytes(payload), out_w, out_h))
                    widths.append(out_w)
                    heights.append(out_h)
                else:
                    payloads.append(bytes(payload))
                    widths.append(meta["width"] if meta is not None else None)
                    heights.append(meta["height"] if meta is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return media.mapInPandas(
        op, "media_id string, kind string, payload binary, width int, height int"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio DSP over the real WAV decoder: per audio row RMS,
    zero-crossing rate, and FFT spectral centroid in Hz (numpy rfft, Hann
    window + power weighting — the standard centroid definition; a
    rectangular-window magnitude centroid leaks a pure 440 Hz tone up to
    ~770 Hz). Non-audio rows are filtered JVM-side before any payload ships
    through Arrow."""

    def op(it):
        for pdf in it:
            ids, rms, zcr, cent = [], [], [], []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                x = decode_wav(bytes(payload))
                sr = int(meta["sample_rate"] or 16000)
                ids.append(media_id)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                zcr.append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                )
                if len(x):
                    pw = np.abs(np.fft.rfft(x.astype(np.float64) * np.hanning(len(x)))) ** 2
                    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
                    s = pw.sum()
                    cent.append(float((freqs * pw).sum() / s) if s > 0 else 0.0)
                else:
                    cent.append(0.0)
            yield pd.DataFrame(
                {"media_id": ids, "rms": rms, "zcr": zcr, "spectral_centroid_hz": cent}
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        op, "media_id string, rms double, zcr double, spectral_centroid_hz double"
    )


# ---------------------------------------------------------------------------
# Oracle-verifiable media: payloads derived deterministically FROM the
# documents table with pure JVM-side expressions (md5 chains -> unhex), so a
# SQL oracle can rebuild every byte and the REAL decoders prove the
# Spark-side round trip bit-for-bit (covsar/isceio.py raw-binary analogue
# with a verifiable synthesis instead of satellite files).
# ---------------------------------------------------------------------------

DOC_IMG_W, DOC_IMG_H = 16, 12  # 576 body bytes = 36 md5 chains
DOC_AUDIO_N = 256  # PCM16 samples = 512 bytes = 32 chains
DOC_VID_W, DOC_VID_H, DOC_VID_FRAMES = 8, 8, 2  # C420: 96 plane bytes/frame
DOC_VIDEO_CHAINS = DOC_VID_FRAMES * (DOC_VID_W * DOC_VID_H * 3 // 2) // 16  # 12
DOC_PPM_HEADER = b"P6\n%d %d\n255\n" % (DOC_IMG_W, DOC_IMG_H)
DOC_Y4M_HEADER = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (DOC_VID_W, DOC_VID_H)
DOC_Y4M_FRAME = b"FRAME\n"


def _wav_header(n_samples: int = DOC_AUDIO_N, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.zeros(n_samples, dtype="<i2").tobytes())
    return buf.getvalue()[:44]


DOC_WAV_HEADER = _wav_header()


def _chain_hex(seed, kind: str, n_chains: int) -> F.Column:
    """Concatenated md5 chain: md5(seed || ':kind:j') for j in 0..n-1 —
    16 payload bytes per link, identical in any engine with md5()."""
    return F.concat(*[F.md5(F.concat(seed, F.lit(f":{kind}:{j}"))) for j in range(n_chains)])


def media_from_docs(docs: DataFrame, n: int = 64) -> DataFrame:
    """MEDIA_SCHEMA table whose payload bytes derive from md5(text) chains:
    doc_id % 3 picks the modality; ALL THREE kinds get REAL decodable
    containers (P6 PPM, 44-byte PCM16 WAV, Y4M with per-frame markers
    interleaved between the chain planes). All construction is codegen'd
    string/binary expressions — no UDF, no driver state."""
    d = docs.filter(F.col("doc_id") < n).select(
        F.col("doc_id"), F.md5(F.col("text").cast("binary")).alias("seed")
    )
    m3 = F.col("doc_id") % 3
    kind = F.when(m3 == 0, F.lit("image")).when(m3 == 1, F.lit("audio")).otherwise(F.lit("video"))
    vid_chains = _chain_hex(F.col("seed"), "video", DOC_VIDEO_CHAINS)
    fhex = DOC_VID_W * DOC_VID_H * 3 // 2 * 2  # hex chars per frame's planes
    video_hex = F.concat(
        F.lit(DOC_Y4M_HEADER.hex()),
        *[
            F.concat(F.lit(DOC_Y4M_FRAME.hex()), F.substring(vid_chains, fr * fhex + 1, fhex))
            for fr in range(DOC_VID_FRAMES)
        ],
    )
    payload_hex = (
        F.when(m3 == 0, F.concat(F.lit(DOC_PPM_HEADER.hex()),
                                 _chain_hex(F.col("seed"), "image", DOC_IMG_W * DOC_IMG_H * 3 // 16)))
        .when(m3 == 1, F.concat(F.lit(DOC_WAV_HEADER.hex()),
                                _chain_hex(F.col("seed"), "audio", DOC_AUDIO_N * 2 // 16)))
        .otherwise(video_hex)
    )
    meta = F.struct(
        F.when(m3 == 0, F.lit(DOC_IMG_W)).when(m3 == 2, F.lit(DOC_VID_W)).cast("int").alias("width"),
        F.when(m3 == 0, F.lit(DOC_IMG_H)).when(m3 == 2, F.lit(DOC_VID_H)).cast("int").alias("height"),
        F.when(m3 == 1, F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(m3 == 2, F.lit(DOC_VID_FRAMES)).cast("int").alias("n_frames"),
    )
    return d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        kind.alias("kind"),
        F.unhex(payload_hex).alias("payload"),
        meta.alias("meta"),
    )


def media_oracle_features(media: DataFrame) -> DataFrame:
    """REAL decode -> integer checksums a SQL oracle can replay: per row
    (media_id, kind, n_bytes, payload_sha = sha256 of the lowercase-hex
    payload, byte_sum = exact integer sum of DECODED content — pixel bytes
    for image, signed PCM16 samples for audio, raw bytes for video — and
    n_samples = decoded element count). Exactness notes: PCM16/32768 is a
    power-of-two scale (float32-exact both ways); pixel/255 round-trips
    within 1e-5 of the integer so rint() recovers it exactly."""

    def op(it):
        for pdf in it:
            out = {"media_id": [], "kind": [], "n_bytes": [], "payload_sha": [],
                   "byte_sum": [], "n_samples": []}
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                if kind == "image":
                    raw = decode_ppm(b)
                    ints = np.rint(raw.astype(np.float64) * 255.0).astype(np.int64)
                    bsum, ns = int(ints.sum()), len(ints)
                elif kind == "audio":
                    raw = decode_wav(b)
                    ints = np.rint(raw.astype(np.float64) * 32768.0).astype(np.int64)
                    bsum, ns = int(ints.sum()), len(ints)
                elif b.startswith(b"YUV4MPEG2"):
                    # REAL container parse: sum of every decoded plane byte
                    planes = y4m_frames_raw(b)
                    bsum, ns = int(planes.astype(np.int64).sum()), len(planes)
                else:  # opaque (compressed-codec) video: raw byte checksum
                    bsum, ns = int(np.frombuffer(b, dtype=np.uint8).sum()), None
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                out["n_bytes"].append(len(b))
                out["payload_sha"].append(hashlib.sha256(b.hex().encode()).hexdigest())
                out["byte_sum"].append(bsum)
                out["n_samples"].append(ns)
            pdf_out = pd.DataFrame(out)
            pdf_out["n_samples"] = pdf_out["n_samples"].astype("Int64")
            yield pdf_out

    return media.mapInPandas(
        op,
        "media_id string, kind string, n_bytes long, payload_sha string, "
        "byte_sum long, n_samples long",
    )


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL WAV decode -> EXACTLY-replayable stats: RMS and zero-crossing
    rate computed from the recovered integer PCM16 samples in a fixed
    float64 op order (sum_sq -> /n -> sqrt -> /32768), so a SQL oracle
    summing the same samples lands on the bit-identical double. The
    float32 DSP path (spectral centroid etc.) stays in `audio_features`."""

    def op(it):
        for pdf in it:
            out = {"media_id": [], "n_samples": [], "rms": [], "zcr": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                x = decode_wav(bytes(payload))
                s = np.rint(x.astype(np.float64) * 32768.0).astype(np.int64)
                n = len(s)
                sum_sq = int((s * s).sum())
                # math.sqrt, NOT ** 0.5: libm pow(x, 0.5) is not correctly
                # rounded and diverges from DuckDB's sqrt() in the last ulp
                # for ~0.09% of inputs — which the bit-exact gate would see
                rms = math.sqrt(sum_sq / n) / 32768.0 if n else 0.0
                neg = s < 0
                zc = int((neg[1:] != neg[:-1]).sum())
                out["media_id"].append(media_id)
                out["n_samples"].append(n)
                out["rms"].append(rms)
                out["zcr"].append(zc / (n - 1) if n > 1 else 0.0)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        op, "media_id string, n_samples long, rms double, zcr double"
    )
