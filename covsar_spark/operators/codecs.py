"""Tier-table compression: Gorilla XOR (values) + delta-of-delta (timestamps).

The reference's closest analogue is its raw binary pack-to-file sink
(`data.tofile`, covsar/isceio.py:13-35); this module replaces it with the
standard time-series codecs (Facebook Gorilla, VLDB'15), implemented as
vectorized numpy bit-packing suitable for pandas UDFs — no per-row Python in
the encoder: all control decisions and bit layouts are computed as arrays and
packed with a single scatter.

Formats (documented here; golden vectors in tests/test_codecs.py):

delta-of-delta timestamps (int64 epoch units):
  [t0: 64 bits raw] [d0 = t1-t0: 64 bits raw] then per point i >= 2,
  dod = d_i - d_{i-1} encoded as
    dod == 0                ->  '0'
    dod in [-63, 64]        ->  '10'   + 7  bits of (dod + 63)
    dod in [-255, 256]      ->  '110'  + 9  bits of (dod + 255)
    dod in [-2047, 2048]    ->  '1110' + 12 bits of (dod + 2047)
    else                    ->  '1111' + 64 bits raw (two's complement)

Gorilla XOR values (float64 bits):
  [v0: 64 bits raw] then per value i >= 1, x = bits(v_i) ^ bits(v_{i-1}):
    x == 0 -> '0'
    else   -> '1' + 5 bits leading-zero count (capped 31)
                  + 6 bits (meaningful_len - 1)
                  + meaningful bits
  Deviation from the paper: the previous-window reuse rule ('10' control) is
  dropped so every value's layout is a pure function of its own XOR — this
  makes the encoder fully vectorizable (branch-free across the array) at a
  small compression cost.

Point counts are stored out-of-band (CHUNK_SCHEMA.n_points).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_ONE = _U64(1)
_M64 = (1 << 64) - 1


def _i2u(x: int) -> np.uint64:
    """int64 scalar -> two's-complement uint64."""
    return _U64(int(x) & _M64)


def _u2i(v: int) -> int:
    """uint64 scalar -> signed int64 value."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _pack_fields(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack variable-width big-endian bit fields into a byte string.

    ``vals`` uint64 (only low ``nbits`` significant, already masked),
    ``nbits`` int64 in [1, 64]. Fully vectorized: each field spans <= 2
    words; disjoint bit regions let `np.add.at` act as scatter-OR.
    """
    if len(vals) == 0:
        return b""
    nbits = nbits.astype(np.int64)
    offs = np.zeros(len(nbits) + 1, dtype=np.int64)
    np.cumsum(nbits, out=offs[1:])
    total = int(offs[-1])
    nwords = (total + 63) // 64 + 1
    words = np.zeros(nwords, dtype=_U64)
    o = offs[:-1]
    w = (o >> 6).astype(np.int64)
    s = (o & 63).astype(np.int64)
    first = np.minimum(64 - s, nbits)
    rem = nbits - first
    part1 = (vals >> rem.astype(_U64)) << (64 - s - first).astype(_U64)
    np.add.at(words, w, part1)
    m2 = rem > 0
    if m2.any():
        r = rem[m2].astype(_U64)
        low = vals[m2] & ((_ONE << r) - _ONE)
        np.add.at(words, w[m2] + 1, low << (_U64(64) - r))
    nbytes = (total + 7) // 8
    return words.byteswap().tobytes()[:nbytes]


class _BitReader:
    """Sequential big-endian bit reader (decode is the cold read path)."""

    __slots__ = ("words", "pos", "total")

    def __init__(self, blob: bytes):
        pad = (-len(blob)) % 8
        buf = blob + b"\x00" * pad
        self.words = np.frombuffer(buf, dtype=">u8").astype(_U64)
        self.pos = 0
        self.total = len(blob) * 8

    def read(self, nbits: int) -> int:
        o, self.pos = self.pos, self.pos + nbits
        w, s = o >> 6, o & 63
        first = min(64 - s, nbits)
        v = (int(self.words[w]) >> (64 - s - first)) & ((1 << first) - 1)
        rem = nbits - first
        if rem:
            v = (v << rem) | (int(self.words[w + 1]) >> (64 - rem))
        return v


# ---------------------------------------------------------------------------
# delta-of-delta timestamps
# ---------------------------------------------------------------------------

_DOD_BUCKETS = (  # (bias, payload_bits, control_value, control_bits)
    (63, 7, 0b10, 2),
    (255, 9, 0b110, 3),
    (2047, 12, 0b1110, 4),
)


def encode_dod(ts: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return b""
    head_v = [_i2u(ts[0])]
    head_n = [64]
    if n == 1:
        return _pack_fields(np.array(head_v, dtype=_U64), np.array(head_n))
    d = np.diff(ts)
    head_v.append(_i2u(d[0]))
    head_n.append(64)
    dod = np.diff(d)  # len n-2
    ctrl = np.empty(len(dod), dtype=_U64)
    cbits = np.empty(len(dod), dtype=np.int64)
    pay = np.empty(len(dod), dtype=_U64)
    pbits = np.empty(len(dod), dtype=np.int64)
    done = np.zeros(len(dod), dtype=bool)
    z = dod == 0
    ctrl[z], cbits[z], pay[z], pbits[z] = _U64(0), 1, _U64(0), 0
    done |= z
    for bias, pb, cv, cb in _DOD_BUCKETS:
        m = ~done & (dod >= -bias) & (dod <= bias + 1)
        ctrl[m], cbits[m] = _U64(cv), cb
        pay[m] = (dod[m] + bias).astype(np.int64).view(_U64)
        pbits[m] = pb
        done |= m
    m = ~done
    ctrl[m], cbits[m] = _U64(0b1111), 4
    pay[m] = dod[m].view(_U64)
    pbits[m] = 64
    # interleave control/payload fields (payload dropped where 0 bits)
    fields_v = np.empty(2 * len(dod), dtype=_U64)
    fields_n = np.empty(2 * len(dod), dtype=np.int64)
    fields_v[0::2], fields_n[0::2] = ctrl, cbits
    fields_v[1::2], fields_n[1::2] = pay, pbits
    keep = fields_n > 0
    all_v = np.concatenate([np.array(head_v, dtype=_U64), fields_v[keep]])
    all_n = np.concatenate([np.array(head_n, dtype=np.int64), fields_n[keep]])
    return _pack_fields(all_v, all_n)


def decode_dod(blob: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(blob)
    out[0] = _u2i(r.read(64))
    if n == 1:
        return out
    d = _u2i(r.read(64))
    out[1] = out[0] + d
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _u2i(r.read(64))
        d += dod
        out[i] = out[i - 1] + d
    return out


# ---------------------------------------------------------------------------
# Gorilla XOR values
# ---------------------------------------------------------------------------


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x > 0)."""
    # float64 exponent trick is unsafe past 2^53; use bit-halving
    n = np.full(x.shape, 64, dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (_ONE << _U64(shift))
        n[m] -= shift
        v[m] >>= _U64(shift)
    n[x > 0] -= 1  # n currently counts bits to the right of the MSB + 1
    return np.where(x == 0, 64, n)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64."""
    iso = x & (~x + _ONE)  # lowest set bit
    return np.where(x == 0, 64, 63 - _clz64(iso))


def encode_xor(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, dtype=np.float64).view(_U64)
    n = len(v)
    if n == 0:
        return b""
    if n == 1:
        return _pack_fields(v[:1].copy(), np.array([64]))
    x = v[1:] ^ v[:-1]
    lead = np.minimum(_clz64(x), 31)
    trail = _ctz64(x)
    zero = x == 0
    mlen = np.where(zero, 1, 64 - lead - trail)  # meaningful bits
    mean = np.where(zero, _U64(0), x >> np.minimum(trail, 63).astype(_U64))
    # fields per value: control(1) [+ header(11) + meaningful]
    ctrl = np.where(zero, _U64(0), _U64(1))
    hdr = (lead.astype(_U64) << _U64(6)) | (mlen - 1).astype(_U64)
    fields_v = np.empty(3 * (n - 1), dtype=_U64)
    fields_n = np.zeros(3 * (n - 1), dtype=np.int64)
    fields_v[0::3], fields_n[0::3] = ctrl, 1
    fields_v[1::3] = hdr
    fields_n[1::3] = np.where(zero, 0, 11)
    fields_v[2::3] = mean
    fields_n[2::3] = np.where(zero, 0, mlen)
    keep = fields_n > 0
    all_v = np.concatenate([v[:1], fields_v[keep]])
    all_n = np.concatenate([np.array([64]), fields_n[keep]])
    return _pack_fields(all_v, all_n)


def decode_xor(blob: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=_U64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(blob)
    prev = np.uint64(r.read(64))
    out[0] = prev
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        lead = r.read(5)
        mlen = r.read(6) + 1
        mean = r.read(mlen)
        trail = 64 - lead - mlen
        # lead was capped at 31 on encode; recover true layout from trail side
        x = np.uint64(mean) << np.uint64(trail)
        prev = prev ^ x
        out[i] = prev
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# Segmented many-span encoders: encode EVERY span of an Arrow batch in one
# vectorized pass (the hot path at 10^12-sequence scale — per-span encode
# calls pay ~50us of numpy dispatch each; 100k spans/batch make that the
# bottleneck). Formats are BYTE-IDENTICAL to encode_dod / encode_xor; each
# span's bitstream is padded to a byte boundary and sliced out of one buffer.
# ---------------------------------------------------------------------------


def _segmented_pack(vals: np.ndarray, nbits: np.ndarray, seg_ids: np.ndarray, n_segs: int) -> list[bytes]:
    """Pack fields (in stream order, tagged by segment) into per-segment
    big-endian byte strings. Fully vectorized scatter."""
    if n_segs == 0:
        return []
    if nbits.dtype != np.int64:
        nbits = nbits.astype(np.int64)
    nf = len(nbits)
    cs = np.zeros(nf + 1, dtype=np.int64)
    np.cumsum(nbits, out=cs[1:])
    starts = np.searchsorted(seg_ids, np.arange(n_segs), "left")
    ends = np.concatenate([starts[1:], [nf]])
    seg_bits = cs[ends] - cs[starts]
    seg_bytes = (seg_bits + 7) // 8
    seg_byte_off = np.zeros(n_segs + 1, dtype=np.int64)
    np.cumsum(seg_bytes, out=seg_byte_off[1:])
    total_bytes = int(seg_byte_off[-1])
    if nf:
        off_in_seg = cs[:-1] - cs[starts][seg_ids]
        abs_off = seg_byte_off[seg_ids] * 8 + off_in_seg
        words = np.zeros(total_bytes // 8 + 2, dtype=_U64)
        w = (abs_off >> 6).astype(np.int64)
        s = (abs_off & 63).astype(np.int64)
        first = np.minimum(64 - s, nbits)
        rem = nbits - first
        part1 = (vals >> rem.view(_U64)) << (64 - s - first).view(_U64)
        np.add.at(words, w, part1)
        m2 = rem > 0
        if m2.any():
            r = rem[m2].view(_U64)
            low = vals[m2] & ((_ONE << r) - _ONE)
            np.add.at(words, w[m2] + 1, low << (_U64(64) - r))
        buf = words.byteswap().tobytes()[: total_bytes]
    else:
        buf = b""
    return [buf[seg_byte_off[i] : seg_byte_off[i + 1]] for i in range(n_segs)]


def _seg_layout(lens: np.ndarray):
    n_segs = len(lens)
    total = int(lens.sum())
    seg_of = np.repeat(np.arange(n_segs), lens)
    starts = np.zeros(n_segs + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    pos_in_seg = np.arange(total, dtype=np.int64) - starts[:-1][seg_of]
    return total, seg_of, pos_in_seg


def encode_xor_many(vals_list: list[np.ndarray]) -> list[bytes]:
    lens = np.array([len(a) for a in vals_list], dtype=np.int64)
    n_segs = len(lens)
    total, seg_of, pos = _seg_layout(lens)
    if total == 0:
        return [b""] * n_segs
    v = np.concatenate([np.ascontiguousarray(a, dtype=np.float64) for a in vals_list]).view(_U64)
    prev = np.empty_like(v)
    prev[1:] = v[:-1]
    prev[0] = 0
    x = v ^ prev
    is_first = pos == 0
    x[is_first] = 0  # ignored; fields masked below
    lead = np.minimum(_clz64(x), 31)
    trail = _ctz64(x)
    zero = x == 0
    mlen = np.where(zero, 1, 64 - lead - trail)
    mean = np.where(zero, _U64(0), x >> np.minimum(trail, 63).view(_U64))
    ctrl = np.where(zero, _U64(0), _U64(1))
    hdr = (lead.view(_U64) << _U64(6)) | (mlen - 1).view(_U64)
    # 3 slots per element (element-major order == stream order)
    fv = np.empty(3 * total, dtype=_U64)
    fn = np.zeros(3 * total, dtype=np.int64)
    fv[0::3] = np.where(is_first, v, ctrl)
    fn[0::3] = np.where(is_first, 64, 1)
    fv[1::3] = hdr
    fn[1::3] = np.where(is_first | zero, 0, 11)
    fv[2::3] = mean
    fn[2::3] = np.where(is_first | zero, 0, mlen)
    fseg = np.repeat(seg_of, 3)
    keep = fn > 0
    return _segmented_pack(fv[keep], fn[keep], fseg[keep], n_segs)


def _seg_words(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate per-segment blobs into one big-endian uint64 word buffer
    (each blob is already byte-aligned by construction) and return
    (words, per-segment absolute start bit offsets). Padded with two spare
    words so vectorized 2-word gathers never index past the end."""
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    starts = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    buf = b"".join(blobs)
    pad = (-len(buf)) % 8 + 16
    words = np.frombuffer(buf + b"\x00" * pad, dtype=">u8").astype(_U64)
    return words, starts[:-1] * 8


def _gather_bits(words: np.ndarray, pos: np.ndarray, nbits) -> np.ndarray:
    """Read ``nbits`` (scalar or per-element array, each in [1, 64]) starting
    at absolute bit offsets ``pos`` — the vectorized twin of _BitReader.read
    (each field spans <= 2 words)."""
    w = (pos >> 6).astype(np.int64)
    s = (pos & 63).astype(_U64)
    cur = words[w]
    nxt = words[w + 1]
    win = cur << s
    m = s > 0
    if m.any():
        win[m] |= nxt[m] >> (_U64(64) - s[m])
    k = np.asarray(nbits, dtype=_U64)
    return win >> (_U64(64) - k)


def decode_xor_many(blobs: list[bytes], ns: np.ndarray) -> np.ndarray:
    """Vectorized-across-segments Gorilla XOR decode: one numpy pass per
    POINT INDEX instead of one Python loop iteration per point — segments
    advance in lockstep, so a batch of B spans of <= L points decodes in L
    vectorized rounds (the decode twin of encode_xor_many; output
    bit-identical to decode_xor per blob, pinned in tests/test_codecs.py).
    Returns the concatenated float64 values (segment i occupies
    out[offsets[i]:offsets[i]+ns[i]] with offsets = cumsum-exclusive(ns))."""
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    out = np.empty(total, dtype=_U64)
    if total == 0:
        return out.view(np.float64)
    words, pos0 = _seg_words(blobs)
    offs = np.zeros(len(ns) + 1, dtype=np.int64)
    np.cumsum(ns, out=offs[1:])
    # process segments in descending length order: the active set at round t
    # is then a PREFIX of the order array (no per-round boolean scan)
    order = np.argsort(-ns, kind="stable")
    ns_sorted = ns[order]
    pos = pos0[order].copy()
    outp = offs[:-1][order]  # per-segment output cursor
    live = int((ns_sorted > 0).sum())
    prev = np.zeros(live, dtype=_U64)
    prev = _gather_bits(words, pos[:live], 64)
    out[outp[:live]] = prev
    pos[:live] += 64
    t = 1
    while True:
        a = int((ns_sorted > t).sum())
        if a == 0:
            break
        ctrl = _gather_bits(words, pos[:a], 1)
        pos[:a] += 1
        nz = np.flatnonzero(ctrl == 1)
        if nz.size:
            hdr = _gather_bits(words, pos[:a][nz] , 11)
            lead = (hdr >> _U64(6)).astype(np.int64)
            mlen = ((hdr & _U64(63)) + _U64(1)).astype(np.int64)
            mean = _gather_bits(words, pos[:a][nz] + 11, mlen)
            trail = (64 - lead - mlen).astype(_U64)
            prev[nz] ^= mean << trail
            pos[nz] += 11 + mlen
        out[outp[:a] + t] = prev[:a]
        t += 1
    return out.view(np.float64)


def decode_dod_many(blobs: list[bytes], ns: np.ndarray) -> np.ndarray:
    """Vectorized-across-segments delta-of-delta decode (see
    decode_xor_many for the round structure); returns concatenated int64
    timestamps, bit-identical to decode_dod per blob."""
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    out = np.empty(total, dtype=np.int64)
    if total == 0:
        return out
    words, pos0 = _seg_words(blobs)
    offs = np.zeros(len(ns) + 1, dtype=np.int64)
    np.cumsum(ns, out=offs[1:])
    order = np.argsort(-ns, kind="stable")
    ns_sorted = ns[order]
    pos = pos0[order].copy()
    outp = offs[:-1][order]
    live = int((ns_sorted > 0).sum())
    last = _gather_bits(words, pos[:live], 64).view(np.int64).copy()
    out[outp[:live]] = last
    pos[:live] += 64
    a1 = int((ns_sorted > 1).sum())
    d = np.zeros(live, dtype=np.int64)
    if a1:
        d[:a1] = _gather_bits(words, pos[:a1], 64).view(np.int64)
        last[:a1] += d[:a1]
        out[outp[:a1] + 1] = last[:a1]
        pos[:a1] += 64
    t = 2
    while True:
        a = int((ns_sorted > t).sum())
        if a == 0:
            break
        # peek 4 control bits (padded buffer makes the over-read safe; only
        # the bits the control logic selects are ever interpreted)
        c4 = _gather_bits(words, pos[:a], 4)
        dod = np.zeros(a, dtype=np.int64)
        adv = np.empty(a, dtype=np.int64)
        b0 = (c4 & _U64(0b1000)) == 0
        adv[b0] = 1
        m10 = ~b0 & ((c4 & _U64(0b0100)) == 0)
        if m10.any():
            dod[m10] = _gather_bits(words, pos[:a][m10] + 2, 7).astype(np.int64) - 63
            adv[m10] = 9
        m110 = ~b0 & ~m10 & ((c4 & _U64(0b0010)) == 0)
        if m110.any():
            dod[m110] = _gather_bits(words, pos[:a][m110] + 3, 9).astype(np.int64) - 255
            adv[m110] = 12
        m1110 = ~b0 & ~m10 & ~m110 & ((c4 & _U64(0b0001)) == 0)
        if m1110.any():
            dod[m1110] = _gather_bits(words, pos[:a][m1110] + 4, 12).astype(np.int64) - 2047
            adv[m1110] = 16
        m1111 = ~b0 & ~m10 & ~m110 & ~m1110
        if m1111.any():
            dod[m1111] = _gather_bits(words, pos[:a][m1111] + 4, 64).view(np.int64)
            adv[m1111] = 68
        d[:a] += dod
        last[:a] += d[:a]
        out[outp[:a] + t] = last[:a]
        pos[:a] += adv
        t += 1
    return out


def encode_dod_many(ts_list: list[np.ndarray]) -> list[bytes]:
    lens = np.array([len(a) for a in ts_list], dtype=np.int64)
    n_segs = len(lens)
    total, seg_of, pos = _seg_layout(lens)
    if total == 0:
        return [b""] * n_segs
    ts = np.concatenate([np.ascontiguousarray(a, dtype=np.int64) for a in ts_list])
    d = np.empty_like(ts)
    d[1:] = ts[1:] - ts[:-1]
    d[0] = 0
    dprev = np.empty_like(d)
    dprev[1:] = d[:-1]
    dprev[0] = 0
    dod = d - dprev
    r0 = pos == 0
    r1 = pos == 1
    rn = pos >= 2
    # bucket the dod codes (only meaningful where rn)
    ctrl = np.zeros(total, dtype=_U64)
    cbits = np.full(total, 1, dtype=np.int64)
    pay = np.zeros(total, dtype=_U64)
    pbits = np.zeros(total, dtype=np.int64)
    done = dod == 0
    for bias, pb, cv, cb in _DOD_BUCKETS:
        m = ~done & (dod >= -bias) & (dod <= bias + 1)
        ctrl[m] = _U64(cv)
        cbits[m] = cb
        pay[m] = (dod[m] + bias).view(_U64)
        pbits[m] = pb
        done |= m
    m = ~done
    ctrl[m] = _U64(0b1111)
    cbits[m] = 4
    pay[m] = dod[m].view(_U64)
    pbits[m] = 64
    # 2 slots per element
    fv = np.empty(2 * total, dtype=_U64)
    fn = np.zeros(2 * total, dtype=np.int64)
    fv[0::2] = np.where(r0, ts.view(_U64), np.where(r1, d.view(_U64), ctrl))
    fn[0::2] = np.where(r0 | r1, 64, np.where(rn, cbits, 0))
    fv[1::2] = pay
    fn[1::2] = np.where(rn, pbits, 0)
    fseg = np.repeat(seg_of, 2)
    keep = fn > 0
    return _segmented_pack(fv[keep], fn[keep], fseg[keep], n_segs)
