"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib —
no external codec library.

Scope: sequential baseline DCT (SOF0), 8-bit, three components with
1x1 sampling (no chroma subsampling), no restart markers.  The
encoder DEFINES its Huffman tables in DHT segments (fixed-length
canonical codes over the symbols actually present — any valid JPEG
table set is legal; the standard Annex-K tables are merely typical),
and the decoder builds its code tables from whatever DHT segments the
stream carries, so it reads its own output AND any other baseline
1x1-sampled JPEG.

Everything is deterministic: float64 DCT matrices, explicit
round-half-away quantization, fixed YCbCr matrices — encode(x) is a
pure function of x, and decode(encode(x)) is bit-stable, which is
what the pipeline tests pin (JPEG is lossy, so unlike the PNG/GIF
paths there is no exact formula replay; the oracle-less gate is
rows-only by design).
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 example luminance/chrominance quantization
# tables (the de-facto standard), scaled by the libjpeg quality curve.
_QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QT_CHR = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _quality_tables(quality: int):
    q = min(100, max(1, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    qt = []
    for base in (_QT_LUM, _QT_CHR):
        t = np.floor((base * scale + 50) / 100)
        qt.append(np.clip(t, 1, 255).astype(np.int64))
    return qt


def _round_half_away(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _pack_entropy(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Vectorized entropy bit-packer: MSB-first concatenation of
    (value, width) pairs, final partial byte padded with 1s (T.81
    F.1.2.3), and 0xFF bytes stuffed with a following 0x00 —
    byte-identical to the scalar put()/flush() writer it replaces
    (width-0 entries contribute nothing, matching the ``if size:``
    skips).  The per-symbol Python loop dominated frame encoding;
    this is one repeat/shift/packbits pass."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return b""
    vals = np.asarray(vals, dtype=np.int64)
    starts = np.cumsum(lens) - lens
    sym_of_bit = np.repeat(np.arange(len(vals)), lens)
    pos_in_sym = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    shift = np.repeat(lens, lens) - 1 - pos_in_sym
    bits = ((vals[sym_of_bit] >> shift) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.uint8)])
    data = np.packbits(bits)
    ff = np.nonzero(data == 0xFF)[0]
    if len(ff):
        data = np.insert(data, ff + 1, 0)
    return data.tobytes()


def _rle_component(zz: np.ndarray) -> dict:
    """Vectorized JPEG run-length analysis of one component's zigzag
    blocks ``zz`` (n, 64).  Emits exactly the symbol stream of the
    scalar scan loop: per block a DC size/amplitude (differential,
    prev starts at 0), per nonzero AC coefficient ``run//16`` ZRL
    (0xF0) symbols then ``(run%16)<<4 | size`` + amplitude, and an
    EOB (0x00) when the last nonzero sits before position 63 (trailing
    zeros never emit ZRL)."""
    n = len(zz)
    dc = zz[:, 0]
    diff = np.diff(dc, prepend=np.int64(0))
    absd = np.abs(diff)
    dc_size = np.zeros(n, np.int64)
    nzd = absd > 0
    # frexp exponent == bit_length for exact integers (values are
    # quantized coefficients, far below 2^53)
    _, e = np.frexp(absd[nzd].astype(np.float64))
    dc_size[nzd] = e.astype(np.int64)
    dc_amp = np.where(
        diff >= 0, diff, diff + (np.int64(1) << dc_size) - 1
    )
    ac = zz[:, 1:]
    bi, ki = np.nonzero(ac)  # row-major: bi ascending, ki ascending within
    m = len(bi)
    v = ac[bi, ki]
    first = np.ones(m, bool)
    if m:
        first[1:] = bi[1:] != bi[:-1]
    prevk = np.empty_like(ki)
    if m:
        prevk[1:] = ki[:-1]
        prevk[first] = -1
    run = ki - prevk - 1
    nzrl = run // 16
    rem = run - nzrl * 16
    _, ev = np.frexp(np.abs(v).astype(np.float64))
    size = ev.astype(np.int64)
    sym = (rem << 4) | size
    amp = np.where(v >= 0, v, v + (np.int64(1) << size) - 1)
    last_col = np.full(n, -1, np.int64)
    if m:
        last_col[bi] = ki
    eob = last_col < 62
    return {
        "dc_size": dc_size, "dc_amp": dc_amp, "bi": bi, "first": first,
        "nzrl": nzrl, "sym": sym, "size": size, "amp": amp, "eob": eob,
    }


def _entropy_entries(rle: dict, dc_lut, dc_len: int, ac_lut, ac_len: int):
    """(vals, lens, block, seq) entry arrays for one component — the
    exact bit-entry order of the scalar write loop, recoverable by a
    stable sort on (block, seq).  ``*_lut`` map symbol → code value
    (all codes are fixed-length: _canonical_table)."""
    n = len(rle["dc_size"])
    bi, nzrl, first = rle["bi"], rle["nzrl"], rle["first"]
    m = len(bi)
    cnt = nzrl + 2  # entries per nonzero: ZRLs + symbol + amplitude
    c = np.cumsum(cnt) - cnt
    if m:
        first_idx = np.maximum.accumulate(np.where(first, np.arange(m), -1))
        start = 2 + c - c[first_idx]  # after the 2 DC entries
    else:
        start = c
    totals = np.zeros(n, np.int64)
    if m:
        np.add.at(totals, bi, cnt)
    eob = rle["eob"]
    n_eob = int(eob.sum())
    zrl_total = int(nzrl.sum())
    zidx = np.repeat(np.arange(m), nzrl)
    zoff = np.arange(zrl_total, dtype=np.int64) - np.repeat(
        np.cumsum(nzrl) - nzrl, nzrl
    )
    arange_n = np.arange(n, dtype=np.int64)
    vals = np.concatenate([
        dc_lut[rle["dc_size"]], rle["dc_amp"],
        np.full(zrl_total, ac_lut[0xF0], np.int64),
        ac_lut[rle["sym"]], rle["amp"],
        np.full(n_eob, ac_lut[0x00], np.int64),
    ])
    lens = np.concatenate([
        np.full(n, dc_len, np.int64), rle["dc_size"],
        np.full(zrl_total, ac_len, np.int64),
        np.full(m, ac_len, np.int64), rle["size"],
        np.full(n_eob, ac_len, np.int64),
    ])
    block = np.concatenate([
        arange_n, arange_n, bi[zidx], bi, bi, np.nonzero(eob)[0]
    ])
    seq = np.concatenate([
        np.zeros(n, np.int64), np.ones(n, np.int64),
        start[zidx] + zoff, start + nzrl, start + nzrl + 1,
        2 + totals[eob],
    ])
    return vals, lens, block, seq


def _code_lut(codes: dict) -> np.ndarray:
    """symbol → code-value lookup array (fixed-length canonical
    codes, so the length is carried separately)."""
    lut = np.zeros(256, np.int64)
    for s, (code, _ln) in codes.items():
        lut[s] = code
    return lut


def _canonical_table(symbols: list[int]):
    """Fixed-length canonical Huffman over the used symbol set: all
    codes get length L with 2^L > n (so no code is all ones).  Returns
    (bits[1..16], ordered symbols, {symbol: (code, length)})."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = max(1, n.bit_length()) if n else 1
    while (1 << length) <= n:
        length += 1
    bits = [0] * 17
    bits[length] = n
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return bits, syms, codes


def _dht_segment(tc: int, th: int, bits: list[int], syms: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits[1:17]) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate) and split into 8x8 blocks,
    raster order.  Returns (n_blocks, 8, 8) float64 level-shifted."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    hb, wb = p.shape[0] // 8, p.shape[1] // 8
    return (
        p.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        hb,
        wb,
    )


def jpeg_encode(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Encode an h×w×3 uint8 RGB array as a baseline JFIF JPEG."""
    h, w = rgb.shape[:2]
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qt_l, qt_c = _quality_tables(quality)
    comps = []
    for idx, (plane, qt) in enumerate(((y, qt_l), (cb, qt_c), (cr, qt_c))):
        blocks, _, _ = _component_blocks(np.clip(_round_half_away(plane), 0, 255))
        coef = np.einsum("kn,bnm,ml->bkl", _C, blocks, _C.T)
        quant = _round_half_away(coef / qt[None, :, :]).astype(np.int64)
        comps.append(quant.reshape(len(quant), 64)[:, _ZIGZAG])
    # vectorized run-length analysis per component; symbol tables per
    # component class (luma=0, chroma=1) exactly as before — the
    # canonical table depends only on the used-symbol SET
    rles = [_rle_component(zz) for zz in comps]

    def _ac_used(rle):
        parts = [rle["sym"]]
        if len(rle["nzrl"]) and rle["nzrl"].max() > 0:
            parts.append(np.array([0xF0], np.int64))
        if rle["eob"].any():
            parts.append(np.array([0x00], np.int64))
        return np.unique(np.concatenate(parts))

    cls_syms = {
        (0, 0): np.unique(rles[0]["dc_size"]),
        (1, 0): _ac_used(rles[0]),
        (0, 1): np.unique(
            np.concatenate([rles[1]["dc_size"], rles[2]["dc_size"]])
        ),
        (1, 1): np.unique(
            np.concatenate([_ac_used(rles[1]), _ac_used(rles[2])])
        ),
    }
    tables = {}
    dht = b""
    for cls in (0, 1):
        for tc in (0, 1):
            bits_arr, ordered, codes = _canonical_table(
                list(cls_syms[(tc, cls)]) or [0]
            )
            tables[(tc, cls)] = codes
            dht += _dht_segment(tc, cls, bits_arr, ordered)
    # entries for all three components, interleaved per block
    # (block-major, component within — the MCU scan order)
    all_vals, all_lens, all_keys, all_seqs = [], [], [], []
    for ci, rle in enumerate(rles):
        cls = 0 if ci == 0 else 1
        dc_codes, ac_codes = tables[(0, cls)], tables[(1, cls)]
        vals, lens, block, seq = _entropy_entries(
            rle,
            _code_lut(dc_codes),
            next(iter(dc_codes.values()))[1],
            _code_lut(ac_codes),
            next(iter(ac_codes.values()))[1],
        )
        all_vals.append(vals)
        all_lens.append(lens)
        all_keys.append(block * 3 + ci)
        all_seqs.append(seq)
    vals = np.concatenate(all_vals)
    lens = np.concatenate(all_lens)
    order = np.lexsort((np.concatenate(all_seqs), np.concatenate(all_keys)))
    scan = _pack_entropy(vals[order], lens[order])
    qt_seg = b""
    for tq, qt in ((0, qt_l), (1, qt_c)):
        body = bytes([tq]) + bytes(int(qt.reshape(64)[_ZIGZAG][i]) for i in range(64))
        qt_seg += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(
        ">BHHB", 8, h, w, 3
    ) + b"".join(
        struct.pack(">BBB", cid, 0x11, 0 if cid == 1 else 1)
        for cid in (1, 2, 3)
    )
    sos = bytes([3]) + b"".join(
        bytes([cid, (cls << 4) | cls])
        for cid, cls in ((1, 0), (2, 1), (3, 1))
    ) + bytes([0, 63, 0])
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + qt_seg
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + dht
        + b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        + scan
        + b"\xff\xd9"
    )


class _BitReader:
    """MSB-first reader over entropy data.

    The scan is unstuffed ONCE up front (0xFF00 → 0xFF, stopping at
    the first real marker) and unpacked into a numpy bit array; reads
    are then pure index arithmetic — the per-bit branchy loop this
    replaces dominated the whole decoder."""

    def __init__(self, data: bytes) -> None:
        clean = bytearray()
        i = 0
        while i < len(data):
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < len(data) else None
                if nxt == 0x00:
                    clean.append(0xFF)
                    i += 2
                    continue
                break  # a real marker (EOI, ...) ends the entropy data
            clean.append(b)
            i += 1
        self._bits = np.unpackbits(np.frombuffer(bytes(clean), np.uint8))
        self._pow = 1 << np.arange(15, -1, -1, dtype=np.int64)
        self.i = 0

    def bit(self) -> int:
        if self.i >= len(self._bits):
            raise ValueError("truncated entropy stream")
        v = int(self._bits[self.i])
        self.i += 1
        return v

    def bits(self, k: int) -> int:
        j = self.i + k
        if j > len(self._bits):
            raise ValueError("truncated entropy stream")
        v = int(self._bits[self.i : j] @ self._pow[16 - k :])
        self.i = j
        return v


def _build_decode_table(bits: list[int], syms: list[int]):
    """(code, length) → symbol from a DHT's BITS/HUFFVAL arrays."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            table[(code, ln)] = syms[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG with 1x1 sampling into h×w×3
    uint8 RGB.  Parses DQT/SOF0/DHT/SOS from the stream (any valid
    Huffman tables, not just this encoder's)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps_cfg = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body, np.uint8, 64, off + 1).astype(np.int64)
                qt = np.zeros(64, np.int64)
                qt[_ZIGZAG] = zz
                qts[tq] = qt.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline")
            comps_cfg = []
            for i in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                if samp != 0x11:
                    raise NotImplementedError("only 1x1 sampling")
                comps_cfg.append((cid, tq))
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline SOF0")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = [0] + list(body[off + 1 : off + 17])
                n = sum(bits)
                syms = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, syms)
                off += 17 + n
        elif marker == 0xDA:
            ns = body[0]
            scan_cfg = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_cfg.append((cs, tt >> 4, tt & 0xF))
            scan_data = data[pos:]
            return _decode_scan(scan_data, sof, comps_cfg, scan_cfg, qts, huff)
    raise ValueError("JPEG contains no scan")


def _decode_scan(scan_data, sof, comps_cfg, scan_cfg, qts, huff):
    h, w, nc = sof
    br = _BitReader(scan_data)
    hb, wb = (h + 7) // 8, (w + 7) // 8

    fixed_len = {}
    for key, table in huff.items():
        lens = {ln for _, ln in table}
        fixed_len[key] = lens.pop() if len(lens) == 1 else None

    def read_symbol(key) -> int:
        table = huff[key]
        fl = fixed_len[key]
        if fl is not None:  # single-length table: one aligned read
            sym = table.get((br.bits(fl), fl))
            if sym is None:
                raise ValueError("invalid Huffman code")
            return sym
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.bit()
            ln += 1
            if (code, ln) in table:
                return table[(code, ln)]
        raise ValueError("invalid Huffman code")

    planes = [np.zeros((hb * 8, wb * 8)) for _ in range(nc)]
    prev_dc = [0] * nc
    cid_to_tq = dict(comps_cfg)
    for by in range(hb):
        for bx in range(wb):
            for ci, (cs, td, ta) in enumerate(scan_cfg):
                zz = np.zeros(64, np.int64)
                size = read_symbol((0, td))
                diff = _extend(br.bits(size), size) if size else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = read_symbol((1, ta))
                    if sym == 0x00:
                        break
                    run, size = sym >> 4, sym & 0xF
                    if sym == 0xF0:
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                block = np.zeros(64, np.int64)
                block[_ZIGZAG] = zz
                qt = qts[cid_to_tq[cs]]
                coef = block.reshape(8, 8).astype(np.float64) * qt
                pix = _C.T @ coef @ _C + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    y, cb, cr = (
        np.clip(_round_half_away(p[:h, :w]), 0, 255) for p in planes
    )
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack(
        [np.clip(_round_half_away(c), 0, 255) for c in (r, g, b)], axis=-1
    )
    return out.astype(np.uint8)
