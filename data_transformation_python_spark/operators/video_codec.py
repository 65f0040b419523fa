"""Inter-frame-predicted video codec ("IPV1") in pure numpy + stdlib
— an MPEG-1-shaped I/P-frame elementary stream built on the repo's
T.81 DCT machinery (jpeg_codec.py), closing the last multimodal gap
(MJPEG is intra-only; this adds real temporal prediction).

Shape follows ISO/IEC 11172-2 (MPEG-1 video) in structure, not in
bitstream syntax: a sequence header, then a GOP pattern of
I-pictures (intra: every 8x8 block DCT-coded from the level-shifted
sample, like a JPEG frame) and P-pictures (inter: each block is the
DCT-coded RESIDUAL against the co-located block of the RECONSTRUCTED
previous frame — zero-motion-vector compensation).  The prediction
loop is closed: the encoder reconstructs exactly what the decoder
will (dequantize + IDCT + add prediction + clip), so there is no
drift — the defining property of a real predictive codec.

Deliberate deltas from MPEG-1 proper, documented honestly:
- zero motion vectors (co-located prediction only; the synthetic and
  most screen-like content this pipeline gates on has no camera pan),
- per-frame canonical Huffman tables carried in-stream (T.81
  DHT-style) instead of the standard's fixed VLC tables,
- no B-pictures, no slices/macroblock addressing (block-planar scan).

Everything is deterministic: float64 DCT, explicit round-half-away
quantization — encode(x) is a pure function of x and
decode(encode(x)) is bit-stable, which the PSNR gates pin.

Stream layout (all little-endian):
    b"IPV1" | u16 w | u16 h | u16 n_frames | u16 fps | u8 quality | u8 gop
    per frame: u8 ftype (0=I, 1=P) | u32 payload_len | payload
    payload: dc_bits[16] dc_syms[] ac_bits[16] ac_syms[] entropy-bytes
(one DC + one AC table per frame shared by all three planes; planes
coded Y, Cb, Cr sequentially, DC prediction resets per plane).

No counterpart in /root/reference (it has no multimodal processing at
all); brief-driven like the other codecs.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg_codec import (
    _C,
    _ZIGZAG,
    _BitReader,
    _build_decode_table,
    _canonical_table,
    _code_lut,
    _entropy_entries,
    _extend,
    _pack_entropy,
    _quality_tables,
    _rle_component,
    _round_half_away,
)

_MAGIC = b"IPV1"


def _inter_qt(quality: int) -> np.ndarray:
    """Flat inter quantization matrix (MPEG-1's default inter matrix
    is flat 16) scaled by the same libjpeg quality curve as the intra
    tables, so one quality dial drives both picture types."""
    q = min(100, max(1, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    step = int(np.clip(np.floor((16 * scale + 50) / 100), 1, 255))
    return np.full((8, 8), step, dtype=np.int64)


def _to_ycbcr(rgb: np.ndarray):
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [np.clip(_round_half_away(c), 0, 255) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


def _pad_blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-replicate pad to 8-multiples, split to (n, 8, 8) float64
    raster-order blocks — NO level shift (callers shift or difference
    before calling)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge").astype(
        np.float64
    )
    hb, wb = p.shape[0] // 8, p.shape[1] // 8
    return p.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _join_blocks(blocks: np.ndarray, hb: int, wb: int) -> np.ndarray:
    return (
        blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
    )


def _code_frame(targets, qts):
    """Quantize the three target planes' blocks and entropy-code them
    with per-frame canonical tables.  Returns (payload bytes,
    per-plane dequantized-coefficient blocks) — the latter feeds the
    closed prediction loop, so encoder reconstruction and decoder
    output are identical by construction."""
    quants = []
    rles = []
    for target, qt in zip(targets, qts):
        blocks = _pad_blocks(target)
        coef = np.einsum("kn,bnm,ml->bkl", _C, blocks, _C.T)
        quant = _round_half_away(coef / qt[None, :, :]).astype(np.int64)
        quants.append(quant)
        rles.append(_rle_component(quant.reshape(len(quant), 64)[:, _ZIGZAG]))
    # one DC + one AC table across all three planes (stream layout);
    # _canonical_table only uses the symbol SET, so uniques suffice
    dc_used = np.unique(np.concatenate([r["dc_size"] for r in rles]))
    ac_parts = [r["sym"] for r in rles]
    if any(len(r["nzrl"]) and r["nzrl"].max() > 0 for r in rles):
        ac_parts.append(np.array([0xF0], np.int64))
    if any(r["eob"].any() for r in rles):
        ac_parts.append(np.array([0x00], np.int64))
    ac_used = np.unique(np.concatenate(ac_parts)) if ac_parts else np.array([], np.int64)
    dc_bits, dc_ordered, dc_codes = _canonical_table(list(dc_used) or [0])
    ac_bits, ac_ordered, ac_codes = _canonical_table(list(ac_used) or [0])
    dc_lut, dc_len = _code_lut(dc_codes), next(iter(dc_codes.values()))[1]
    ac_lut, ac_len = _code_lut(ac_codes), next(iter(ac_codes.values()))[1]
    plane_streams = []
    for rle in rles:
        vals, lens, block, seq = _entropy_entries(
            rle, dc_lut, dc_len, ac_lut, ac_len
        )
        order = np.lexsort((seq, block))
        plane_streams.append((vals[order], lens[order]))
    payload = (
        bytes(dc_bits[1:17])
        + bytes(dc_ordered)
        + bytes(ac_bits[1:17])
        + bytes(ac_ordered)
        + _pack_entropy(
            np.concatenate([v for v, _ in plane_streams]),
            np.concatenate([l for _, l in plane_streams]),
        )
    )
    deq = [q.astype(np.float64) * qt[None, :, :] for q, qt in zip(quants, qts)]
    return payload, deq


def _decode_payload(payload: bytes, n_blocks: int, qts):
    """Parse the per-frame tables, entropy-decode 3×n_blocks blocks,
    dequantize — returns per-plane dequantized coefficient blocks."""
    dc_bits = [0] + list(payload[:16])
    n_dc = sum(dc_bits)
    off = 16 + n_dc
    dc_syms = list(payload[16:off])
    ac_bits = [0] + list(payload[off : off + 16])
    n_ac = sum(ac_bits)
    ac_syms = list(payload[off + 16 : off + 16 + n_ac])
    entropy = payload[off + 16 + n_ac :]
    tables = {
        0: _build_decode_table(dc_bits, dc_syms),
        1: _build_decode_table(ac_bits, ac_syms),
    }
    fixed_len = {}
    for key, table in tables.items():
        lens = {ln for _, ln in table}
        fixed_len[key] = lens.pop() if len(lens) == 1 else None
    br = _BitReader(entropy)

    def read_symbol(key: int) -> int:
        table, fl = tables[key], fixed_len[key]
        if fl is not None:
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

    planes = []
    for qt in qts:
        prev_dc = 0
        blocks = np.zeros((n_blocks, 8, 8), dtype=np.float64)
        for bi in range(n_blocks):
            zz = np.zeros(64, np.int64)
            size = read_symbol(0)
            prev_dc += _extend(br.bits(size), size) if size else 0
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = read_symbol(1)
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.bits(size), size)
                k += 1
            blk = np.zeros(64, np.int64)
            blk[_ZIGZAG] = zz
            blocks[bi] = blk.reshape(8, 8).astype(np.float64) * qt
        planes.append(blocks)
    return planes


def _reconstruct(deq_blocks, preds, hb: int, wb: int):
    """Shared closed-loop reconstruction: IDCT + prediction + clip in
    the padded sample domain.  ``preds`` is per-plane either the
    scalar 128.0 (I-picture level shift) or the previous
    reconstructed padded plane (P-picture)."""
    recon = []
    for deq, pred in zip(deq_blocks, preds):
        pix = np.einsum("kn,bnm,ml->bkl", _C.T, deq, _C)
        plane = _join_blocks(pix, hb, wb)
        plane = plane + (pred if isinstance(pred, np.ndarray) else pred)
        recon.append(np.clip(plane, 0.0, 255.0))
    return recon


def _frame_qts(ftype: int, quality: int):
    if ftype == 0:
        qt_l, qt_c = _quality_tables(quality)
        return (qt_l, qt_c, qt_c)
    qt = _inter_qt(quality)
    return (qt, qt, qt)


def ipv_encode(
    frames: list[np.ndarray], fps: int, quality: int = 90, gop: int = 4
) -> bytes:
    """Encode h×w×3 uint8 RGB frames as an IPV1 elementary stream.
    Frame f is an I-picture iff ``f % gop == 0``; every other frame
    is a P-picture predicted from the reconstructed previous frame."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape[:2]
    if max(w, h, len(frames), fps) > 0xFFFF:
        raise ValueError("IPV1 header fields are u16: dims/frames/fps must be < 65536")
    if not 0 < gop <= 0xFF or not 0 < quality <= 100:
        raise ValueError("gop must be 1..255 and quality 1..100")
    hb, wb = (h + 7) // 8, (w + 7) // 8
    out = bytearray(
        _MAGIC + struct.pack("<4H2B", w, h, len(frames), fps, quality, gop)
    )
    ref = None  # per-plane reconstructed padded planes
    for f, rgb in enumerate(frames):
        if rgb.shape[:2] != (h, w):
            raise ValueError("all frames must share one dimension")
        ftype = 0 if f % gop == 0 else 1
        qts = _frame_qts(ftype, quality)
        planes = _to_ycbcr(rgb)
        if ftype == 0:
            targets = [p - 128.0 for p in planes]
            preds = (128.0, 128.0, 128.0)
        else:
            targets = [
                _join_blocks(_pad_blocks(p), hb, wb) - r
                for p, r in zip(planes, ref)
            ]
            preds = ref
        payload, deq = _code_frame(targets, qts)
        ref = _reconstruct(deq, preds, hb, wb)
        out += struct.pack("<BI", ftype, len(payload)) + payload
    return bytes(out)


def ipv_decode(data: bytes):
    """Decode an IPV1 stream → (w, h, fps, frames, frame_types) with
    each frame h×w×3 uint8 RGB and frame_types a list of 'I'/'P'."""
    if data[:4] != _MAGIC:
        raise ValueError("not an IPV1 payload (missing magic)")
    w, h, nf, fps, quality, gop = struct.unpack_from("<4H2B", data, 4)
    hb, wb = (h + 7) // 8, (w + 7) // 8
    pos = 4 + struct.calcsize("<4H2B")
    ref = None
    frames, ftypes = [], []
    for f in range(nf):
        ftype, plen = struct.unpack_from("<BI", data, pos)
        pos += 5
        payload = data[pos : pos + plen]
        if len(payload) != plen:
            raise ValueError("truncated IPV1 frame payload")
        pos += plen
        if ftype == 1 and ref is None:
            raise ValueError("P-picture before any I-picture")
        deq = _decode_payload(payload, hb * wb, _frame_qts(ftype, quality))
        preds = (128.0, 128.0, 128.0) if ftype == 0 else ref
        ref = _reconstruct(deq, preds, hb, wb)
        frames.append(_to_rgb(*(p[:h, :w] for p in ref)))
        ftypes.append("I" if ftype == 0 else "P")
    return w, h, fps, frames, ftypes
