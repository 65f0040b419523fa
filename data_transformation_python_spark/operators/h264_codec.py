"""H.264/AVC (ITU-T Rec. H.264 / ISO-IEC 14496-10) codec for the
I_PCM subset, plus a real ISO BMFF (MP4, ISO-IEC 14496-12/-15)
muxer/demuxer — pure stdlib/numpy, no codec libraries.

Scope (honest): every picture is an IDR slice whose macroblocks are
all I_PCM — the standard's raw-sample macroblock type (mb_type 25 in
I-slices, spec §7.3.5/§7.4.5): 256 luma + 2×64 chroma (4:2:0) bytes
carried uncompressed inside a conformant bitstream.  Everything
around the samples is real H.264 syntax: Exp-Golomb ue(v)/se(v)
coding, SPS/PPS RBSPs (with frame cropping for non-multiple-of-16
dims), IDR slice headers (deblocking disabled so I_PCM samples
reconstruct bit-exactly, §8.7: the filter is bypassed when
``disable_deblocking_filter_idc == 1``), NAL units with emulation-
prevention-byte escaping (§7.4.1.1), and Annex-B start codes inside
the elementary stream / 4-byte-length AVC sample framing inside MP4
(avcC).  A conformant third-party decoder plays these streams; this
module's decoder parses any stream *of this subset* (it rejects
non-I_PCM macroblocks and CABAC explicitly rather than mis-decoding).

What is NOT here, still honestly stubbed in multimodal.decode_media:
transform-coded H.264 (CAVLC/CABAC residual decoding, intra
prediction, motion compensation) — the parts that genuinely need a
full entropy/DSP stack.  Inter-frame prediction itself is covered
Spark-side by the IPV1 codec (video_codec.py).

Losslessness contract: I_PCM stores YCbCr 4:2:0 samples verbatim, so
the roundtrip is bit-exact in that domain.  With GRAYSCALE input
(r=g=b) the RGB roundtrip is also bit-exact (the BT.601 luma weights
sum to exactly 1 and both chroma planes are exactly 128), which is
what the oracle-replayed gate uses.

No counterpart in /root/reference (it has no multimodal processing);
brief-driven like the other codecs.
"""

from __future__ import annotations

import struct

import numpy as np


# -- bit-level RBSP I/O -----------------------------------------------------
class _EgWriter:
    """MSB-first bit writer with Exp-Golomb helpers (spec §9.1)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def align_zero(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def raw_bytes(self, data: bytes) -> None:
        assert len(self.bits) % 8 == 0
        for byte in data:
            self.u(byte, 8)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)  # rbsp_stop_one_bit
        self.align_zero()

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        arr = np.array(self.bits, dtype=np.uint8)
        return np.packbits(arr).tobytes()


class _EgReader:
    """MSB-first bit reader with Exp-Golomb helpers."""

    def __init__(self, data: bytes) -> None:
        self._bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.i = 0

    def u(self, n: int) -> int:
        if self.i + n > len(self._bits):
            raise ValueError("truncated RBSP")
        v = 0
        for _ in range(n):
            v = (v << 1) | int(self._bits[self.i])
            self.i += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("invalid Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align_zero(self) -> None:
        while self.i % 8:
            if self._bits[self.i] != 0:
                raise ValueError("nonzero pcm alignment bit")
            self.i += 1

    def raw(self, n_bytes: int) -> bytes:
        assert self.i % 8 == 0
        start = self.i // 8
        self.i += 8 * n_bytes
        if self.i > len(self._bits):
            raise ValueError("truncated I_PCM samples")
        return np.packbits(
            self._bits[start * 8 : self.i]
        ).tobytes()


# -- NAL framing (§7.4.1.1) -------------------------------------------------
def _escape_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte: 00 00 0x -> 00 00 03 0x
    for x in {0,1,2,3}."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_ebsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue  # drop the emulation prevention byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(nal_unit_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    header = bytes([(ref_idc << 5) | nal_unit_type])
    return header + _escape_ebsp(rbsp)


# -- parameter sets ---------------------------------------------------------
def _sps_rbsp(w: int, h: int) -> bytes:
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    bw = _EgWriter()
    bw.u(66, 8)   # profile_idc: Baseline
    bw.u(0xC0, 8)  # constraint_set0+1, reserved zeros
    bw.u(30, 8)   # level_idc 3.0
    bw.ue(0)      # seq_parameter_set_id
    bw.ue(0)      # log2_max_frame_num_minus4
    bw.ue(2)      # pic_order_cnt_type 2 (output order == decode order)
    bw.ue(0)      # max_num_ref_frames
    bw.u(0, 1)    # gaps_in_frame_num_value_allowed_flag
    bw.ue(mb_w - 1)
    bw.ue(mb_h - 1)
    bw.u(1, 1)    # frame_mbs_only_flag
    bw.u(1, 1)    # direct_8x8_inference_flag
    crop_r, crop_b = mb_w * 16 - w, mb_h * 16 - h
    if crop_r or crop_b:
        bw.u(1, 1)            # frame_cropping_flag
        bw.ue(0)              # left (chroma-sample units for 4:2:0)
        bw.ue(crop_r // 2)
        bw.ue(0)              # top
        bw.ue(crop_b // 2)
    else:
        bw.u(0, 1)
    bw.u(0, 1)    # vui_parameters_present_flag
    bw.rbsp_trailing()
    return bw.tobytes()


def _pps_rbsp() -> bytes:
    bw = _EgWriter()
    bw.ue(0)      # pic_parameter_set_id
    bw.ue(0)      # seq_parameter_set_id
    bw.u(0, 1)    # entropy_coding_mode_flag: CAVLC
    bw.u(0, 1)    # bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)      # num_slice_groups_minus1
    bw.ue(0)      # num_ref_idx_l0_default_active_minus1
    bw.ue(0)      # num_ref_idx_l1_default_active_minus1
    bw.u(0, 1)    # weighted_pred_flag
    bw.u(0, 2)    # weighted_bipred_idc
    bw.se(0)      # pic_init_qp_minus26
    bw.se(0)      # pic_init_qs_minus26
    bw.se(0)      # chroma_qp_index_offset
    bw.u(1, 1)    # deblocking_filter_control_present_flag
    bw.u(0, 1)    # constrained_intra_pred_flag
    bw.u(0, 1)    # redundant_pic_cnt_present_flag
    bw.rbsp_trailing()
    return bw.tobytes()


# -- colorspace (BT.601 full-range, matching the repo's other codecs) -------
def _rgb_to_yuv420(rgb: np.ndarray):
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h, w = y.shape
    ph, pw = -h % 2, -w % 2  # pad to even before 2x2 chroma pooling
    cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
    cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
    pool = lambda p: (  # noqa: E731
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )
    rnd = lambda p: np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)  # noqa: E731
    return rnd(y), rnd(pool(cb)), rnd(pool(cr))


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    h, w = y.shape
    cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    yf = y.astype(np.float64)
    r = yf + 1.402 * (crf - 128.0)
    g = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = yf + 1.772 * (cbf - 128.0)
    rnd = lambda p: np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)  # noqa: E731
    return np.stack([rnd(r), rnd(g), rnd(b)], axis=-1)


# -- slice coding (all-I_PCM IDR) -------------------------------------------
def _idr_slice_rbsp(y: np.ndarray, cb: np.ndarray, cr: np.ndarray, idr_pic_id: int) -> bytes:
    """One IDR slice covering the whole frame, every MB I_PCM.
    Planes are PADDED to multiples of 16 (8 for chroma) already."""
    mb_h, mb_w = y.shape[0] // 16, y.shape[1] // 16
    bw = _EgWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(7)            # slice_type: I (all slices in pic)
    bw.ue(0)            # pic_parameter_set_id
    bw.u(0, 4)          # frame_num (log2_max_frame_num = 4)
    bw.ue(idr_pic_id)   # idr_pic_id
    bw.u(0, 1)          # no_output_of_prior_pics_flag
    bw.u(0, 1)          # long_term_reference_flag
    bw.se(0)            # slice_qp_delta
    bw.ue(1)            # disable_deblocking_filter_idc: filter OFF
    for my in range(mb_h):
        for mx in range(mb_w):
            bw.ue(25)   # mb_type I_PCM (I-slice table, §7.4.5)
            bw.align_zero()  # pcm_alignment_zero_bit(s)
            bw.raw_bytes(y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].tobytes())
            bw.raw_bytes(cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
            bw.raw_bytes(cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
    bw.rbsp_trailing()
    return bw.tobytes()


def h264_encode_frame(rgb: np.ndarray, idr_pic_id: int = 0) -> list[bytes]:
    """Encode one frame as [SPS, PPS, IDR-slice] NAL units (no start
    codes — framing is the container's job)."""
    h, w = rgb.shape[:2]
    if w % 2 or h % 2:
        # real spec constraint: 4:2:0 frame_crop offsets are in
        # SubWidthC/SubHeightC (=2) units (§7.4.2.1.1), so odd luma
        # dims are unrepresentable — same requirement real encoders
        # (x264 etc.) impose.
        raise ValueError("H.264 4:2:0 requires even frame dimensions")
    # pad the PICTURE to macroblock multiples before conversion so the
    # chroma planes come out exactly (mb_h*8) × (mb_w*8)
    padded = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_yuv420(padded)
    return [
        _nal(7, _sps_rbsp(w, h)),
        _nal(8, _pps_rbsp()),
        _nal(5, _idr_slice_rbsp(y, cb, cr, idr_pic_id)),
    ]


def annexb(nals: list[bytes]) -> bytes:
    """Annex-B byte stream: 4-byte start code before every NAL."""
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def split_annexb(data: bytes) -> list[bytes]:
    out, i = [], 0
    while True:
        j3 = data.find(b"\x00\x00\x01", i)
        if j3 < 0:
            break
        start = j3 + 3
        k = data.find(b"\x00\x00\x01", start)
        end = k - (1 if k > 0 and data[k - 1] == 0 else 0) if k >= 0 else len(data)
        out.append(data[start:end].rstrip(b"\x00") or data[start:end])
        if k < 0:
            break
        i = k
    return out


def _parse_sps(rbsp: bytes) -> dict:
    br = _EgReader(rbsp)
    profile = br.u(8)
    br.u(8)  # constraint flags
    level = br.u(8)
    br.ue()  # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise NotImplementedError("high-profile SPS not supported")
    log2_mfn = br.ue() + 4
    poc_type = br.ue()
    log2_max_poc_lsb = 0
    if poc_type == 0:
        log2_max_poc_lsb = br.ue() + 4
    elif poc_type == 1:
        raise NotImplementedError("pic_order_cnt_type 1")
    br.ue()  # max_num_ref_frames
    br.u(1)
    mb_w = br.ue() + 1
    mb_h = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlaced (field) coding")
    br.u(1)  # direct_8x8
    crop = [0, 0, 0, 0]
    if br.u(1):
        crop = [br.ue(), br.ue(), br.ue(), br.ue()]
    w = mb_w * 16 - 2 * (crop[0] + crop[1])
    h = mb_h * 16 - 2 * (crop[2] + crop[3])
    return {
        "profile": profile, "level": level, "w": w, "h": h,
        "mb_w": mb_w, "mb_h": mb_h, "log2_max_frame_num": log2_mfn,
        "poc_type": poc_type, "log2_max_poc_lsb": log2_max_poc_lsb,
    }


def _parse_pps(rbsp: bytes) -> dict:
    br = _EgReader(rbsp)
    pps_id = br.ue()
    br.ue()
    cabac = br.u(1)
    if cabac:
        raise NotImplementedError("CABAC entropy coding")
    br.u(1)
    if br.ue() != 0:
        raise NotImplementedError("slice groups (FMO)")
    br.ue(); br.ue(); br.u(1); br.u(2); br.se(); br.se(); br.se()
    dbf_present = br.u(1)
    br.u(1)  # constrained_intra_pred_flag
    redundant_present = br.u(1)
    return {
        "pps_id": pps_id,
        "dbf_present": dbf_present,
        "redundant_present": redundant_present,
    }


def h264_decode_frame(nals: list[bytes]) -> np.ndarray:
    """Decode one [.., SPS, PPS, IDR] NAL group of the I_PCM subset
    into h×w×3 uint8 RGB."""
    sps = pps = None
    rgb = None
    for nal in nals:
        ntype = nal[0] & 0x1F
        rbsp = _unescape_ebsp(nal[1:])
        if ntype == 7:
            sps = _parse_sps(rbsp)
        elif ntype == 8:
            pps = _parse_pps(rbsp)
        elif ntype in (1, 5):
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            br = _EgReader(rbsp)
            if br.ue() != 0:
                raise NotImplementedError("multi-slice pictures")
            slice_type = br.ue()
            if slice_type % 5 != 2:
                raise NotImplementedError(
                    "non-I slice requires motion compensation "
                    "(not available without codec libraries)"
                )
            br.ue()  # pps id
            br.u(sps["log2_max_frame_num"])
            if ntype == 5:
                br.ue()  # idr_pic_id
            if sps["poc_type"] == 0:
                br.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
            if pps["redundant_present"]:
                br.ue()  # redundant_pic_cnt
            nal_ref_idc = (nal[0] >> 5) & 0x3
            if ntype == 5:
                br.u(1); br.u(1)  # dec_ref_pic_marking (IDR form)
            elif nal_ref_idc != 0:
                # dec_ref_pic_marking, non-IDR form (7.3.3.3)
                if br.u(1):  # adaptive_ref_pic_marking_mode_flag
                    raise NotImplementedError(
                        "adaptive reference-picture marking (MMCO)"
                    )
            br.se()  # slice_qp_delta
            if pps["dbf_present"]:
                # alpha/beta offsets are present whenever
                # disable_deblocking_filter_idc != 1 (7.3.3), i.e. for
                # idc 0 AND 2 — not only idc 0.
                if br.ue() != 1:
                    br.se(); br.se()
            mbw, mbh = sps["mb_w"], sps["mb_h"]
            y = np.zeros((mbh * 16, mbw * 16), np.uint8)
            cb = np.zeros((mbh * 8, mbw * 8), np.uint8)
            cr = np.zeros((mbh * 8, mbw * 8), np.uint8)
            for my in range(mbh):
                for mx in range(mbw):
                    mb_type = br.ue()
                    if mb_type != 25:
                        raise NotImplementedError(
                            f"mb_type {mb_type}: transform-coded macroblocks "
                            "require CAVLC residual decoding"
                        )
                    br.align_zero()
                    y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                        np.frombuffer(br.raw(256), np.uint8).reshape(16, 16)
                    )
                    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        np.frombuffer(br.raw(64), np.uint8).reshape(8, 8)
                    )
                    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        np.frombuffer(br.raw(64), np.uint8).reshape(8, 8)
                    )
            w, h = sps["w"], sps["h"]
            rgb = _yuv420_to_rgb(
                y[:h, :w],
                cb[: (h + 1) // 2, : (w + 1) // 2],
                cr[: (h + 1) // 2, : (w + 1) // 2],
            )
    if rgb is None:
        raise ValueError("no slice NAL in access unit")
    return rgb


# -- ISO BMFF (MP4) ---------------------------------------------------------
def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def mp4_write(frames_nals: list[list[bytes]], w: int, h: int, fps: int) -> bytes:
    """A minimal but real MP4: ftyp + mdat (4-byte-length-prefixed AVC
    samples) + moov with one video trak whose avcC carries the SPS/PPS
    and whose stts/stsz/stsc/stco index the samples.  Timescale is
    chosen so frame durations are exact integers."""
    sps = frames_nals[0][0]
    pps = frames_nals[0][1]
    samples = []
    for nals in frames_nals:
        vcl = [n for n in nals if (n[0] & 0x1F) in (1, 5)]
        samples.append(b"".join(struct.pack(">I", len(n)) + n for n in vcl))
    mdat_payload = b"".join(samples)
    # chunk offsets are absolute file offsets: ftyp + mdat header
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    mdat_off = len(ftyp) + 8
    n = len(samples)
    timescale = fps  # 1 tick per frame: exact
    avcc = (
        b"\x01" + sps[1:4] + b"\xff"
        + b"\xe1" + struct.pack(">H", len(sps)) + sps
        + b"\x01" + struct.pack(">H", len(pps)) + pps
    )
    avc1 = _box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32          # compressorname
        + struct.pack(">H", 24) + struct.pack(">h", -1)
        + _box(b"avcC", avcc),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + url))
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"Video\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, n, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", n)
        + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, n)
        + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    end = len(data) if end is None else end
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", data, i)[0]
        fourcc = data[i + 4 : i + 8]
        if size < 8:
            raise ValueError(f"bad box size at {i}")
        yield fourcc, i + 8, i + size
        i += size


def _find_box(data: bytes, path: list[bytes], start: int = 0, end: int | None = None):
    cur = [(start, len(data) if end is None else end)]
    for name in path:
        nxt = []
        for s, e in cur:
            for fourcc, bs, be in _walk_boxes(data, s, e):
                if fourcc == name:
                    nxt.append((bs, be))
        if not nxt:
            raise ValueError(f"MP4 missing box {name!r}")
        cur = nxt
    return cur[0]


def mp4_read(data: bytes):
    """Demux the minimal MP4 layout: returns (w, h, fps, frames) with
    each frame decoded to h×w×3 uint8 RGB via the I_PCM decoder."""
    if data[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (missing ftyp)")
    stbl_s, stbl_e = _find_box(data, [b"moov", b"trak", b"mdia", b"minf", b"stbl"])
    boxes = {f: (s, e) for f, s, e in _walk_boxes(data, stbl_s, stbl_e)}
    # avcC: SPS/PPS
    stsd_s, stsd_e = boxes[b"stsd"]
    # stsd payload: version/flags + entry_count, then the avc1 sample
    # entry, whose first 78 bytes are fixed VisualSampleEntry fields
    # (ISO 14496-12 §12.1.3) before any child box (avcC).
    avc1_s, avc1_e = _find_box(data, [b"avc1"], stsd_s + 8, stsd_e)
    avcc_s, avcc_e = _find_box(data, [b"avcC"], avc1_s + 78, avc1_e)
    p = avcc_s + 5  # configurationVersion..lengthSizeMinusOne
    n_sps = data[p] & 0x1F
    p += 1
    ps_nals = []
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", data, p)[0]
        ps_nals.append(data[p + 2 : p + 2 + ln])
        p += 2 + ln
    n_pps = data[p]
    p += 1
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", data, p)[0]
        ps_nals.append(data[p + 2 : p + 2 + ln])
        p += 2 + ln
    # sample sizes + chunk offset
    stsz_s, _ = boxes[b"stsz"]
    fixed, n = struct.unpack_from(">II", data, stsz_s + 4)
    sizes = (
        [fixed] * n
        if fixed
        else list(struct.unpack_from(f">{n}I", data, stsz_s + 12))
    )
    stco_s, _ = boxes[b"stco"]
    off = struct.unpack_from(">I", data, stco_s + 8)[0]
    # timescale / duration -> fps
    mdhd_s, _ = _find_box(data, [b"moov", b"trak", b"mdia", b"mdhd"])
    timescale, duration = struct.unpack_from(">II", data, mdhd_s + 12)
    fps = timescale * n // duration if duration else 0
    frames = []
    for size in sizes:
        sample = data[off : off + size]
        q, nals = 0, list(ps_nals)
        while q + 4 <= len(sample):
            ln = struct.unpack_from(">I", sample, q)[0]
            nals.append(sample[q + 4 : q + 4 + ln])
            q += 4 + ln
        frames.append(h264_decode_frame(nals))
        off += size
    sps = _parse_sps(_unescape_ebsp(ps_nals[0][1:]))
    return sps["w"], sps["h"], fps, frames
