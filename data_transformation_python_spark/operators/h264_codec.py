"""H.264/AVC (ITU-T Rec. H.264 / ISO-IEC 14496-10) codec for the
I_PCM and Intra_16x16 luma-DC subsets, plus a real ISO BMFF (MP4,
ISO-IEC 14496-12/-15) muxer/demuxer — pure stdlib/numpy, no codec
libraries.

Scope (honest): every picture is an IDR slice whose macroblocks are
either
- I_PCM (mb_type 25, §7.3.5/§7.4.5): 256 luma + 2×64 chroma (4:2:0)
  bytes carried uncompressed inside a conformant bitstream, or
- Intra_16x16 with cbp_luma 0 and cbp_chroma 0 or 1 (mb_types 1-24,
  Table 7-11): real TRANSFORM-CODED macroblocks — CAVLC entropy
  decoding (§9.2: the nC < 2 tables with the full large-level escape
  AND the nC == -1 chroma-DC column with Table 9-9(a) total_zeros),
  the 4x4 inverse Hadamard + DC scaling of the luma DC block
  (§8.5.10), the 2x2 inverse Hadamard + DC scaling of the chroma DC
  blocks (§8.5.11, QPc via Table 8-15) — REAL COLOR through the
  transform path — and all four Intra_16x16 luma prediction modes
  V/H/DC/Plane (§8.3.3) plus quadrant chroma DC prediction (§8.3.4)
  in a closed prediction loop.
- Intra_16x16 with cbp_luma 15 (mb_types 13-20): the luma AC residual
  path — real per-4x4-block Intra16x16ACLevel parsing with FULL nC
  neighbour bookkeeping (§9.2.1 TotalCoeff grid across macroblock
  edges), LevelScale position-class dequant, and the §8.5.12 integer
  inverse core transform (the >>1 butterflies).  The ENCODER keeps at
  most ONE coefficient per AC block (the dominant one), which pins
  every derived nC at <= 1 — streams stay inside the implemented
  nC < 2 coeff_token column while remaining conformant for a spec
  decoder (it would derive the same nC and pick the same table).
  The decoder rejects nC >= 2 (tables not transcribable without
  codec libs to validate against), chroma AC (cbp_chroma 2), and
  CABAC explicitly rather than mis-decoding.

Everything around the macroblocks is real H.264 syntax: Exp-Golomb
ue(v)/se(v) coding, SPS/PPS RBSPs (with frame cropping for
non-multiple-of-16 dims), IDR slice headers (deblocking disabled,
§8.7), NAL units with emulation-prevention-byte escaping (§7.4.1.1),
and Annex-B start codes inside the elementary stream / 4-byte-length
AVC sample framing inside MP4 (avcC).

CAVLC conformance posture: the VLC tables are transcribed from the
spec (Tables 9-5/9-7/9-10); in this environment (no codec libraries)
they are validated by prefix-freeness + Kraft-completeness checks,
exhaustive encode→decode round-trip fuzzing including the escape
ranges, and the published textbook worked example
(0,3,0,1,-1,-1,0,1,0.. → 000010001110010111101101) as an external
anchor.  An independent decoder cross-check is the one validation
this environment cannot run.

P pictures (round 8c): real inter prediction — P_Skip runs
(``mb_skip_run``, §7.3.4) with the §8.4.1.1 derived skip MV (pan
pictures skip their interior with genuinely NONZERO derived motion),
P_L0_16x16 with the §8.4.1.3 median MV predictor and MVD coding,
FULL-PEL motion compensation with picture-edge extension
(§8.4.2.2.1), and I_PCM conditional replenishment inside P slices
(Table 7-13 mb_type 30).  Every implemented P mode is lossless, so
GOPs close the loop bit-exactly.

Round 9 extended the inter path: fractional-pel interpolation (the
§8.4.2.2.1 six-tap half-pel + quarter-pel averaging and bilinear
chroma), inter RESIDUALS on top of motion compensation, and the full
partition ladder (P_L0_L0_16x8 / 8x16, P_8x8 with the Table 7-17
8x8/8x4/4x8/4x4 sub-splits, each with per-partition median MV
prediction per §8.4.1.3).

B slices (round 10): non-reference B pictures in IBPBP GOPs —
Main-profile SPS (Baseline forbids B), pic_order_cnt_type 0 with
explicit poc_lsb and POC output reordering (decode ≠ display order),
a reference-only DPB with nearest-POC list init (§8.2.4.2.3),
B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 (Table 7-14) with PER-LIST
§8.4.1.3 median MV prediction, and the §8.4.2.3.2 default
bi-prediction mean.  Every implemented B mode is lossless.

Rounds 11–12 closed weighted (bi-)prediction (explicit + implicit),
B_Skip/B_Direct in both spatial and temporal flavors, multi-slice
pictures, (round 12) MULTI-SLICE B PICTURES — per-slice
pred_weight_tables and §6.4.9 direct-mode re-anchoring at slice
boundaries (h264_encode_gop_b_ms) — and (round 12) the COMPLETE
Table 7-18 B sub-macroblock ladder: B_8x8 one-partition modes,
B_Direct_8x8 mixed with coded quadrants, and the sub-8x8 splits
(8x4/4x8/4x4 — up to twelve motion partitions per macroblock, the
§7.3.5.2 two-loop mvd order nesting per-sub-partition medians).

Still honestly stubbed in multimodal.decode_media: the Intra_4x4
residual path, the 2<=nC<8 coeff_token columns, CABAC, slice groups
(FMO) / arbitrary slice order, B inter residuals, and interlaced
coding.  Dense
temporal prediction with residuals is also covered Spark-side by the
IPV1 codec (video_codec.py).

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

# np.clip's public wrapper pays ~3 layers of Python dispatch per call
# (fromnumeric -> _wrapfunc -> _methods._clip); on this codec's
# thousands of tiny per-block arrays that overhead outweighed the clip
# itself (measured ~2.4x per call, optimization round 15).  Call the
# underlying ufunc directly — the identical ufunc np.clip ultimately
# invokes when both bounds are set, so every value is unchanged.
try:
    from numpy.core.umath import clip as _uclip  # numpy 1.x
except ImportError:  # pragma: no cover — numpy 2 moved the ufunc
    from numpy._core.umath import clip as _uclip


# -- bit-level RBSP I/O -----------------------------------------------------
class _EgWriter:
    """MSB-first bit writer with Exp-Golomb helpers (spec §9.1).

    Accumulates into a bytearray plus a sub-byte carry instead of a
    per-bit Python list (the original appended one list element per
    bit and packbits'd at the end — the per-bit loop was a top-five
    profile line across every codec fixture builder).  The emitted
    bit pattern is identical."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0    # pending sub-byte bits, MSB-first
        self._nbits = 0  # number of pending bits (0..7)

    def u(self, value: int, n: int) -> None:
        acc = (self._acc << n) | (value & ((1 << n) - 1))
        nb = self._nbits + n
        if nb >= 8:
            # bulk emit via int.to_bytes (one C call) — same MSB-first
            # byte order the former per-byte loop produced
            rem = nb & 7
            self._buf += (acc >> rem).to_bytes((nb - rem) >> 3, "big")
            acc &= (1 << rem) - 1
            nb = rem
        self._nbits = nb
        self._acc = acc

    def ue(self, value: int) -> None:
        code = value + 1
        n = code.bit_length()
        self.u(code, 2 * n - 1)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def align_zero(self) -> None:
        if self._nbits:
            self.u(0, 8 - self._nbits)

    def raw_bytes(self, data: bytes) -> None:
        assert self._nbits == 0
        self._buf.extend(data)

    def rbsp_trailing(self) -> None:
        self.u(1, 1)  # rbsp_stop_one_bit
        self.align_zero()

    @property
    def bits(self) -> list[int]:
        """The written bits as a list (diagnostics/tests only)."""
        out = []
        for byte in self._buf:
            for i in range(7, -1, -1):
                out.append((byte >> i) & 1)
        for i in range(self._nbits - 1, -1, -1):
            out.append((self._acc >> i) & 1)
        return out

    def tobytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._buf)


class _EgReader:
    """MSB-first bit reader with Exp-Golomb helpers.

    Reads straight from the byte buffer (the original unpacked the
    whole RBSP to one numpy element per bit and walked it one bit at
    a time — a top-five profile line across every decode path).  Bit
    semantics are identical."""

    def __init__(self, data: bytes) -> None:
        self._data = bytes(data)
        self._nbits = 8 * len(self._data)
        self.i = 0

    def u(self, n: int) -> int:
        i = self.i
        if n == 1:
            # single-bit fast path — the densest call across every
            # decode loop (flags, trailing-one signs, level prefixes)
            if i >= self._nbits:
                raise ValueError("truncated RBSP")
            self.i = i + 1
            return (self._data[i >> 3] >> (7 - (i & 7))) & 1
        if i + n > self._nbits:
            raise ValueError("truncated RBSP")
        self.i = i + n
        if n == 0:
            return 0
        start, end = i >> 3, (i + n + 7) >> 3
        chunk = int.from_bytes(self._data[start:end], "big")
        drop = (end << 3) - (i + n)
        return (chunk >> drop) & ((1 << n) - 1)

    def ue(self) -> int:
        # one peek of up to 32 bits replaces the bit-at-a-time zero
        # scan; identical values and identical failure modes (32 zero
        # bits -> invalid code; running out of bits -> truncated)
        i = self.i
        avail = self._nbits - i
        m = 32 if avail > 32 else avail
        if m <= 0:
            raise ValueError("truncated RBSP")
        start, end = i >> 3, (i + m + 7) >> 3
        chunk = int.from_bytes(self._data[start:end], "big")
        window = (chunk >> ((end << 3) - (i + m))) & ((1 << m) - 1)
        if window == 0:
            if m == 32:
                raise ValueError("invalid Exp-Golomb code")
            raise ValueError("truncated RBSP")
        zeros = m - window.bit_length()
        self.i = i + zeros + 1
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def level_prefix(self) -> int:
        """§9.2.2.1 level_prefix: count of zero bits before the next
        1 bit (the 1 is consumed).  One peek of up to 25 bits replaces
        the bit-at-a-time loop; identical failure modes (a 25th zero
        -> 'beyond CAVLC range', running out of bits -> truncated)."""
        i = self.i
        avail = self._nbits - i
        m = 25 if avail > 25 else avail
        if m <= 0:
            raise ValueError("truncated RBSP")
        start, end = i >> 3, (i + m + 7) >> 3
        chunk = int.from_bytes(self._data[start:end], "big")
        window = (chunk >> ((end << 3) - (i + m))) & ((1 << m) - 1)
        if window == 0:
            if m == 25:
                raise ValueError("level_prefix beyond CAVLC range")
            raise ValueError("truncated RBSP")
        zeros = m - window.bit_length()
        self.i = i + zeros + 1
        return zeros

    def align_zero(self) -> None:
        r = self.i & 7
        if r and self.u(8 - r) != 0:
            raise ValueError("nonzero pcm alignment bit")

    def raw(self, n_bytes: int) -> bytes:
        assert self.i % 8 == 0
        start = self.i // 8
        self.i += 8 * n_bytes
        if self.i > self._nbits:
            raise ValueError("truncated I_PCM samples")
        return self._data[start : start + n_bytes]

    def more_rbsp_data(self) -> bool:
        """§7.2 more_rbsp_data(): True while syntax bits remain, i.e.
        the position is strictly before the LAST set bit (the
        rbsp_stop_one_bit — everything after it is alignment zeros).
        This is what lets a slice's macroblock loop terminate at the
        slice's own data end instead of a caller-known count, the
        prerequisite for multi-slice pictures."""
        last = getattr(self, "_last_one", None)
        if last is None:
            d = self._data
            j = len(d) - 1
            while j >= 0 and d[j] == 0:
                j -= 1
            last = -1 if j < 0 else (
                (j << 3) + 8 - ((d[j] & -d[j]).bit_length())
            )
            self._last_one = last
        return self.i < last


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
def _sps_rbsp(
    w: int,
    h: int,
    max_ref_frames: int = 0,
    poc_type: int = 2,
    profile: int = 66,
) -> bytes:
    """poc_type 2 (output order == decode order) for I/P streams;
    B GOPs need poc_type 0 (explicit pic_order_cnt_lsb, 8 bits here —
    display order ≠ decode order) and the Main profile (77: Baseline
    forbids B slices; CAVLC stays on)."""
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    bw = _EgWriter()
    bw.u(profile, 8)   # profile_idc: 66 Baseline / 77 Main
    # Baseline streams assert constraint_set0+1; Main-with-B asserts
    # only constraint_set1 (Main conformance)
    bw.u(0xC0 if profile == 66 else 0x40, 8)
    bw.u(30, 8)   # level_idc 3.0
    bw.ue(0)      # seq_parameter_set_id
    bw.ue(0)      # log2_max_frame_num_minus4
    bw.ue(poc_type)  # pic_order_cnt_type
    if poc_type == 0:
        bw.ue(4)  # log2_max_pic_order_cnt_lsb_minus4 → 8-bit poc_lsb
    bw.ue(max_ref_frames)  # max_num_ref_frames (1 for P, 2 for B GOPs)
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


def _pps_rbsp(
    weighted_pred: bool = False, weighted_bipred_idc: int = 0,
) -> bytes:
    bw = _EgWriter()
    bw.ue(0)      # pic_parameter_set_id
    bw.ue(0)      # seq_parameter_set_id
    bw.u(0, 1)    # entropy_coding_mode_flag: CAVLC
    bw.u(0, 1)    # bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)      # num_slice_groups_minus1
    bw.ue(0)      # num_ref_idx_l0_default_active_minus1
    bw.ue(0)      # num_ref_idx_l1_default_active_minus1
    bw.u(1 if weighted_pred else 0, 1)  # weighted_pred_flag (P slices)
    bw.u(weighted_bipred_idc, 2)  # weighted_bipred_idc (B: 1=explicit)
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
    rnd = lambda p: _uclip(np.floor(p + 0.5), 0, 255).astype(np.uint8)  # noqa: E731
    return rnd(y), rnd(pool(cb)), rnd(pool(cr))


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    h, w = y.shape
    cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    yf = y.astype(np.float64)
    r = yf + 1.402 * (crf - 128.0)
    g = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = yf + 1.772 * (cbf - 128.0)
    rnd = lambda p: _uclip(np.floor(p + 0.5), 0, 255).astype(np.uint8)  # noqa: E731
    return np.stack([rnd(r), rnd(g), rnd(b)], axis=-1)


# -- slice coding (all-I_PCM IDR) -------------------------------------------
def _idr_slice_rbsp(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    idr_pic_id: int,
    poc_lsb: int | None = None,
    first_mb: int = 0,
    n_mbs: int | None = None,
) -> bytes:
    """One IDR slice covering the whole frame, every MB I_PCM — or,
    for multi-slice IDRs, the ``n_mbs`` macroblocks from raster
    address ``first_mb`` (I_PCM has no neighbour dependence, so the
    split is purely structural).  Planes are PADDED to multiples of
    16 (8 for chroma) already.  ``poc_lsb`` is emitted only under a
    poc_type-0 SPS (B GOPs)."""
    mb_h, mb_w = y.shape[0] // 16, y.shape[1] // 16
    bw = _EgWriter()
    bw.ue(first_mb)     # first_mb_in_slice
    bw.ue(7)            # slice_type: I (all slices in pic)
    bw.ue(0)            # pic_parameter_set_id
    bw.u(0, 4)          # frame_num (log2_max_frame_num = 4)
    bw.ue(idr_pic_id)   # idr_pic_id
    if poc_lsb is not None:
        bw.u(poc_lsb % 256, 8)  # pic_order_cnt_lsb (poc_type 0)
    bw.u(0, 1)          # no_output_of_prior_pics_flag
    bw.u(0, 1)          # long_term_reference_flag
    bw.se(0)            # slice_qp_delta
    bw.ue(1)            # disable_deblocking_filter_idc: filter OFF
    last_mb = first_mb + (n_mbs if n_mbs is not None else mb_h * mb_w - first_mb)
    for addr in range(first_mb, last_mb):
        my, mx = divmod(addr, mb_w)
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
    max_ref = br.ue()  # max_num_ref_frames
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
        "max_ref": max_ref,
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
    br.ue(); br.ue()
    weighted_pred = br.u(1)
    weighted_bipred = br.u(2)
    init_qp_delta = br.se()  # pic_init_qp_minus26
    br.se(); br.se()
    dbf_present = br.u(1)
    br.u(1)  # constrained_intra_pred_flag
    redundant_present = br.u(1)
    return {
        "pps_id": pps_id,
        "dbf_present": dbf_present,
        "redundant_present": redundant_present,
        "init_qp_delta": init_qp_delta,
        "weighted_pred": weighted_pred,
        "weighted_bipred": weighted_bipred,
    }


# -- CAVLC (spec §9.2) for the Intra_16x16 luma-DC subset -------------------
# Tables transcribed from ITU-T H.264: Table 9-5 (coeff_token, the
# 0 <= nC < 2 column — the only nC this subset produces: with
# cbp_luma == 0 every neighbouring 4x4 luma block has TotalCoeff 0, so
# nC == 0 at every macroblock, §9.2.1), Table 9-7 (total_zeros, 4x4),
# Table 9-10 (run_before).  Validation in this env (no codec libs to
# cross-check against): prefix-freeness + Kraft completeness of every
# (sub)table, encode→decode round-trip fuzzing, and the published
# worked example of the standard textbooks (coeffs 0,3,0,1,-1,-1,0,1 →
# "000010001110010111101101") as an external conformance anchor.

_CT_NC02 = {  # (trailing_ones, total_coeff) -> code bitstring
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
    (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
    (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
    (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101",
    (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110", (2, 7): "00000000101",
    (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010",
    (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110",
    (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010",
    (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110",
    (2, 11): "00000000001001", (3, 11): "00000000001000",
    (0, 12): "000000000001011", (1, 12): "000000000001010",
    (2, 12): "000000000001101", (3, 12): "00000000001100",
    (0, 13): "0000000000001111", (1, 13): "000000000000001",
    (2, 13): "000000000001001", (3, 13): "000000000001000",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110",
    (2, 14): "0000000000001101", (3, 14): "000000000001100",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010",
    (2, 15): "0000000000001001", (3, 15): "0000000000001100",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110",
    (2, 16): "0000000000000101", (3, 16): "0000000000001000",
}

_TOTAL_ZEROS = {  # total_coeff -> {total_zeros: code} (Table 9-7, 4x4)
    1: {0: "1", 1: "011", 2: "010", 3: "0011", 4: "0010", 5: "00011",
        6: "00010", 7: "000011", 8: "000010", 9: "0000011", 10: "0000010",
        11: "00000011", 12: "00000010", 13: "000000011", 14: "000000010",
        15: "000000001"},
    2: {0: "111", 1: "110", 2: "101", 3: "100", 4: "011", 5: "0101",
        6: "0100", 7: "0011", 8: "0010", 9: "00011", 10: "00010",
        11: "000011", 12: "000010", 13: "000001", 14: "000000"},
    3: {0: "0101", 1: "111", 2: "110", 3: "101", 4: "0100", 5: "0011",
        6: "100", 7: "011", 8: "0010", 9: "00011", 10: "00010",
        11: "000001", 12: "00001", 13: "000000"},
    4: {0: "00011", 1: "111", 2: "0101", 3: "0100", 4: "110", 5: "101",
        6: "100", 7: "0011", 8: "011", 9: "0010", 10: "00010",
        11: "00001", 12: "00000"},
    5: {0: "0101", 1: "0100", 2: "0011", 3: "111", 4: "110", 5: "101",
        6: "100", 7: "011", 8: "0010", 9: "00001", 10: "0001",
        11: "00000"},
    6: {0: "000001", 1: "00001", 2: "111", 3: "110", 4: "101", 5: "100",
        6: "011", 7: "010", 8: "0001", 9: "001", 10: "000000"},
    7: {0: "000001", 1: "00001", 2: "101", 3: "100", 4: "011", 5: "11",
        6: "010", 7: "0001", 8: "001", 9: "000000"},
    8: {0: "000001", 1: "0001", 2: "00001", 3: "011", 4: "11", 5: "10",
        6: "010", 7: "001", 8: "000000"},
    9: {0: "000001", 1: "000000", 2: "0001", 3: "11", 4: "10", 5: "001",
        6: "01", 7: "00001"},
    10: {0: "00001", 1: "00000", 2: "001", 3: "11", 4: "10", 5: "01",
         6: "0001"},
    11: {0: "0000", 1: "0001", 2: "001", 3: "010", 4: "1", 5: "011"},
    12: {0: "0000", 1: "0001", 2: "01", 3: "1", 4: "001"},
    13: {0: "000", 1: "001", 2: "1", 3: "01"},
    14: {0: "00", 1: "01", 2: "1"},
    15: {0: "0", 1: "1"},
}

_RUN_BEFORE = {  # min(zeros_left, 7) -> {run: code} (Table 9-10)
    1: {0: "1", 1: "0"},
    2: {0: "1", 1: "01", 2: "00"},
    3: {0: "11", 1: "10", 2: "01", 3: "00"},
    4: {0: "11", 1: "10", 2: "01", 3: "001", 4: "000"},
    5: {0: "11", 1: "10", 2: "011", 3: "010", 4: "001", 5: "000"},
    6: {0: "11", 1: "000", 2: "001", 3: "011", 4: "010", 5: "101",
        6: "100"},
    7: {0: "111", 1: "110", 2: "101", 3: "100", 4: "011", 5: "010",
        6: "001", 7: "0001", 8: "00001", 9: "000001", 10: "0000001",
        11: "00000001", 12: "000000001", 13: "0000000001",
        14: "00000000001"},
}

# zigzag scan of a 4x4 block (spec Figure 8-8)
_ZZ4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# Table 9-5, the nC == -1 column (ChromaDCLevel, §9.2.1: chroma DC
# blocks ALWAYS use nC = -1 — no neighbour bookkeeping).  14 codes;
# their Kraft sum is exactly 1 (asserted in tests), the strongest
# structural check available in an env with no codec libs to
# cross-validate against.
_CT_NCM1 = {  # (trailing_ones, total_coeff) -> code bitstring
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010",
    (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010",
    (3, 4): "0000000",
}

_TOTAL_ZEROS_CDC = {  # Table 9-9(a): total_zeros for 2x2 chroma DC
    1: {0: "1", 1: "01", 2: "001", 3: "000"},
    2: {0: "1", 1: "01", 2: "00"},
    3: {0: "1", 1: "0"},
}

# Table 9-5, the nC >= 8 column: unlike the VLC columns this one is
# FORMULA-DEFINED by the spec — a 6-bit fixed-length code with value
# 4·(TotalCoeff − 1) + TrailingOnes (TotalCoeff >= 1), and the single
# special case (0, 0) -> 000011 (value 3 is free: it would be
# TotalCoeff 1 / TrailingOnes 3, which is impossible).  Being a
# formula, it is transcribable WITHOUT external codec validation —
# which is why this column is implemented while the lookup-defined
# 2 <= nC < 8 columns honestly remain NotImplementedError.
_CT_NC8 = {(0, 0): "000011"}
for _tc in range(1, 17):
    for _t1 in range(0, min(3, _tc) + 1):
        _CT_NC8[(_t1, _tc)] = format(4 * (_tc - 1) + _t1, "06b")
del _tc, _t1


def _put_bits(bw: _EgWriter, code: str) -> None:
    bw.u(int(code, 2), len(code))


# (value, length) twins of the {key: bitstring} code tables, built
# lazily and cached by table identity (the tables are module-level
# constants; the cache keeps a strong reference to the source table so
# a recycled id can never alias a different dict).  Same bits, no
# per-call int(code, 2)/len parsing.
_INT_CODES: dict[int, tuple] = {}


def _int_codes(table: dict) -> dict:
    cached = _INT_CODES.get(id(table))
    if cached is None or cached[0] is not table:
        cached = (table, {k: (int(v, 2), len(v)) for k, v in table.items()})
        _INT_CODES[id(table)] = cached
    return cached[1]


# decode twins as DENSE first-tmax-bits lookup lists (2^tmax slots,
# tmax <= 16), cached by table identity: one contiguous peek + one
# list index per VLC read.  Prefix-freeness makes each code's slot
# range disjoint, so dense[padded_window] is the unique code whose
# bits prefix the window (or None).
_VLC_DENSE: dict[int, tuple] = {}


def _read_vlc(br: _EgReader, table: dict[str, object], max_len: int = 16):
    cached = _VLC_DENSE.get(id(table))
    if cached is None or cached[0] is not table:
        tmax = max(len(k) for k in table)
        dense: list = [None] * (1 << tmax)
        for k, v in table.items():
            ln = len(k)
            width = 1 << (tmax - ln)
            base = int(k, 2) << (tmax - ln)
            dense[base:base + width] = [(v, ln)] * width
        cached = (table, dense, tmax)
        _VLC_DENSE[id(table)] = cached
    _, dense, tmax = cached
    i = br.i
    avail = br._nbits - i
    m = tmax if tmax < avail else avail
    if m <= 0:
        raise ValueError("truncated RBSP")
    start, end = i >> 3, (i + m + 7) >> 3
    chunk = int.from_bytes(br._data[start:end], "big")
    window = (chunk >> ((end << 3) - (i + m))) & ((1 << m) - 1)
    # pad the m read bits with zeros to tmax; a hit longer than m
    # means the match needed bits the stream doesn't have
    hit = dense[window << (tmax - m)]
    if hit is not None and hit[1] <= m:
        br.i = i + hit[1]
        return hit[0]
    if m < tmax:
        raise ValueError("truncated RBSP")
    raise ValueError(f"invalid VLC code at bit {i}")


_CT_NC02_DEC = {v: k for k, v in _CT_NC02.items()}
_CT_NCM1_DEC = {v: k for k, v in _CT_NCM1.items()}
_CT_NC8_DEC = {v: k for k, v in _CT_NC8.items()}


def _ct_dec_for_nc(nc: int) -> dict:
    """coeff_token decode table for a derived nC: the transcribed
    nC < 2 VLC column or the formula-defined nC >= 8 FLC column (which
    covers I_PCM neighbours, counting 16); the lookup-defined middle
    columns stay honest NotImplementedError."""
    if nc < 2:
        return _CT_NC02_DEC
    if nc >= 8:
        return _CT_NC8_DEC
    raise NotImplementedError(
        "coeff_token columns for 2 <= nC < 8 are not implemented "
        "(lookup-defined in the spec; no codec libs to transcribe "
        "them against — the nC >= 8 column IS implemented because "
        "it is a formula)"
    )
_TZ_DEC = {tc: {v: k for k, v in tab.items()} for tc, tab in _TOTAL_ZEROS.items()}
_TZ_CDC_DEC = {
    tc: {v: k for k, v in tab.items()} for tc, tab in _TOTAL_ZEROS_CDC.items()
}
_RB_DEC = {zl: {v: k for k, v in tab.items()} for zl, tab in _RUN_BEFORE.items()}


def cavlc_encode_block(
    bw: _EgWriter,
    coeffs: list[int],
    ct_table: dict | None = None,
    tz_table: dict | None = None,
    max_coeff: int = 16,
) -> None:
    """Encode one residual block (``max_coeff`` coefficients in scan
    order) with CAVLC (§9.2).  Defaults are the 4x4 nC < 2 tables;
    pass ``_CT_NCM1``/``_TOTAL_ZEROS_CDC``/4 for 2x2 chroma DC."""
    ct_table = _CT_NC02 if ct_table is None else ct_table
    tz_table = _TOTAL_ZEROS if tz_table is None else tz_table
    nz = [(i, int(c)) for i, c in enumerate(coeffs) if c != 0]
    total = len(nz)
    if total > max_coeff:
        raise ValueError(f"more than {max_coeff} coefficients")
    rnz = nz[::-1]
    t1 = 0
    for _, c in rnz:
        if abs(c) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    # the whole block's bits accumulate locally and flush as ONE
    # bw.u() — same bit sequence, one writer call per block
    acc, nb = _int_codes(ct_table)[(t1, total)]
    if total == 0:
        bw.u(acc, nb)
        return
    for _, c in rnz[:t1]:
        acc = (acc << 1) | (0 if c > 0 else 1)  # trailing-one sign
        nb += 1
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    first = True
    for _, level in rnz[t1:]:
        level_code = (level << 1) - 2 if level > 0 else -(level << 1) - 1
        if first and t1 < 3:
            level_code -= 2
        # each branch appends the unary prefix (level_code>>suffix_len
        # zeros then a 1) and the fixed-size suffix in one shift —
        # bit-identical to the separate prefix/suffix writes
        if suffix_len == 0 and level_code < 14:
            acc = (acc << (level_code + 1)) | 1
            nb += level_code + 1
        elif suffix_len == 0 and level_code < 30:
            acc = (acc << 19) | (1 << 4) | (level_code - 14)
            nb += 19
        elif suffix_len > 0 and (level_code >> suffix_len) < 15:
            w = (level_code >> suffix_len) + 1 + suffix_len
            acc = (acc << w) | (1 << suffix_len) | (
                level_code & ((1 << suffix_len) - 1)
            )
            nb += w
        else:
            # escape: prefix 15 carries a 12-bit suffix; prefixes 16+
            # carry (prefix-3)-bit suffixes over contiguous higher
            # ranges (§9.2.2.1 large-level extension)
            rem = level_code - (
                30 if suffix_len == 0 else (15 << suffix_len)
            )
            if rem < 4096:
                p, size, suffix = 15, 12, rem
            else:
                p, base = 16, 4096
                while rem >= base + (1 << (p - 3)):
                    base += 1 << (p - 3)
                    p += 1
                    if p > 24:
                        raise ValueError("level beyond CAVLC range")
                size, suffix = p - 3, rem - base
            w = p + 1 + size
            acc = (acc << w) | (1 << size) | suffix
            nb += w
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
        first = False
    last_pos = nz[-1][0]
    total_zeros = last_pos + 1 - total
    if total < max_coeff:
        v, w = _int_codes(tz_table[total])[total_zeros]
        acc = (acc << w) | v
        nb += w
    zeros_left = total_zeros
    for j in range(len(nz) - 1, 0, -1):
        if zeros_left <= 0:
            break
        run = nz[j][0] - nz[j - 1][0] - 1
        v, w = _int_codes(_RUN_BEFORE[min(zeros_left, 7)])[run]
        acc = (acc << w) | v
        nb += w
        zeros_left -= run
    bw.u(acc, nb)


def cavlc_decode_block(
    br: _EgReader,
    ct_dec: dict | None = None,
    tz_dec: dict | None = None,
    max_coeff: int = 16,
) -> list[int]:
    """Decode one CAVLC block to ``max_coeff`` scan-order coefficients
    (§9.2).  Defaults are the 4x4 nC < 2 tables; pass
    ``_CT_NCM1_DEC``/``_TZ_CDC_DEC``/4 for 2x2 chroma DC."""
    ct_dec = _CT_NC02_DEC if ct_dec is None else ct_dec
    tz_dec = _TZ_DEC if tz_dec is None else tz_dec
    t1, total = _read_vlc(br, ct_dec)
    out = [0] * max_coeff
    if total == 0:
        return out
    levels: list[int] = []
    for _ in range(t1):
        levels.append(-1 if br.u(1) else 1)
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    for idx in range(total - t1):
        prefix = br.level_prefix()
        if prefix >= 15:
            size = prefix - 3
            level_code = (15 << suffix_len) + br.u(size)
            if suffix_len == 0:
                level_code += 15
            if prefix >= 16:
                level_code += (1 << (prefix - 3)) - 4096
        elif suffix_len == 0:
            level_code = prefix if prefix < 14 else 14 + br.u(4)
        else:
            level_code = (prefix << suffix_len) + br.u(suffix_len)
        if idx == 0 and t1 < 3:
            level_code += 2
        level = (
            (level_code + 2) >> 1 if level_code % 2 == 0
            else -((level_code + 1) >> 1)
        )
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = _read_vlc(br, tz_dec[total]) if total < max_coeff else 0
    zeros_left = total_zeros
    # place coefficients: levels[] holds values highest-frequency
    # first; runs of zeros precede each (reverse scan)
    pos = total + total_zeros - 1
    for j, level in enumerate(levels):
        out[pos] = level
        if j == len(levels) - 1:
            break
        run = (
            _read_vlc(br, _RB_DEC[min(zeros_left, 7)]) if zeros_left > 0 else 0
        )
        if run > zeros_left:
            # the zeros_left >= 7 table carries codes for runs up to
            # 14, so a corrupted stream can decode a run larger than
            # the zeros remaining — without this check pos goes
            # negative and Python's negative indexing would corrupt
            # the block silently instead of failing
            raise ValueError("run_before exceeds remaining zeros")
        zeros_left -= run
        pos -= run + 1
    return out


# -- Intra_16x16 luma-DC transform path (§8.3.3, §8.5.10) -------------------
_HADAMARD4 = np.array(
    [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
    dtype=np.int64,
)
_DC_LEVELSCALE = (10, 11, 13, 14, 16, 18)  # LevelScale4x4(m, 0, 0)


def _luma_dc_dequant(c_zz: list[int], qp: int) -> np.ndarray:
    """Inverse-zigzag, inverse Hadamard, and DC scaling of the parsed
    Intra16x16DCLevel block (§8.5.10) → 4x4 int array of per-4x4-block
    DC values (pre the final (x+32)>>6 of the core transform)."""
    c = np.zeros(16, np.int64)
    c[_ZZ4] = np.array(c_zz, np.int64)
    f = _HADAMARD4 @ c.reshape(4, 4) @ _HADAMARD4
    a, e = _DC_LEVELSCALE[qp % 6], qp // 6
    if qp >= 36:
        return (f * a) << (e - 6)
    return (f * a + (1 << (5 - e))) >> (6 - e)


# -- luma AC transform path (§8.5.12) ----------------------------------------
# LevelScale4x4(m, i, j) position classes: A = {(0,0),(0,2),(2,0),(2,2)},
# B = {(1,1),(1,3),(3,1),(3,3)}, C = the rest (Table 8-14 weights).
_LS_A = (10, 11, 13, 14, 16, 18)
_LS_B = (16, 18, 20, 23, 25, 29)
_LS_C = (13, 14, 16, 18, 20, 23)


def _levelscale4x4(m: int) -> np.ndarray:
    ls = _LS_CACHE.get(m)
    if ls is None:
        ls = np.full((4, 4), _LS_C[m], np.int64)
        for i, j in ((0, 0), (0, 2), (2, 0), (2, 2)):
            ls[i, j] = _LS_A[m]
        for i, j in ((1, 1), (1, 3), (3, 1), (3, 3)):
            ls[i, j] = _LS_B[m]
        ls.setflags(write=False)  # shared across calls — keep frozen
        _LS_CACHE[m] = ls
    return ls


_LS_CACHE: dict[int, np.ndarray] = {}


def _ac_dequant(c: np.ndarray, qp: int) -> np.ndarray:
    """Scaling of a 4x4 residual block's coefficients
    (d_ij = c_ij · LevelScale(qp%6, i, j) · 2^(qp/6)); the inverse
    transform's final (x + 32) >> 6 performs the normalization.
    Position (0,0) is expected to carry the §8.5.10-scaled DC and is
    overwritten by the caller."""
    ls = _levelscale4x4(qp % 6)
    return (c * ls) << (qp // 6)


def _inv_transform4x4(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2 inverse 4x4 core transform (the >>1 butterflies),
    returning residual samples BEFORE the final (x + 32) >> 6.

    Runs on plain Python ints: a 4x4 block is far below numpy's
    per-op break-even, and this is the densest inner call of every
    residual decode (Python ``>>`` on negative ints is the same
    arithmetic shift numpy int64 performs, so values are identical
    to the vectorized form)."""
    rows = d.tolist()
    f = []
    for d0, d1, d2, d3 in rows:
        e0 = d0 + d2
        e1 = d0 - d2
        e2 = (d1 >> 1) - d3
        e3 = d1 + (d3 >> 1)
        f.append((e0 + e3, e1 + e2, e1 - e2, e0 - e3))
    (f00, f01, f02, f03), (f10, f11, f12, f13) = f[0], f[1]
    (f20, f21, f22, f23), (f30, f31, f32, f33) = f[2], f[3]
    out = []
    for f0, f1, f2, f3 in (
        (f00, f10, f20, f30), (f01, f11, f21, f31),
        (f02, f12, f22, f32), (f03, f13, f23, f33),
    ):
        g0 = f0 + f2
        g1 = f0 - f2
        g2 = (f1 >> 1) - f3
        g3 = f1 + (f3 >> 1)
        out.append((g0 + g3, g1 + g2, g1 - g2, g0 - g3))
    # out holds columns; transpose back to row-major
    return np.array(out, np.int64).T


_CF = np.array(
    [[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
    dtype=np.int64,
)


def _fwd_transform4x4(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 core transform W = Cf · X · Cf^T (the encoder-side
    analysis; not normative — only the inverse is)."""
    return _CF @ x.astype(np.int64) @ _CF.T


# -- batched per-macroblock forms (optimization round 15) --------------------
# A macroblock's 4x4 residual blocks are independent once the MB-level
# prediction is fixed, so the 16 luma (or 4 chroma) transforms,
# quantizations and inverse transforms run as ONE numpy pass instead of
# 16 tiny per-block calls.  Identical int64 arithmetic throughout
# (numpy's >> on int64 is the same arithmetic shift the scalar forms
# use); bit-exactness is gated by scripts/codec_digest.py.

def _inv_transform4x4_batch(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2 inverse core transform over a (n, 4, 4) stack —
    the same >>1 butterflies as _inv_transform4x4, vectorized."""
    d0, d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    e0 = d0 + d2
    e1 = d0 - d2
    e2 = (d1 >> 1) - d3
    e3 = d1 + (d3 >> 1)
    f = np.empty_like(d)
    f[..., 0] = e0 + e3
    f[..., 1] = e1 + e2
    f[..., 2] = e1 - e2
    f[..., 3] = e0 - e3
    f0, f1, f2, f3 = f[:, 0], f[:, 1], f[:, 2], f[:, 3]
    g0 = f0 + f2
    g1 = f0 - f2
    g2 = (f1 >> 1) - f3
    g3 = f1 + (f3 >> 1)
    out = np.empty_like(d)
    out[:, 0] = g0 + g3
    out[:, 1] = g1 + g2
    out[:, 2] = g1 - g2
    out[:, 3] = g0 - g3
    return out


def _ac_dequant_batch(c: np.ndarray, qp: int) -> np.ndarray:
    """_ac_dequant over a (n, 4, 4) stack (LevelScale broadcast)."""
    return (c * _levelscale4x4(qp % 6)) << (qp // 6)


def _dense8_batch(a: np.ndarray) -> np.ndarray:
    """Row-wise _dense8 over an (n, m) scan-order coefficient matrix:
    keep the 8 largest |level| per row (ties to the lower scan
    position — the stable argsort keeps original order on equal
    keys), raise the lowest-frequency zeros to +1 when fewer."""
    out = a.copy()
    nzc = np.count_nonzero(a, axis=1)
    over = nzc > 8
    if over.any():
        sub = a[over]
        idx = np.argsort(-np.abs(sub), axis=1, kind="stable")[:, :8]
        b = np.zeros_like(sub)
        r = np.arange(sub.shape[0])[:, None]
        b[r, idx] = sub[r, idx]
        out[over] = b
    under = nzc < 8
    if under.any():
        sub = out[under]
        z = sub == 0
        fill = z & (np.cumsum(z, axis=1) <= (8 - nzc[under])[:, None])
        sub[fill] = 1
        out[under] = sub
    return out


# basis gains of the inverse transform: position (i,j)'s coefficient
# is reproduced by the inverse with weight g_i * g_j where g = 1 for
# even rows/cols (full butterflies) and 5/4... — encoder quantization
# below calibrates per position against the ACTUAL integer transform
# pair instead of closed-form gains, so truncation in the >>1
# butterflies is accounted for exactly.
_FWD_GAIN = np.array([4, 10, 4, 10], dtype=np.int64)  # Cf row energies


# -- chroma DC transform path (§8.5.11, Table 8-15) --------------------------
# QPc as a function of qPI for qPI > 29 (below 30 they are equal).
_QPC_HIGH = (29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
             37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
_H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)


def _chroma_qpc(qp: int) -> int:
    """Luma QP → chroma QPc (chroma_qp_index_offset 0, Table 8-15)."""
    return qp if qp < 30 else _QPC_HIGH[qp - 30]


def _chroma_dc_dequant(c4: list[int], qpc: int) -> np.ndarray:
    """Inverse 2x2 Hadamard + DC scaling of the parsed ChromaDCLevel
    block (§8.5.11) → 2x2 int array of per-4x4-block DC values (pre
    the final (x+32)>>6 of the core transform).  The 4 coefficients
    arrive in raster scan (no zigzag for 2x2)."""
    c = np.asarray(c4, np.int64).reshape(2, 2)
    f = _H2 @ c @ _H2
    return (f * _DC_LEVELSCALE[qpc % 6]) << (qpc // 6) >> 5


def _chroma_dc_quant(resid8: np.ndarray, qpc: int) -> list[int]:
    """Forward 2x2 chroma-DC path for an 8x8 residual: per-4x4 sums →
    forward Hadamard → quantize so the decoder's §8.5.11 chain
    reproduces the DC as closely as the step allows."""
    dc = resid8.reshape(2, 4, 2, 4).sum(axis=(1, 3))
    fh = _H2 @ dc @ _H2
    a, e = _DC_LEVELSCALE[qpc % 6], qpc // 6
    # decoder chain: c -> f = H(Hc H)H = 4K dc -> dcC = f*a*2^e/32;
    # target dcC = 4*dc (so (dcC+32)>>6 is the block mean), hence
    # K = 32/(a*2^e)
    c = np.sign(fh) * np.floor(np.abs(fh) * 32.0 / (a * (1 << e)) + 0.5)
    return [int(v) for v in c.astype(np.int64).reshape(4)]


def _intra16_pred_luma(
    mode: int, top, left, corner, avail_top: bool, avail_left: bool
) -> np.ndarray:
    """Intra_16x16 luma prediction (§8.3.3): 0=V, 1=H, 2=DC, 3=Plane.
    ``top``/``left`` are the 16 reconstructed neighbour samples (or
    None), ``corner`` the p[-1,-1] sample."""
    if mode == 0:
        if not avail_top:
            raise ValueError("Intra_16x16 vertical without top neighbour")
        return np.tile(np.asarray(top, np.int64), (16, 1))
    if mode == 1:
        if not avail_left:
            raise ValueError("Intra_16x16 horizontal without left neighbour")
        return np.tile(np.asarray(left, np.int64).reshape(16, 1), (1, 16))
    if mode == 2:
        if avail_top and avail_left:
            dc = (int(np.sum(top)) + int(np.sum(left)) + 16) >> 5
        elif avail_top:
            dc = (int(np.sum(top)) + 8) >> 4
        elif avail_left:
            dc = (int(np.sum(left)) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, np.int64)
    if mode == 3:
        if not (avail_top and avail_left):
            raise ValueError("Intra_16x16 plane without both neighbours")
        t = np.asarray(top, np.int64)
        lf = np.asarray(left, np.int64)
        tx = np.concatenate([[corner], t])  # p[-1..15, -1 row]
        ly = np.concatenate([[corner], lf])
        hsum = sum((x + 1) * (int(tx[9 + x]) - int(tx[7 - x])) for x in range(8))
        vsum = sum((y + 1) * (int(ly[9 + y]) - int(ly[7 - y])) for y in range(8))
        aa = 16 * (int(t[15]) + int(lf[15]))
        bb = (5 * hsum + 32) >> 6
        cc = (5 * vsum + 32) >> 6
        jj, ii = np.meshgrid(np.arange(16), np.arange(16))
        return _uclip((aa + bb * (jj - 7) + cc * (ii - 7) + 16) >> 5, 0, 255)
    raise ValueError(f"invalid Intra_16x16 prediction mode {mode}")


def _chroma_dc_pred(top, left, avail_top: bool, avail_left: bool) -> np.ndarray:
    """Chroma 8x8 DC prediction (§8.3.4, intra_chroma_pred_mode 0),
    per-4x4 quadrant: (0,0)/(1,1) average both available edges,
    (1,0) prefers the top edge, (0,1) the left edge."""
    out = np.empty((8, 8), np.int64)
    t = np.asarray(top, np.int64) if avail_top else None
    lf = np.asarray(left, np.int64) if avail_left else None

    def quad(tpart, lpart, prefer):
        have_t, have_l = tpart is not None, lpart is not None
        if prefer == "t":
            if have_t:
                return (int(tpart.sum()) + 2) >> 2
            if have_l:
                return (int(lpart.sum()) + 2) >> 2
        elif prefer == "l":
            if have_l:
                return (int(lpart.sum()) + 2) >> 2
            if have_t:
                return (int(tpart.sum()) + 2) >> 2
        else:
            if have_t and have_l:
                return (int(tpart.sum()) + int(lpart.sum()) + 4) >> 3
            if have_t:
                return (int(tpart.sum()) + 2) >> 2
            if have_l:
                return (int(lpart.sum()) + 2) >> 2
        return 128

    out[0:4, 0:4] = quad(
        t[0:4] if avail_top else None, lf[0:4] if avail_left else None, "b"
    )
    out[0:4, 4:8] = quad(
        t[4:8] if avail_top else None, lf[0:4] if avail_left else None, "t"
    )
    out[4:8, 0:4] = quad(
        t[0:4] if avail_top else None, lf[4:8] if avail_left else None, "l"
    )
    out[4:8, 4:8] = quad(
        t[4:8] if avail_top else None, lf[4:8] if avail_left else None, "b"
    )
    return out


def _i16dc_slice_rbsp(
    y_plane: np.ndarray, qp: int, idr_pic_id: int
) -> tuple[bytes, np.ndarray]:
    """One IDR slice of Intra_16x16_2_0_0 (DC-predicted, luma-DC-only
    residual) macroblocks covering a PADDED grayscale luma plane.
    Returns (rbsp, reconstructed plane) — the closed loop: the encoder
    reconstructs exactly what the decoder will, and predicts the next
    macroblock from that reconstruction."""
    mb_h, mb_w = y_plane.shape[0] // 16, y_plane.shape[1] // 16
    a, e = _DC_LEVELSCALE[qp % 6], qp // 6
    bw = _EgWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(7)            # slice_type: I
    bw.ue(0)            # pic_parameter_set_id
    bw.u(0, 4)          # frame_num
    bw.ue(idr_pic_id)
    bw.u(0, 1); bw.u(0, 1)  # dec_ref_pic_marking (IDR)
    bw.se(qp - 26)      # slice_qp_delta (pic_init_qp is 26)
    bw.ue(1)            # disable_deblocking_filter_idc
    recon = np.zeros_like(y_plane, dtype=np.int64)
    src = y_plane.astype(np.int64)
    for my in range(mb_h):
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            avail_top, avail_left = my > 0, mx > 0
            pred = _intra16_pred_luma(
                2,
                recon[y0 - 1, x0 : x0 + 16] if avail_top else None,
                recon[y0 : y0 + 16, x0 - 1] if avail_left else None,
                recon[y0 - 1, x0 - 1] if (avail_top and avail_left) else 0,
                avail_top,
                avail_left,
            )
            resid = src[y0 : y0 + 16, x0 : x0 + 16] - pred
            # per-4x4 block sums = core-transform DC coefficients
            x_dc = resid.reshape(4, 4, 4, 4).sum(axis=(1, 3))
            fh = _HADAMARD4 @ x_dc @ _HADAMARD4
            c = (
                np.sign(fh)
                * np.floor(np.abs(fh) * (2.0 ** (6 - e)) / (4 * a) + 0.5)
            ).astype(np.int64)
            bw.ue(3)    # mb_type I_16x16_2_0_0 (DC pred, cbp 0/0)
            bw.ue(0)    # intra_chroma_pred_mode: DC
            bw.se(0)    # mb_qp_delta
            cavlc_encode_block(bw, list(c.reshape(16)[_ZZ4]))
            dc = _luma_dc_dequant(list(c.reshape(16)[_ZZ4]), qp)
            r = (dc + 32) >> 6  # per-4x4 constant residual sample
            recon[y0 : y0 + 16, x0 : x0 + 16] = _uclip(
                pred + np.repeat(np.repeat(r, 4, axis=0), 4, axis=1), 0, 255
            )
    bw.rbsp_trailing()
    return bw.tobytes(), recon


def h264_encode_frame_i16dc(
    rgb: np.ndarray, qp: int = 28, idr_pic_id: int = 0
) -> list[bytes]:
    """Encode one frame as [SPS, PPS, IDR] where every macroblock is
    Intra_16x16 with DC prediction and a CAVLC-coded luma-DC-only
    residual (cbp 0/0) — the first transform-coded rung above I_PCM:
    real entropy coding, real integer-transform scaling, real intra
    prediction, a real closed prediction loop.  Chroma carries no
    residual, so color degrades to the DC prediction chain (exactly
    128): feed GRAYSCALE frames for a faithful round-trip."""
    h, w = rgb.shape[:2]
    if w % 2 or h % 2:
        raise ValueError("dimensions must be even (4:2:0 chroma cropping)")
    if not 0 <= qp <= 51:
        raise ValueError("qp must be 0..51")
    padded = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
    y, _cb, _cr = _rgb_to_yuv420(padded)
    slice_rbsp, _ = _i16dc_slice_rbsp(y, qp, idr_pic_id)
    return [
        _nal(7, _sps_rbsp(w, h)),
        _nal(8, _pps_rbsp()),
        _nal(5, slice_rbsp),
    ]


def _i16cdc_slice_rbsp(
    y_plane: np.ndarray,
    cb_plane: np.ndarray,
    cr_plane: np.ndarray,
    qp: int,
    idr_pic_id: int,
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """One IDR slice of Intra_16x16_2_1_0 macroblocks (DC-predicted,
    luma-DC residual + 2x2 CHROMA-DC residual, cbp 1/0): the first
    cbp != 0 rung — real color, still DC-only.  Closed loop on all
    three planes."""
    mb_h, mb_w = y_plane.shape[0] // 16, y_plane.shape[1] // 16
    a, e = _DC_LEVELSCALE[qp % 6], qp // 6
    qpc = _chroma_qpc(qp)
    bw = _EgWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(7)            # slice_type: I
    bw.ue(0)            # pic_parameter_set_id
    bw.u(0, 4)          # frame_num
    bw.ue(idr_pic_id)
    bw.u(0, 1); bw.u(0, 1)  # dec_ref_pic_marking (IDR)
    bw.se(qp - 26)      # slice_qp_delta (pic_init_qp is 26)
    bw.ue(1)            # disable_deblocking_filter_idc
    rec_y = np.zeros_like(y_plane, dtype=np.int64)
    rec_cb = np.zeros_like(cb_plane, dtype=np.int64)
    rec_cr = np.zeros_like(cr_plane, dtype=np.int64)
    src_y = y_plane.astype(np.int64)
    src_c = (cb_plane.astype(np.int64), cr_plane.astype(np.int64))
    rec_c = (rec_cb, rec_cr)
    for my in range(mb_h):
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            avail_top, avail_left = my > 0, mx > 0
            pred = _intra16_pred_luma(
                2,
                rec_y[y0 - 1, x0 : x0 + 16] if avail_top else None,
                rec_y[y0 : y0 + 16, x0 - 1] if avail_left else None,
                rec_y[y0 - 1, x0 - 1] if (avail_top and avail_left) else 0,
                avail_top,
                avail_left,
            )
            resid = src_y[y0 : y0 + 16, x0 : x0 + 16] - pred
            x_dc = resid.reshape(4, 4, 4, 4).sum(axis=(1, 3))
            fh = _HADAMARD4 @ x_dc @ _HADAMARD4
            c = (
                np.sign(fh)
                * np.floor(np.abs(fh) * (2.0 ** (6 - e)) / (4 * a) + 0.5)
            ).astype(np.int64)
            bw.ue(7)    # mb_type I_16x16_2_1_0 (DC pred, cbp 1/0)
            bw.ue(0)    # intra_chroma_pred_mode: DC
            bw.se(0)    # mb_qp_delta
            cavlc_encode_block(bw, list(c.reshape(16)[_ZZ4]))
            dc = _luma_dc_dequant(list(c.reshape(16)[_ZZ4]), qp)
            r = (dc + 32) >> 6
            rec_y[y0 : y0 + 16, x0 : x0 + 16] = _uclip(
                pred + np.repeat(np.repeat(r, 4, axis=0), 4, axis=1), 0, 255
            )
            # chroma: DC residual per component, Cb then Cr (§7.3.5.3.3)
            cy0, cx0 = my * 8, mx * 8
            for src_p, rec_p in zip(src_c, rec_c):
                cpred = _chroma_dc_pred(
                    rec_p[cy0 - 1, cx0 : cx0 + 8] if avail_top else None,
                    rec_p[cy0 : cy0 + 8, cx0 - 1] if avail_left else None,
                    avail_top,
                    avail_left,
                )
                cresid = src_p[cy0 : cy0 + 8, cx0 : cx0 + 8] - cpred
                cc = _chroma_dc_quant(cresid, qpc)
                cavlc_encode_block(
                    bw, cc, _CT_NCM1, _TOTAL_ZEROS_CDC, max_coeff=4
                )
                dcc = _chroma_dc_dequant(cc, qpc)
                cr_ = (dcc + 32) >> 6
                rec_p[cy0 : cy0 + 8, cx0 : cx0 + 8] = _uclip(
                    cpred + np.repeat(np.repeat(cr_, 4, axis=0), 4, axis=1),
                    0,
                    255,
                )
    bw.rbsp_trailing()
    return bw.tobytes(), rec_y, rec_cb, rec_cr


# forward-quant multipliers MF(qp%6, class) (the standard encoder
# tables paired with LevelScale; not normative — only dequant is)
_MF_A = (13107, 11916, 10082, 9362, 8192, 7282)
_MF_B = (5243, 4660, 4194, 3647, 3355, 2893)
_MF_C = (8066, 7490, 6554, 5825, 5243, 4559)


def _mf4x4(m: int) -> np.ndarray:
    mf = np.full((4, 4), _MF_C[m], np.int64)
    for i, j in ((0, 0), (0, 2), (2, 0), (2, 2)):
        mf[i, j] = _MF_A[m]
    for i, j in ((1, 1), (1, 3), (3, 1), (3, 3)):
        mf[i, j] = _MF_B[m]
    return mf


#: blkIdx -> (x4, y4) position of the 4x4 luma block inside the MB
#: (§6.4.3 z-scan: 2x2 nesting of 2x2 quadrants)
_BLK_SCAN = [
    (2 * ((i // 4) % 2) + i % 2, 2 * (i // 8) + (i // 2) % 2)
    for i in range(16)
]

# index arrays for gathering/scattering a MB's 16 luma blocks between
# the (16, 16) pixel layout and blkIdx order in one fancy-index op
_BLK_SCAN_BX = np.array([bx for bx, _ in _BLK_SCAN])
_BLK_SCAN_BY = np.array([by for _, by in _BLK_SCAN])
_ZZ4_ARR = np.array(_ZZ4)
_ZZ4_INV = np.argsort(_ZZ4_ARR)  # flat index -> zigzag position


def _mb_blocks(pix16: np.ndarray) -> np.ndarray:
    """(16, 16) MB pixels -> (16, 4, 4) stack of 4x4 blocks in blkIdx
    (z-scan) order."""
    return pix16.reshape(4, 4, 4, 4).swapaxes(1, 2)[
        _BLK_SCAN_BY, _BLK_SCAN_BX
    ]


def _mb_from_blocks(blocks: np.ndarray) -> np.ndarray:
    """Inverse of _mb_blocks: (16, 4, 4) blkIdx-order stack ->
    (16, 16) MB pixels."""
    quad = np.empty((4, 4, 4, 4), blocks.dtype)
    quad[_BLK_SCAN_BY, _BLK_SCAN_BX] = blocks
    return quad.swapaxes(1, 2).reshape(16, 16)


def _i16ac_slice_rbsp(
    y_plane: np.ndarray,
    cb_plane: np.ndarray,
    cr_plane: np.ndarray,
    qp: int,
    idr_pic_id: int,
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """One IDR slice of Intra_16x16_2_1_1 macroblocks (DC prediction,
    luma DC + single-coefficient luma AC residual per 4x4 block,
    chroma DC residual; mb_type 19, cbp 1/15).

    The SINGLE-AC constraint (each Intra16x16ACLevel block carries at
    most ONE nonzero coefficient — the dominant one) keeps every
    neighbour TotalCoeff ≤ 1, hence nC = (nA+nB+1)>>1 ≤ 1 at every
    block: the stream stays inside the implemented nC < 2 coeff_token
    column while remaining fully conformant for a spec decoder (which
    would derive the same nC and pick the same table)."""
    mb_h, mb_w = y_plane.shape[0] // 16, y_plane.shape[1] // 16
    a, e = _DC_LEVELSCALE[qp % 6], qp // 6
    qpc = _chroma_qpc(qp)
    mf = _mf4x4(qp % 6)
    fq = (1 << (15 + e)) // 3  # intra rounding offset
    bw = _EgWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(7)            # slice_type: I
    bw.ue(0)            # pic_parameter_set_id
    bw.u(0, 4)          # frame_num
    bw.ue(idr_pic_id)
    bw.u(0, 1); bw.u(0, 1)  # dec_ref_pic_marking (IDR)
    bw.se(qp - 26)      # slice_qp_delta
    bw.ue(1)            # disable_deblocking_filter_idc
    rec_y = np.zeros_like(y_plane, dtype=np.int64)
    rec_cb = np.zeros_like(cb_plane, dtype=np.int64)
    rec_cr = np.zeros_like(cr_plane, dtype=np.int64)
    src_y = y_plane.astype(np.int64)
    src_c = (cb_plane.astype(np.int64), cr_plane.astype(np.int64))
    rec_c = (rec_cb, rec_cr)
    for my in range(mb_h):
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            avail_top, avail_left = my > 0, mx > 0
            pred = _intra16_pred_luma(
                2,
                rec_y[y0 - 1, x0 : x0 + 16] if avail_top else None,
                rec_y[y0 : y0 + 16, x0 - 1] if avail_left else None,
                rec_y[y0 - 1, x0 - 1] if (avail_top and avail_left) else 0,
                avail_top,
                avail_left,
            )
            resid = src_y[y0 : y0 + 16, x0 : x0 + 16] - pred
            # forward transform every 4x4 block (one batched matmul);
            # DC chain over the W00s
            w = _CF @ _mb_blocks(resid) @ _CF.T
            x_dc = np.empty((4, 4), np.int64)
            x_dc[_BLK_SCAN_BY, _BLK_SCAN_BX] = w[:, 0, 0]
            fh = _HADAMARD4 @ x_dc @ _HADAMARD4
            c_dc = (
                np.sign(fh)
                * np.floor(np.abs(fh) * (2.0 ** (6 - e)) / (4 * a) + 0.5)
            ).astype(np.int64)
            bw.ue(19)   # mb_type I_16x16_2_1_1 (DC pred, cbp 1/15)
            bw.ue(0)    # intra_chroma_pred_mode: DC
            bw.se(0)    # mb_qp_delta
            cavlc_encode_block(bw, list(c_dc.reshape(16)[_ZZ4]))
            dc = _luma_dc_dequant(list(c_dc.reshape(16)[_ZZ4]), qp)
            # AC: keep the single dominant quantized coefficient per
            # block; reconstruct through the real inverse transform.
            # np.argmax takes the FIRST maximum — the same lowest-flat-
            # index tie-break as the scalar loop.
            cq = np.sign(w) * ((np.abs(w) * mf + fq) >> (15 + e))
            cqf = cq.reshape(16, 16)
            absf = np.abs(cqf).copy()
            absf[:, 0] = 0
            best = np.argmax(absf, axis=1)
            rows = np.arange(16)
            vals = cqf[rows, best]
            has = absf[rows, best] > 0
            cm = np.zeros((16, 16), np.int64)
            cm[rows[has], best[has]] = vals[has]
            ac_m = np.zeros((16, 15), np.int64)
            kpos = _ZZ4_INV[best]                 # zigzag position 1..15
            ac_m[rows[has], kpos[has] - 1] = vals[has]
            for bi in range(16):
                cavlc_encode_block(bw, ac_m[bi].tolist(), max_coeff=15)
            d = _ac_dequant_batch(cm.reshape(16, 4, 4), qp)
            d[:, 0, 0] = dc[_BLK_SCAN_BY, _BLK_SCAN_BX]
            r = (_inv_transform4x4_batch(d) + 32) >> 6
            rec_y[y0 : y0 + 16, x0 : x0 + 16] = _uclip(
                pred + _mb_from_blocks(r), 0, 255
            )
            # chroma DC residual, Cb then Cr
            cy0, cx0 = my * 8, mx * 8
            for src_p, rec_p in zip(src_c, rec_c):
                cpred = _chroma_dc_pred(
                    rec_p[cy0 - 1, cx0 : cx0 + 8] if avail_top else None,
                    rec_p[cy0 : cy0 + 8, cx0 - 1] if avail_left else None,
                    avail_top,
                    avail_left,
                )
                cresid = src_p[cy0 : cy0 + 8, cx0 : cx0 + 8] - cpred
                cc = _chroma_dc_quant(cresid, qpc)
                cavlc_encode_block(
                    bw, cc, _CT_NCM1, _TOTAL_ZEROS_CDC, max_coeff=4
                )
                dcc = _chroma_dc_dequant(cc, qpc)
                cr_ = (dcc + 32) >> 6
                rec_p[cy0 : cy0 + 8, cx0 : cx0 + 8] = _uclip(
                    cpred + np.repeat(np.repeat(cr_, 4, axis=0), 4, axis=1),
                    0,
                    255,
                )
    bw.rbsp_trailing()
    return bw.tobytes(), rec_y, rec_cb, rec_cr


def h264_encode_frame_i16ac(
    rgb: np.ndarray, qp: int = 28, idr_pic_id: int = 0
) -> list[bytes]:
    """Encode one frame as [SPS, PPS, IDR] of Intra_16x16_2_1_1
    macroblocks: the luma AC residual path (cbp_luma 15) in its
    single-coefficient-per-block subset plus the chroma-DC color
    path — per-block directional detail the DC-only rungs discard."""
    h, w = rgb.shape[:2]
    if w % 2 or h % 2:
        raise ValueError("dimensions must be even (4:2:0 chroma cropping)")
    if not 0 <= qp <= 51:
        raise ValueError("qp must be 0..51")
    padded = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_yuv420(padded)
    slice_rbsp, _, _, _ = _i16ac_slice_rbsp(y, cb, cr, qp, idr_pic_id)
    return [
        _nal(7, _sps_rbsp(w, h)),
        _nal(8, _pps_rbsp()),
        _nal(5, slice_rbsp),
    ]


def _i16ac8_slice_rbsp(
    y_plane: np.ndarray,
    cb_plane: np.ndarray,
    cr_plane: np.ndarray,
    qp: int,
    idr_pic_id: int,
    pcm_mbs: frozenset[tuple[int, int]] = frozenset(),
    chroma_ac: bool = False,
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """One IDR slice of Intra_16x16_2_1_1 macroblocks with DENSE-8
    luma AC residuals: every Intra16x16ACLevel block carries EXACTLY
    eight nonzero coefficients (the eight largest-magnitude quantized
    ones; lowest-frequency zeros are raised to +1 when the content
    yields fewer).  The pinned density drives the multi-coefficient
    CAVLC machinery — runs, trailing-one signs, level suffix-length
    adaptation, total_zeros at TotalCoeff 8 — AND pins every derived
    nC to {0, 8}: the frame's first DC/AC parse sees no neighbours
    (nC 0, transcribed VLC column), every other block averages
    neighbours that all carry TotalCoeff 8 (nC 8, the formula-defined
    FLC column).  The lookup-defined 2 <= nC < 8 columns are never
    touched, so the stream is fully conformant for a spec decoder
    while staying inside the validatable tables."""
    mb_h, mb_w = y_plane.shape[0] // 16, y_plane.shape[1] // 16
    a, e = _DC_LEVELSCALE[qp % 6], qp // 6
    qpc = _chroma_qpc(qp)
    mf = _mf4x4(qp % 6)
    fq = (1 << (15 + e)) // 3  # intra rounding offset
    bw = _EgWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(7)            # slice_type: I
    bw.ue(0)            # pic_parameter_set_id
    bw.u(0, 4)          # frame_num
    bw.ue(idr_pic_id)
    bw.u(0, 1); bw.u(0, 1)  # dec_ref_pic_marking (IDR)
    bw.se(qp - 26)      # slice_qp_delta
    bw.ue(1)            # disable_deblocking_filter_idc
    rec_y = np.zeros_like(y_plane, dtype=np.int64)
    rec_cb = np.zeros_like(cb_plane, dtype=np.int64)
    rec_cr = np.zeros_like(cr_plane, dtype=np.int64)
    src_y = y_plane.astype(np.int64)
    src_c = (cb_plane.astype(np.int64), cr_plane.astype(np.int64))
    rec_c = (rec_cb, rec_cr)
    # encoder-side nC grids — must mirror the decoder bit for bit
    nc_grid = np.zeros((mb_h * 4, mb_w * 4), np.int64)
    nc_c = [
        np.zeros((mb_h * 2, mb_w * 2), np.int64),
        np.zeros((mb_h * 2, mb_w * 2), np.int64),
    ]

    def _nc_in(grid, gx: int, gy: int) -> int:
        has_a, has_b = gx > 0, gy > 0
        if has_a and has_b:
            return int((grid[gy, gx - 1] + grid[gy - 1, gx] + 1) >> 1)
        if has_a:
            return int(grid[gy, gx - 1])
        if has_b:
            return int(grid[gy - 1, gx])
        return 0

    def _nc_of(gx: int, gy: int) -> int:
        return _nc_in(nc_grid, gx, gy)

    def _ct_for(nc: int) -> dict:
        if nc < 2:
            return _CT_NC02
        if nc >= 8:
            return _CT_NC8
        raise AssertionError(f"dense-8 encoder derived nC {nc}")

    for my in range(mb_h):
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            gx0, gy0 = mx * 4, my * 4
            if (my, mx) in pcm_mbs:
                bw.ue(25)  # I_PCM
                bw.align_zero()
                cy0_, cx0_ = my * 8, mx * 8
                bw.raw_bytes(
                    src_y[y0 : y0 + 16, x0 : x0 + 16]
                    .astype(np.uint8).tobytes()
                )
                for src_p in src_c:
                    bw.raw_bytes(
                        src_p[cy0_ : cy0_ + 8, cx0_ : cx0_ + 8]
                        .astype(np.uint8).tobytes()
                    )
                rec_y[y0 : y0 + 16, x0 : x0 + 16] = src_y[
                    y0 : y0 + 16, x0 : x0 + 16
                ]
                for src_p, rec_p in zip(src_c, rec_c):
                    rec_p[cy0_ : cy0_ + 8, cx0_ : cx0_ + 8] = src_p[
                        cy0_ : cy0_ + 8, cx0_ : cx0_ + 8
                    ]
                nc_grid[gy0 : gy0 + 4, gx0 : gx0 + 4] = 16
                for g in nc_c:
                    g[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
                continue
            avail_top, avail_left = my > 0, mx > 0
            pred = _intra16_pred_luma(
                2,
                rec_y[y0 - 1, x0 : x0 + 16] if avail_top else None,
                rec_y[y0 : y0 + 16, x0 - 1] if avail_left else None,
                rec_y[y0 - 1, x0 - 1] if (avail_top and avail_left) else 0,
                avail_top,
                avail_left,
            )
            resid = src_y[y0 : y0 + 16, x0 : x0 + 16] - pred
            # all 16 blocks: forward transform + quantize + dense-8 in
            # one numpy pass (the CAVLC writes stay sequential below)
            w = _CF @ _mb_blocks(resid) @ _CF.T
            x_dc = np.empty((4, 4), np.int64)
            x_dc[_BLK_SCAN_BY, _BLK_SCAN_BX] = w[:, 0, 0]
            fh = _HADAMARD4 @ x_dc @ _HADAMARD4
            c_dc = (
                np.sign(fh)
                * np.floor(np.abs(fh) * (2.0 ** (6 - e)) / (4 * a) + 0.5)
            ).astype(np.int64)
            # mb_type (Table 7-11): 19 = I_16x16_2_1_1 (cbpC 1),
            # 23 = I_16x16_2_2_1 (cbpC 2 — chroma AC present)
            bw.ue(23 if chroma_ac else 19)
            bw.ue(0)    # intra_chroma_pred_mode: DC
            bw.se(0)    # mb_qp_delta
            cavlc_encode_block(
                bw, list(c_dc.reshape(16)[_ZZ4]), _ct_for(_nc_of(gx0, gy0))
            )
            dc = _luma_dc_dequant(list(c_dc.reshape(16)[_ZZ4]), qp)
            cq = np.sign(w) * ((np.abs(w) * mf + fq) >> (15 + e))
            acm = _dense8_batch(cq.reshape(16, 16)[:, _ZZ4_ARR[1:]])
            for bi in range(16):
                bx, by = _BLK_SCAN[bi]
                nc = _nc_of(gx0 + bx, gy0 + by)
                cavlc_encode_block(
                    bw, acm[bi].tolist(), _ct_for(nc), max_coeff=15
                )
                nc_grid[gy0 + by, gx0 + bx] = 8
            cm = np.zeros((16, 16), np.int64)
            cm[:, _ZZ4_ARR[1:]] = acm
            d = _ac_dequant_batch(cm.reshape(16, 4, 4), qp)
            d[:, 0, 0] = dc[_BLK_SCAN_BY, _BLK_SCAN_BX]
            r = (_inv_transform4x4_batch(d) + 32) >> 6
            rec_y[y0 : y0 + 16, x0 : x0 + 16] = _uclip(
                pred + _mb_from_blocks(r), 0, 255
            )
            cy0, cx0 = my * 8, mx * 8
            # §7.3.5.3.3 order: ChromaDCLevel Cb then Cr FIRST, then
            # (cbp_chroma 2) the ChromaACLevel blocks of Cb, then Cr
            cpreds, cresids, dccs, wplanes = [], [], [], []
            for src_p, rec_p in zip(src_c, rec_c):
                cpred = _chroma_dc_pred(
                    rec_p[cy0 - 1, cx0 : cx0 + 8] if avail_top else None,
                    rec_p[cy0 : cy0 + 8, cx0 - 1] if avail_left else None,
                    avail_top,
                    avail_left,
                )
                cresid = src_p[cy0 : cy0 + 8, cx0 : cx0 + 8] - cpred
                cc = _chroma_dc_quant(cresid, qpc)
                cavlc_encode_block(
                    bw, cc, _CT_NCM1, _TOTAL_ZEROS_CDC, max_coeff=4
                )
                cpreds.append(cpred)
                cresids.append(cresid)
                dccs.append(_chroma_dc_dequant(cc, qpc))
            if chroma_ac:
                mfc = _mf4x4(qpc % 6)
                ec = qpc // 6
                fqc = (1 << (15 + ec)) // 3
                cgx0, cgy0 = mx * 2, my * 2
                for pi, rec_p in enumerate(rec_c):
                    # the 4 chroma blocks batched exactly like the
                    # luma 16 (cbi order 0..3 is row-major (cby, cbx))
                    cblocks = (
                        cresids[pi].reshape(2, 4, 2, 4).swapaxes(1, 2)
                    )
                    wq = _CF @ cblocks.reshape(4, 4, 4) @ _CF.T
                    cq = np.sign(wq) * (
                        (np.abs(wq) * mfc + fqc) >> (15 + ec)
                    )
                    acm = _dense8_batch(cq.reshape(4, 16)[:, _ZZ4_ARR[1:]])
                    for cbi in range(4):
                        cbx, cby = cbi % 2, cbi // 2
                        nc = _nc_in(nc_c[pi], cgx0 + cbx, cgy0 + cby)
                        cavlc_encode_block(
                            bw, acm[cbi].tolist(), _ct_for(nc), max_coeff=15
                        )
                        nc_c[pi][cgy0 + cby, cgx0 + cbx] = 8
                    cm = np.zeros((4, 16), np.int64)
                    cm[:, _ZZ4_ARR[1:]] = acm
                    d = _ac_dequant_batch(cm.reshape(4, 4, 4), qpc)
                    d[:, 0, 0] = dccs[pi].reshape(4)
                    r = (_inv_transform4x4_batch(d) + 32) >> 6
                    rec_p[cy0 : cy0 + 8, cx0 : cx0 + 8] = _uclip(
                        cpreds[pi]
                        + r.reshape(2, 2, 4, 4).swapaxes(1, 2).reshape(8, 8),
                        0,
                        255,
                    )
            else:
                for pi, rec_p in enumerate(rec_c):
                    rc_fill = (dccs[pi] + 32) >> 6
                    rec_p[cy0 : cy0 + 8, cx0 : cx0 + 8] = _uclip(
                        cpreds[pi]
                        + np.repeat(np.repeat(rc_fill, 4, axis=0), 4, axis=1),
                        0,
                        255,
                    )
    bw.rbsp_trailing()
    return bw.tobytes(), rec_y, rec_cb, rec_cr


def h264_encode_frame_i16ac8(
    rgb: np.ndarray,
    qp: int = 28,
    idr_pic_id: int = 0,
    pcm_mbs: frozenset[tuple[int, int]] = frozenset(),
    chroma_ac: bool = False,
) -> list[bytes]:
    """Encode one frame as [SPS, PPS, IDR] of DENSE-8 Intra_16x16
    macroblocks — the multi-coefficient CAVLC path through the
    formula-defined nC >= 8 coeff_token column (see
    _i16ac8_slice_rbsp for why the density is pinned at 8)."""
    h, w = rgb.shape[:2]
    if w % 2 or h % 2:
        raise ValueError("dimensions must be even (4:2:0 chroma cropping)")
    if not 0 <= qp <= 51:
        raise ValueError("qp must be 0..51")
    padded = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_yuv420(padded)
    slice_rbsp, _, _, _ = _i16ac8_slice_rbsp(
        y, cb, cr, qp, idr_pic_id, pcm_mbs, chroma_ac
    )
    return [
        _nal(7, _sps_rbsp(w, h)),
        _nal(8, _pps_rbsp()),
        _nal(5, slice_rbsp),
    ]


def h264_encode_frame_i16ac8_with_rec(
    rgb: np.ndarray,
    qp: int = 28,
    idr_pic_id: int = 0,
    pcm_mbs: frozenset[tuple[int, int]] = frozenset(),
    chroma_ac: bool = False,
) -> tuple[list[bytes], np.ndarray]:
    """Encode AND return the closed-loop reconstruction from the SAME
    slice pass (cropped to source dims) — what a conformant decoder
    must reproduce bit-for-bit.  One encoder pass instead of the
    encode-then-reconstruct pair; fixture producers hash the rec so
    the verify side only ever pays the decode."""
    h, w = rgb.shape[:2]
    if w % 2 or h % 2:
        raise ValueError("dimensions must be even (4:2:0 chroma cropping)")
    if not 0 <= qp <= 51:
        raise ValueError("qp must be 0..51")
    padded = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_yuv420(padded)
    slice_rbsp, ry, rcb, rcr = _i16ac8_slice_rbsp(
        y, cb, cr, qp, idr_pic_id, pcm_mbs, chroma_ac
    )
    nals = [
        _nal(7, _sps_rbsp(w, h)),
        _nal(8, _pps_rbsp()),
        _nal(5, slice_rbsp),
    ]
    return nals, _yuv420_to_rgb(ry, rcb, rcr)[:h, :w]


def h264_reconstruct_frame_i16ac8(
    rgb: np.ndarray, qp: int = 28,
    pcm_mbs: frozenset[tuple[int, int]] = frozenset(),
    chroma_ac: bool = False,
) -> np.ndarray:
    """The encoder's own closed-loop reconstruction of a dense-8
    frame (what a conformant decoder MUST reproduce bit-for-bit),
    cropped back to the source dims — the equality target for the
    round-trip gate."""
    h, w = rgb.shape[:2]
    padded = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_yuv420(padded)
    _, ry, rcb, rcr = _i16ac8_slice_rbsp(
        y, cb, cr, qp, 0, pcm_mbs, chroma_ac
    )
    return _yuv420_to_rgb(ry, rcb, rcr)[:h, :w]


def h264_encode_frame_i16cdc_yuv(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    crop_w: int,
    crop_h: int,
    qp: int = 28,
    idr_pic_id: int = 0,
) -> list[bytes]:
    """YUV-plane-level Intra_16x16_2_1_0 encode (y is crop_h-padded to
    the macroblock grid already or gets padded here; cb/cr are the
    half-size 4:2:0 planes).  Exists so fixtures designed for EXACT
    quantization in YUV space are not disturbed by RGB→YUV rounding."""
    if crop_w % 2 or crop_h % 2:
        raise ValueError("crop dimensions must be even")
    if not 0 <= qp <= 51:
        raise ValueError("qp must be 0..51")
    h, w = y.shape
    py, px = -h % 16, -w % 16
    y = np.pad(y, ((0, py), (0, px)), mode="edge")
    cb = np.pad(cb, ((0, (-cb.shape[0]) % 8), (0, (-cb.shape[1]) % 8)), mode="edge")
    cr = np.pad(cr, ((0, (-cr.shape[0]) % 8), (0, (-cr.shape[1]) % 8)), mode="edge")
    slice_rbsp, _, _, _ = _i16cdc_slice_rbsp(y, cb, cr, qp, idr_pic_id)
    return [
        _nal(7, _sps_rbsp(crop_w, crop_h)),
        _nal(8, _pps_rbsp()),
        _nal(5, slice_rbsp),
    ]


def h264_encode_frame_i16cdc(
    rgb: np.ndarray, qp: int = 28, idr_pic_id: int = 0
) -> list[bytes]:
    """Encode one frame as [SPS, PPS, IDR] where every macroblock is
    Intra_16x16_2_1_0: DC prediction, CAVLC luma-DC residual AND a
    CAVLC 2x2 chroma-DC residual (cbp_chroma = 1) — the first
    cbp != 0 macroblock type, carrying REAL COLOR through the
    transform path (per-4x4-chroma-block DC; chroma AC stays out of
    scope along with luma AC and CABAC)."""
    h, w = rgb.shape[:2]
    if w % 2 or h % 2:
        raise ValueError("dimensions must be even (4:2:0 chroma cropping)")
    if not 0 <= qp <= 51:
        raise ValueError("qp must be 0..51")
    padded = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_yuv420(padded)
    slice_rbsp, _, _, _ = _i16cdc_slice_rbsp(y, cb, cr, qp, idr_pic_id)
    return [
        _nal(7, _sps_rbsp(w, h)),
        _nal(8, _pps_rbsp()),
        _nal(5, slice_rbsp),
    ]


# -- P-slice motion machinery (§8.4) ----------------------------------------
class _MotionState:
    """4x4-granular motion state for MV prediction — §8.4.1.3 derives
    neighbours at 4x4 luma block granularity (6.4.11.7), which is
    what makes sub-16x16 partitions predictable: a 16x8 bottom
    partition's B neighbour is the SAME macroblock's top partition.
    Per block: mv (quarter-pel), inter flag, and decoded-availability
    (an unavailable block is outside the picture or not yet decoded
    in raster/partition order; a decoded INTRA block contributes
    mv 0 / refIdx −1 per §8.4.1.3.2)."""

    def __init__(self, mbh: int, mbw: int) -> None:
        self.mv = np.zeros((mbh * 4, mbw * 4, 2), np.int64)
        self.inter = np.zeros((mbh * 4, mbw * 4), bool)
        self.avail = np.zeros((mbh * 4, mbw * 4), bool)
        # multi-slice pictures: per-MB slice-id grid + the slice being
        # coded.  §6.4.9: a neighbour in a DIFFERENT slice is
        # unavailable for prediction — set slice_mb to enable the
        # check; None (single-slice pictures) skips it entirely.
        self.slice_mb = None
        self.cur_slice = 0

    def nbr(self, bx: int, by: int):
        if (
            bx < 0 or by < 0
            or by >= self.mv.shape[0] or bx >= self.mv.shape[1]
            or not self.avail[by, bx]
        ):
            return None
        if (
            self.slice_mb is not None
            and self.slice_mb[by >> 2, bx >> 2] != self.cur_slice
        ):
            return None
        if self.inter[by, bx]:
            return (int(self.mv[by, bx, 0]), int(self.mv[by, bx, 1]), 0)
        return (0, 0, -1)

    def set_part(self, bx0: int, by0: int, bw4: int, bh4: int,
                 mv: tuple, inter: bool = True) -> None:
        self.mv[by0 : by0 + bh4, bx0 : bx0 + bw4] = mv
        self.inter[by0 : by0 + bh4, bx0 : bx0 + bw4] = inter
        self.avail[by0 : by0 + bh4, bx0 : bx0 + bw4] = True

    def set_mb(self, mx: int, my: int, mv: tuple) -> None:
        self.set_part(mx * 4, my * 4, 4, 4, mv)

    def set_intra(self, mx: int, my: int) -> None:
        self.set_part(mx * 4, my * 4, 4, 4, (0, 0), inter=False)


def _mvp_part(ms: _MotionState, bx0: int, by0: int, bw4: int, bh4: int,
              kind: str = "16x16", part_idx: int = 0):
    """Luma MV predictor for one partition with refIdxL0 0
    (§8.4.1.3 / §8.4.1.3.1): neighbours A (left of the partition), B
    (above), C (above-right, D top-left fallback) at 4x4 granularity.
    Directional special cases first — 16x8 top takes mvB / bottom
    takes mvA, 8x16 left takes mvA / right takes mvC, each only when
    that neighbour's reference matches (refIdx 0 here) — then the
    general rules: B,C address-unavailable with A available → mvA;
    exactly one reference-matching neighbour → its mv; else the
    component-wise median."""
    a = ms.nbr(bx0 - 1, by0)
    b = ms.nbr(bx0, by0 - 1)
    c = ms.nbr(bx0 + bw4, by0 - 1)
    if c is None:
        c = ms.nbr(bx0 - 1, by0 - 1)
    if kind == "16x8":
        if part_idx == 0 and b is not None and b[2] == 0:
            return (b[0], b[1])
        if part_idx == 1 and a is not None and a[2] == 0:
            return (a[0], a[1])
    elif kind == "8x16":
        if part_idx == 0 and a is not None and a[2] == 0:
            return (a[0], a[1])
        if part_idx == 1 and c is not None and c[2] == 0:
            return (c[0], c[1])
    if b is None and c is None and a is not None:
        return (a[0], a[1])
    trip = [t if t is not None else (0, 0, -1) for t in (a, b, c)]
    matches = [t for t in trip if t[2] == 0]
    if len(matches) == 1:
        return (matches[0][0], matches[0][1])
    xs = sorted(t[0] for t in trip)
    ys = sorted(t[1] for t in trip)
    return (xs[1], ys[1])


def _mvp_16x16(ms: _MotionState, mx: int, my: int):
    """Median luma MV predictor for a whole-MB 16x16 partition."""
    return _mvp_part(ms, mx * 4, my * 4, 4, 4)


def _pskip_mv(ms: _MotionState, mx: int, my: int):
    """P_Skip luma MV (§8.4.1.1): zero when A or B is unavailable or
    when either is an inter block with refIdx 0 and zero motion;
    otherwise the 16x16 median predictor — pan pictures therefore
    skip with real NONZERO derived motion."""
    a = ms.nbr(mx * 4 - 1, my * 4)
    b = ms.nbr(mx * 4, my * 4 - 1)
    if a is None or b is None:
        return (0, 0)
    if a[2] == 0 and a[0] == 0 and a[1] == 0:
        return (0, 0)
    if b[2] == 0 and b[0] == 0 and b[1] == 0:
        return (0, 0)
    return _mvp_16x16(ms, mx, my)


def _mc_block(plane: np.ndarray, x0: int, y0: int, bw: int, bh: int,
              dx: int, dy: int) -> np.ndarray:
    """Full-pel motion-compensated block fetch with picture-edge
    extension (§8.4.2.2.1 coordinate clipping).  Interior fetches
    (the overwhelmingly common case) return a basic slice — a view,
    which every caller treats as read-only — instead of paying the
    advanced-indexing copy; only blocks that actually cross a
    picture edge take the clamped np.ix_ path."""
    hh, ww = plane.shape
    ya, xa = y0 + dy, x0 + dx
    if 0 <= ya and 0 <= xa and ya + bh <= hh and xa + bw <= ww:
        return plane[ya : ya + bh, xa : xa + bw]
    # take(mode='clip') IS the coordinate clamp (indices below 0 /
    # past the edge clip to the first/last sample) without np.ix_'s
    # open-mesh fancy indexing (round 15; values identical)
    return plane.take(np.arange(ya, ya + bh), axis=0, mode="clip") \
                .take(np.arange(xa, xa + bw), axis=1, mode="clip")


def _require_full_pel(mv: tuple) -> None:
    """Guard for the whole-frame SHIFT fixture builder, which moves
    planes by integer sample counts only: luma needs mv ≡ 0 (mod 4)
    (quarter-pel units), chroma mv ≡ 0 (mod 8).  The CODEC itself
    supports fractional vectors via the §8.4.2.2 interpolators
    (_interp_luma_block / _interp_chroma_block)."""
    if mv[0] % 8 or mv[1] % 8:
        raise NotImplementedError(
            "mc_shift_planes moves whole samples; build fractional-pan"
            " fixtures with mc_interp_planes instead"
        )


# -- fractional-pel interpolation (§8.4.2.2) ---------------------------------
_K6 = (1, -5, 20, 20, -5, 1)  # the six-tap half-pel filter


# Full-plane interpolation memo (optimization round 15).  Encoders
# test small candidate-MV pools block by block and decoders fetch one
# block per partition at the parsed MV, so the same (plane, mv)
# interpolation recurs dozens of times per picture.  Interpolation is
# position-local — each output sample depends only on its own
# edge-clamped window — so slicing one memoized full-plane
# interpolation yields exactly the samples of every per-block fetch.
# Guarded to SMALL pictures (the fixture sizes): at real frame sizes
# a full-plane pass for one 4x4 fetch would invert the trade, so big
# planes keep the direct block path.  Results are read-only views,
# the documented contract of _mc_block.  The memo holds a strong
# reference to its plane, so a recycled id() can never alias.
from collections import OrderedDict as _ODict

_INTERP_MEMO_MAX_AREA = 1 << 16
_INTERP_MEMO_MAX = 96
_INTERP_MEMO: _ODict = _ODict()


def _interp_full_plane(impl, plane: np.ndarray, mvx: int, mvy: int,
                       kind: str) -> np.ndarray:
    key = (kind, id(plane), mvx, mvy)
    hit = _INTERP_MEMO.get(key)
    if hit is not None and hit[0] is plane:
        return hit[1]
    full = impl(plane, 0, 0, plane.shape[1], plane.shape[0], mvx, mvy)
    _INTERP_MEMO[key] = (plane, full)
    if len(_INTERP_MEMO) > _INTERP_MEMO_MAX:
        _INTERP_MEMO.popitem(last=False)
    return full


def _conv6_h(w: np.ndarray) -> np.ndarray:
    """Horizontal 6-tap over a window: out[:, i] spans w[:, i..i+5]
    (the un-normalized half-pel intermediate — §8.4.2.2.1 b1/s1).
    Unrolled with in-place accumulation: integer adds commute, so the
    value is identical to the tap-by-tap sum while allocating three
    temporaries instead of eleven."""
    out = w[:, 0:-5] + w[:, 5:]
    out += 20 * (w[:, 2:-3] + w[:, 3:-2])
    out -= 5 * (w[:, 1:-4] + w[:, 4:-1])
    return out


def _conv6_v(w: np.ndarray) -> np.ndarray:
    """Vertical 6-tap over a window (h1/m1 intermediates)."""
    out = w[0:-5, :] + w[5:, :]
    out += 20 * (w[2:-3, :] + w[3:-2, :])
    out -= 5 * (w[1:-4, :] + w[4:-1, :])
    return out


def _interp_luma_block(
    plane: np.ndarray, x0: int, y0: int, bw: int, bh: int,
    mvx: int, mvy: int,
) -> np.ndarray:
    """Memoizing front of ``_interp_luma_block_impl`` — small planes
    slice from one full-plane interpolation per (plane, mv)."""
    hh, ww = plane.shape
    if hh * ww <= _INTERP_MEMO_MAX_AREA and (bh < hh or bw < ww):
        full = _interp_full_plane(
            _interp_luma_block_impl, plane, mvx, mvy, "y"
        )
        return full[y0 : y0 + bh, x0 : x0 + bw]
    return _interp_luma_block_impl(plane, x0, y0, bw, bh, mvx, mvy)


def _interp_luma_block_impl(
    plane: np.ndarray, x0: int, y0: int, bw: int, bh: int,
    mvx: int, mvy: int,
) -> np.ndarray:
    """QUARTER-PEL luma MC block fetch (§8.4.2.2.1, Table 8-12) with
    picture-edge extension: half-pel samples b/h by the (1,−5,20,20,
    −5,1)/32 six-tap, the center j by the two-stage 6-tap over
    UN-normalized intermediates ((j1+512)>>10), and the twelve
    quarter positions as (+1)>>1 averages of their Table 8-12
    neighbour pair.  Edge clamping happens on the integer-sample
    window indices, which is exactly the spec's per-tap coordinate
    clip (each window row/column IS one individually clamped
    integer coordinate).  mv is in quarter-pel units."""
    xi, yi = mvx >> 2, mvy >> 2
    xf, yf = mvx & 3, mvy & 3
    if xf == 0 and yf == 0:
        return _mc_block(plane, x0, y0, bw, bh, xi, yi)
    hh, ww = plane.shape
    ya, xa = y0 + yi - 2, x0 + xi - 2
    if 0 <= ya and 0 <= xa and ya + bh + 6 <= hh and xa + bw + 6 <= ww:
        # interior window: basic slice instead of the clamped-index
        # advanced-indexing copy (identical samples — no coordinate
        # ever clips when the whole window is inside the picture)
        w = plane[ya : ya + bh + 6, xa : xa + bw + 6].astype(np.int64)
    else:
        w = plane.take(
            np.arange(ya, ya + bh + 6), axis=0, mode="clip"
        ).take(
            np.arange(xa, xa + bw + 6), axis=1, mode="clip"
        ).astype(np.int64)  # (bh+6, bw+6), edge-clamped
    # Compute ONLY the intermediates this sub-position reads (the
    # original built G, b, h, j and all fifteen Table 8-12 outputs
    # per call; a 4x4 block fetch is pure numpy call overhead, so
    # the dead arithmetic dominated encode+decode).  Values are
    # bit-identical: each branch is the same integer expression the
    # full table computed.
    #   b (horizontal half-pel) feeds xf∈{1,2,3} rows yf∈{0,1} and
    #     the ss row of yf=3;   h (vertical) feeds yf∈{1,2,3} except
    #     the xf=2 column;      j (center) feeds the xf=2/yf=2 cross.
    if yf == 0:
        # a/b/c: horizontal-only — b over the block rows alone
        b = _uclip(
            (_conv6_h(w[2 : 2 + bh, :]) + 16) >> 5, 0, 255
        )
        bb = b[:, :bw]
        if xf == 2:
            return bb
        G = w[2 : 2 + bh, 2 : 2 + bw + 1]
        if xf == 1:
            return (G[:, :bw] + bb + 1) >> 1          # a
        return (G[:, 1 : bw + 1] + bb + 1) >> 1       # c
    if xf == 0:
        # d/h/n: vertical-only — h over the block columns alone
        h = _uclip(
            (_conv6_v(w[:, 2 : 2 + bw]) + 16) >> 5, 0, 255
        )
        hc = h[:bh, :]
        if yf == 2:
            return hc
        G = w[2 : 2 + bh + 1, 2 : 2 + bw]
        if yf == 1:
            return (G[:bh, :] + hc + 1) >> 1          # d
        return (G[1 : bh + 1, :] + hc + 1) >> 1       # n
    need_j = xf == 2 or yf == 2
    if need_j:
        b1 = _conv6_h(w)                              # (bh+6, bw+1)
        j = _uclip((_conv6_v(b1) + 512) >> 10, 0, 255)
        jj = j[:bh, :bw]
        if xf == 2 and yf == 2:
            return jj
        if yf == 2:                                   # i / k
            h = _uclip(
                (_conv6_v(w[:, 2 : 2 + bw + 1]) + 16) >> 5, 0, 255
            )[:bh, :]
            if xf == 1:
                return (h[:, :bw] + jj + 1) >> 1      # i
            return (jj + h[:, 1 : bw + 1] + 1) >> 1   # k
        # xf == 2, yf ∈ {1, 3}: f / q need b rows 0..bh of the block
        b = _uclip((b1[2 : 2 + bh + 1, :bw] + 16) >> 5, 0, 255)
        if yf == 1:
            return (b[:bh, :] + jj + 1) >> 1          # f
        return (jj + b[1 : bh + 1, :] + 1) >> 1       # q
    # diagonal quarter positions e/g/p/r: b and h, no j
    b = _uclip(
        (_conv6_h(w[2 : 2 + bh + 1, :]) + 16) >> 5, 0, 255
    )[:, :bw]
    h = _uclip(
        (_conv6_v(w[:, 2 : 2 + bw + 1]) + 16) >> 5, 0, 255
    )[:bh, :]
    bb, ss = b[:bh, :], b[1 : bh + 1, :]
    hc, mm = h[:, :bw], h[:, 1 : bw + 1]
    if yf == 1:
        if xf == 1:
            return (bb + hc + 1) >> 1                 # e
        return (bb + mm + 1) >> 1                     # g
    if xf == 1:
        return (hc + ss + 1) >> 1                     # p
    return (mm + ss + 1) >> 1                         # r


def _interp_chroma_block(
    plane: np.ndarray, x0: int, y0: int, bw: int, bh: int,
    mvx: int, mvy: int,
) -> np.ndarray:
    """Memoizing front of ``_interp_chroma_block_impl`` — small
    planes slice from one full-plane interpolation per (plane, mv)."""
    hh, ww = plane.shape
    if hh * ww <= _INTERP_MEMO_MAX_AREA and (bh < hh or bw < ww):
        full = _interp_full_plane(
            _interp_chroma_block_impl, plane, mvx, mvy, "c"
        )
        return full[y0 : y0 + bh, x0 : x0 + bw]
    return _interp_chroma_block_impl(plane, x0, y0, bw, bh, mvx, mvy)


def _interp_chroma_block_impl(
    plane: np.ndarray, x0: int, y0: int, bw: int, bh: int,
    mvx: int, mvy: int,
) -> np.ndarray:
    """EIGHTH-PEL chroma MC block fetch (§8.4.2.2.2): bilinear over
    the four surrounding integer samples with weights (8−dx)(8−dy) /
    dx(8−dy) / (8−dx)dy / dx·dy and (+32)>>6 normalization; edge
    extension by coordinate clamp.  mv is in quarter-pel LUMA units,
    which read as eighth-pel at half-resolution chroma."""
    xi, yi = mvx >> 3, mvy >> 3
    xf, yf = mvx & 7, mvy & 7
    if xf == 0 and yf == 0:
        return _mc_block(plane, x0, y0, bw, bh, xi, yi)
    hh, ww = plane.shape
    ya, xa = y0 + yi, x0 + xi
    if 0 <= ya and 0 <= xa and ya + bh + 1 <= hh and xa + bw + 1 <= ww:
        # interior window: basic slice (see _interp_luma_block)
        w = plane[ya : ya + bh + 1, xa : xa + bw + 1].astype(np.int64)
    else:
        w = plane.take(
            np.arange(ya, ya + bh + 1), axis=0, mode="clip"
        ).take(
            np.arange(xa, xa + bw + 1), axis=1, mode="clip"
        ).astype(np.int64)
    A, B = w[:bh, :bw], w[:bh, 1 : bw + 1]
    # one-axis motion degenerates the bilinear to two terms: with
    # yf = 0 the full expression is (8·(8−xf)·A + 8·xf·B + 32) >> 6,
    # whose common factor 8 cancels exactly against the rounding
    # ((8k+32) >> 6 ≡ (k+4) >> 3 for k >= 0) — identical value,
    # fewer tiny-array numpy ops (round 15)
    if yf == 0:
        return ((8 - xf) * A + xf * B + 4) >> 3
    C = w[1 : bh + 1, :bw]
    if xf == 0:
        return ((8 - yf) * A + yf * C + 4) >> 3
    D = w[1 : bh + 1, 1 : bw + 1]
    return (
        (8 - xf) * (8 - yf) * A
        + xf * (8 - yf) * B
        + (8 - xf) * yf * C
        + xf * yf * D
        + 32
    ) >> 6


def _mc_mb_planes(ry, rcb, rcr, mx: int, my: int, mv: tuple):
    """One macroblock's MC prediction (luma 16x16 + chroma 8x8 pair)
    at an arbitrary quarter-pel vector — full-pel vectors reduce to
    the plain clamped fetch."""
    return (
        _interp_luma_block(ry, mx * 16, my * 16, 16, 16, mv[0], mv[1]),
        _interp_chroma_block(rcb, mx * 8, my * 8, 8, 8, mv[0], mv[1]),
        _interp_chroma_block(rcr, mx * 8, my * 8, 8, 8, mv[0], mv[1]),
    )


def mc_interp_planes(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     mv: tuple) -> tuple:
    """Whole-frame QUARTER-PEL MC (§8.4.2.2) with edge extension —
    exactly what a picture of P_16x16/P_Skip macroblocks carrying a
    fractional ``mv`` reconstructs; the closed-loop fixture builder
    for fractional-pan GOPs (generalizes mc_shift_planes, to which it
    reduces when mv ≡ 0 mod 8 in both components)."""
    return (
        _interp_luma_block(
            y, 0, 0, y.shape[1], y.shape[0], mv[0], mv[1]
        ).astype(np.uint8),
        _interp_chroma_block(
            cb, 0, 0, cb.shape[1], cb.shape[0], mv[0], mv[1]
        ).astype(np.uint8),
        _interp_chroma_block(
            cr, 0, 0, cr.shape[1], cr.shape[0], mv[0], mv[1]
        ).astype(np.uint8),
    )


def mc_shift_planes(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                    mv: tuple) -> tuple:
    """Whole-frame full-pel MC shift with edge extension — exactly
    what a picture of P_16x16/P_Skip macroblocks carrying ``mv``
    reconstructs; the closed-loop fixture builder for P GOPs."""
    _require_full_pel(mv)
    dx, dy = mv[0] // 4, mv[1] // 4
    return (
        _mc_block(y, 0, 0, y.shape[1], y.shape[0], dx, dy),
        _mc_block(cb, 0, 0, cb.shape[1], cb.shape[0], mv[0] // 8,
                  mv[1] // 8),
        _mc_block(cr, 0, 0, cr.shape[1], cr.shape[0], mv[0] // 8,
                  mv[1] // 8),
    )


def _wp_plane(pred: np.ndarray, w: int, o: int, logwd: int) -> np.ndarray:
    """Explicit weighted prediction for one plane, single-list form
    (§8.4.2.3.2, eq. 8-270/8-271): scale the motion-compensated
    prediction by ``w`` with rounding at ``logwd`` bits, add offset
    ``o``, and Clip1 to the 8-bit sample range.  Applied identically
    by the encoder's mode search and the decoder's reconstruction, so
    the fade GOP loop stays closed bit-for-bit."""
    p = pred.astype(np.int64)
    if logwd >= 1:
        v = ((p * w + (1 << (logwd - 1))) >> logwd) + o
    else:
        v = p * w + o
    return _uclip(v, 0, 255).astype(np.uint8)


def _wp_planes(planes: tuple, wp: tuple | None) -> tuple:
    """Apply explicit weighted prediction to a (y, cb, cr) prediction
    triple; ``wp`` is (luma_log2_denom, wY, oY, chroma_log2_denom,
    wCb, oCb, wCr, oCr) from the §7.3.3.2 pred_weight_table, or None
    for unweighted slices (identity)."""
    if wp is None:
        return planes
    ld, wy, oy, cd, wcb, ocb, wcr, ocr = wp
    return (
        _wp_plane(planes[0], wy, oy, ld),
        _wp_plane(planes[1], wcb, ocb, cd),
        _wp_plane(planes[2], wcr, ocr, cd),
    )


def _wpb_single(planes: tuple, wpb: tuple | None, lst: int) -> tuple:
    """Explicit weighted bi-prediction, ONE-list case (§8.4.2.3.2:
    when only predFlagL0 or predFlagL1 is set, the single-list
    eq. 8-270/8-271 applies with that list's weights and the shared
    denominators).  ``wpb`` is (luma_log2_denom, chroma_log2_denom,
    (wY,oY,wCb,oCb,wCr,oCr) for L0, same for L1), or None (identity,
    weighted_bipred_idc 0)."""
    if wpb is None:
        return planes
    ld, cd, l0, l1 = wpb
    wy, oy, wcb, ocb, wcr, ocr = l0 if lst == 0 else l1
    return (
        _wp_plane(planes[0], wy, oy, ld),
        _wp_plane(planes[1], wcb, ocb, cd),
        _wp_plane(planes[2], wcr, ocr, cd),
    )


def _wpb_bi_plane(
    p0: np.ndarray, p1: np.ndarray,
    w0: int, w1: int, o0: int, o1: int, logwd: int,
) -> np.ndarray:
    """Explicit weighted bi-prediction, BOTH-lists case (§8.4.2.3.2
    eq. 8-272): ((p0·w0 + p1·w1 + 2^logWD) >> (logWD+1)) +
    ((o0 + o1 + 1) >> 1), Clip1'd."""
    v = (
        (p0.astype(np.int64) * w0 + p1.astype(np.int64) * w1
         + (1 << logwd)) >> (logwd + 1)
    ) + ((o0 + o1 + 1) >> 1)
    return _uclip(v, 0, 255).astype(np.uint8)


def _wpb_bi(p0: tuple, p1: tuple, wpb: tuple | None) -> tuple:
    """Bi-prediction of two (y, cb, cr) MC triples: the §8.4.2.3.2
    rounded mean when ``wpb`` is None (weighted_bipred_idc 0), the
    explicit eq. 8-272 weighting otherwise."""
    if wpb is None:
        return tuple(
            ((a.astype(np.int64) + b.astype(np.int64) + 1) >> 1).astype(
                np.uint8
            )
            for a, b in zip(p0, p1)
        )
    ld, cd, (wy0, oy0, wcb0, ocb0, wcr0, ocr0), \
        (wy1, oy1, wcb1, ocb1, wcr1, ocr1) = wpb
    return (
        _wpb_bi_plane(p0[0], p1[0], wy0, wy1, oy0, oy1, ld),
        _wpb_bi_plane(p0[1], p1[1], wcb0, wcb1, ocb0, ocb1, cd),
        _wpb_bi_plane(p0[2], p1[2], wcr0, wcr1, ocr0, ocr1, cd),
    )


def _implicit_bi_weights(curr_poc: int, poc0: int, poc1: int) -> tuple:
    """Implicit weighted bi-prediction weights (§8.4.2.3.1,
    weighted_bipred_idc 2): POC-distance derived (w0, w1) with
    logWD = 5 and zero offsets — tb/td clipped to ±128, the
    DistScaleFactor ladder, and every degenerate case (equal POCs,
    td = 0, scale factor outside [-64, 128]) falling back to the
    equal 32/32 split, which reproduces the default rounded mean
    bit-for-bit."""
    if poc1 == poc0:
        return (32, 32)
    tb = min(127, max(-128, curr_poc - poc0))
    td = min(127, max(-128, poc1 - poc0))
    if td == 0:
        return (32, 32)
    # spec "/" truncates toward zero; td here is a clipped nonzero int
    tx = (16384 + abs(td) // 2) // td if td > 0 else -(
        (16384 + abs(td) // 2) // -td
    )
    dsf = min(1023, max(-1024, (tb * tx + 32) >> 6))
    w1 = dsf >> 2
    if w1 < -64 or w1 > 128:
        return (32, 32)
    return (64 - w1, w1)


def _spatial_direct(ms0, ms1, mx: int, my: int, col):
    """Spatial direct motion derivation for one B macroblock
    (§8.4.1.2.2, direct_spatial_mv_pred_flag 1, all refIdx in
    {0, −1}):

    - per list, refIdxLX = MinPositive over neighbours A/B/C (C
      falling back to D), i.e. 0 iff ANY neighbour predicts from
      that list;
    - both lists empty → directZeroPredictionFlag: bi-predict both
      lists at refIdx 0 / mv 0;
    - otherwise each used list takes its §8.4.1.3 16x16 median, and
      per 8x8 sub-block (direct_8x8_inference_flag 1: the colocated
      CORNER 4x4 of the macroblock) the colZeroFlag — colocated
      block in RefPicList1[0] is inter with refIdx 0 and |mv| ≤ 1
      quarter-pel in both components — zeroes that block's mv.

    ``col`` is (mv_grid, inter_grid) of the colocated reference (or
    None, treated as intra everywhere).  Returns (use0, use1,
    blocks) with blocks = four per-8x8 (mv0, mv1) pairs in raster
    order."""
    def _ref_used(ms) -> bool:
        a = ms.nbr(mx * 4 - 1, my * 4)
        b = ms.nbr(mx * 4, my * 4 - 1)
        c = ms.nbr(mx * 4 + 4, my * 4 - 1)
        if c is None:
            c = ms.nbr(mx * 4 - 1, my * 4 - 1)
        return any(t is not None and t[2] == 0 for t in (a, b, c))

    use0, use1 = _ref_used(ms0), _ref_used(ms1)
    if not use0 and not use1:
        # directZeroPredictionFlag: both lists, zero motion
        return True, True, [((0, 0), (0, 0))] * 4
    mv0 = _mvp_16x16(ms0, mx, my) if use0 else None
    mv1 = _mvp_16x16(ms1, mx, my) if use1 else None
    blocks = []
    for sy in (0, 1):
        for sx in (0, 1):
            cz = False
            if col is not None:
                cy, cx = my * 4 + 3 * sy, mx * 4 + 3 * sx
                col_mv, col_inter = col
                cz = (
                    bool(col_inter[cy, cx])
                    and abs(int(col_mv[cy, cx, 0])) <= 1
                    and abs(int(col_mv[cy, cx, 1])) <= 1
                )
            blocks.append((
                (0, 0) if (use0 and cz) else mv0,
                (0, 0) if (use1 and cz) else mv1,
            ))
    return use0, use1, blocks


def _direct_part_pred(
    ref0: tuple, ref1: tuple, mx: int, my: int, bi_idx: int,
    use0: bool, use1: bool, blocks: list,
    wpb: tuple | None = None, wbi: tuple | None = None,
) -> tuple:
    """One 8x8 sub-block's direct prediction (raster sub-block
    ``bi_idx``): MC from each used list at the derived (possibly
    colZero'd) vector, combined by one-list copy / rounded mean /
    explicit eq. 8-272 (``wpb``) / implicit POC weights (``wbi``).
    Shared by whole-MB B_Skip/B_Direct_16x16 reconstruction AND
    (round 12) B_Direct_8x8 sub-macroblocks inside B_8x8."""
    bmv0, bmv1 = blocks[bi_idx]
    sx, sy = bi_idx % 2, bi_idx // 2
    lx, ly = mx * 16 + sx * 8, my * 16 + sy * 8
    cx, cy = mx * 8 + sx * 4, my * 8 + sy * 4
    p0 = p1 = None
    if use0:
        p0 = (
            _interp_luma_block(ref0[0], lx, ly, 8, 8, *bmv0),
            _interp_chroma_block(ref0[1], cx, cy, 4, 4, *bmv0),
            _interp_chroma_block(ref0[2], cx, cy, 4, 4, *bmv0),
        )
    if use1:
        p1 = (
            _interp_luma_block(ref1[0], lx, ly, 8, 8, *bmv1),
            _interp_chroma_block(ref1[1], cx, cy, 4, 4, *bmv1),
            _interp_chroma_block(ref1[2], cx, cy, 4, 4, *bmv1),
        )
    if use0 and use1:
        if wbi is not None:
            return tuple(
                _wpb_bi_plane(a, b, wbi[0], wbi[1], 0, 0, 5)
                for a, b in zip(p0, p1)
            )
        return _wpb_bi(p0, p1, wpb)
    if use0:
        return _wpb_single(p0, wpb, 0)
    return _wpb_single(p1, wpb, 1)


def _direct_mb_pred(
    ref0: tuple, ref1: tuple, mx: int, my: int,
    use0: bool, use1: bool, blocks: list,
    wpb: tuple | None = None, wbi: tuple | None = None,
) -> tuple:
    """Reconstruct one spatial-direct B macroblock from its
    _spatial_direct derivation — the four _direct_part_pred blocks
    assembled; shared verbatim by the encoder's lossless-mode check
    and the decoder's reconstruction."""
    y_out = np.empty((16, 16), np.uint8)
    cb_out = np.empty((8, 8), np.uint8)
    cr_out = np.empty((8, 8), np.uint8)
    for bi_idx in range(len(blocks)):
        sx, sy = bi_idx % 2, bi_idx // 2
        blk = _direct_part_pred(
            ref0, ref1, mx, my, bi_idx, use0, use1, blocks,
            wpb=wpb, wbi=wbi,
        )
        y_out[sy * 8 : sy * 8 + 8, sx * 8 : sx * 8 + 8] = blk[0]
        cb_out[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] = blk[1]
        cr_out[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] = blk[2]
    return y_out, cb_out, cr_out


def _direct_update_ms(ms0, ms1, mx: int, my: int,
                      use0: bool, use1: bool, blocks: list) -> None:
    """Feed a direct macroblock's derived per-8x8 motion back into
    the two list motion states (an unused list contributes
    refIdx −1, like intra) — later §8.4.1.3 derivations see it."""
    for bi_idx, (bmv0, bmv1) in enumerate(blocks):
        sx, sy = bi_idx % 2, bi_idx // 2
        bx0, by0 = mx * 4 + sx * 2, my * 4 + sy * 2
        if use0:
            ms0.set_part(bx0, by0, 2, 2, bmv0)
        else:
            ms0.set_part(bx0, by0, 2, 2, (0, 0), inter=False)
        if use1:
            ms1.set_part(bx0, by0, 2, 2, bmv1)
        else:
            ms1.set_part(bx0, by0, 2, 2, (0, 0), inter=False)


def _temporal_direct(mx: int, my: int, col, curr_poc: int,
                     poc0: int, poc1: int):
    """Temporal direct motion derivation for one B macroblock
    (§8.4.1.2.3, direct_spatial_mv_pred_flag 0): per 8x8 sub-block
    (direct_8x8_inference — the colocated CORNER 4x4 of the MB in
    RefPicList1[0]), scale the colocated vector by POC distance:
    mvL0 = (DistScaleFactor·mvCol + 128) >> 8, mvL1 = mvL0 − mvCol,
    with the same tb/td/tx ladder as implicit weighting; an INTRA
    colocated block contributes mvCol = 0 (both derived vectors 0).
    Both lists always predict (refIdx 0 each).  ``col`` is
    (mv_grid, inter_grid) of the colocated reference.  Returns the
    four per-8x8 (mv0, mv1) pairs in raster order."""
    tb = min(127, max(-128, curr_poc - poc0))
    td = min(127, max(-128, poc1 - poc0))
    if td == 0:
        # Unreachable here: temporal direct requires a past L0 and a
        # future L1 reference (poc0 < curr_poc < poc1 ⇒ td ≥ 2).  The
        # spec's long-term-reference fallback (§8.4.1.2.3, mvL0 =
        # mvCol) is a feature this decoder does not implement, so
        # fail loudly rather than guess a scale.
        raise NotImplementedError(
            "temporal direct with equal L0/L1 POCs (long-term "
            "reference path) is not supported"
        )
    tx = (16384 + abs(td) // 2) // td if td > 0 else -(
        (16384 + abs(td) // 2) // -td
    )
    dsf = min(1023, max(-1024, (tb * tx + 32) >> 6))
    blocks = []
    for sy in (0, 1):
        for sx in (0, 1):
            mvc = (0, 0)
            if col is not None:
                cy, cx = my * 4 + 3 * sy, mx * 4 + 3 * sx
                col_mv, col_inter = col
                if col_inter[cy, cx]:
                    mvc = (int(col_mv[cy, cx, 0]),
                           int(col_mv[cy, cx, 1]))
            mv0 = ((dsf * mvc[0] + 128) >> 8,
                   (dsf * mvc[1] + 128) >> 8)
            mv1 = (mv0[0] - mvc[0], mv0[1] - mvc[1])
            blocks.append((mv0, mv1))
    return blocks


#: partition geometry per kind: (luma (x_off, y_off, w, h),
#: chroma (x_off, y_off, w, h)) for each of the two partitions
_PART_GEOM = {
    "16x8": (((0, 0, 16, 8), (0, 0, 8, 4)), ((0, 8, 16, 8), (0, 4, 8, 4))),
    "8x16": (((0, 0, 8, 16), (0, 0, 4, 8)), ((8, 0, 8, 16), (4, 0, 4, 8))),
}

#: P_8x8 sub-macroblock geometry: four 8x8 luma partitions in raster
#: mbPartIdx order (§6.4.2.1), each with its 4x4 chroma block
_PART_GEOM8 = (
    ((0, 0, 8, 8), (0, 0, 4, 4)),
    ((8, 0, 8, 8), (4, 0, 4, 4)),
    ((0, 8, 8, 8), (0, 4, 4, 4)),
    ((8, 8, 8, 8), (4, 4, 4, 4)),
)

#: Table 7-17 P sub-macroblock splits, sub-partitions in §6.4.2.2
#: scan order as 4x4-block-unit (x_off, y_off, w, h) within the 8x8:
#: 0 = P_L0_8x8, 1 = P_L0_8x4, 2 = P_L0_4x8, 3 = P_L0_4x4
_SUB_GEOM = {
    0: ((0, 0, 2, 2),),
    1: ((0, 0, 2, 1), (0, 1, 2, 1)),
    2: ((0, 0, 1, 2), (1, 0, 1, 2)),
    3: ((0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1)),
}

#: Table 7-18 sub-8x8 B splits (round 12): sub_mb_type →
#: (_SUB_GEOM kind, list usage 0=L0 / 1=L1 / 2=Bi).  Rows 0-3 (the
#: one-partition 8x8 forms incl. B_Direct_8x8) are handled inline.
_B_SUB_SPLIT = {
    4: (1, 0), 5: (2, 0),    # B_L0_8x4 / B_L0_4x8
    6: (1, 1), 7: (2, 1),    # B_L1_8x4 / B_L1_4x8
    8: (1, 2), 9: (2, 2),    # B_Bi_8x4 / B_Bi_4x8
    10: (3, 0), 11: (3, 1), 12: (3, 2),  # the 4x4 rows
}


def _b_subpart_geoms(part: int, kind: int) -> list:
    """The ((luma), (chroma)) MB-relative geometries of one B
    sub-macroblock's sub-partitions: _PART_GEOM8[part]'s 8x8 region
    split by _SUB_GEOM[kind] (4x4-granular offsets)."""
    (plx, ply, _w, _h), _c = _PART_GEOM8[part]
    out = []
    for dx4, dy4, w4, h4 in _SUB_GEOM[kind]:
        lx, ly = plx + dx4 * 4, ply + dy4 * 4
        out.append((
            (lx, ly, w4 * 4, h4 * 4),
            (lx // 2, ly // 2, w4 * 2, h4 * 2),
        ))
    return out


def _p_slice_rbsp(
    src: tuple, ref: tuple, frame_num: int, mv_candidates: list,
    mv_pair_candidates: list | None = None,
    mv_quad_candidates: list | None = None,
    mv_sub_candidates: list | None = None,
    poc_lsb: int | None = None,
    wp: tuple | None = None,
    first_mb: int = 0,
    n_mbs: int | None = None,
    ms: "_MotionState | None" = None,
) -> tuple[bytes, dict]:
    """One P slice covering the whole picture — or, for MULTI-SLICE
    pictures, the ``n_mbs`` macroblocks starting at raster address
    ``first_mb`` (the caller shares one slice-aware ``ms`` across the
    picture's slices and advances ``ms.cur_slice`` per slice, so
    §6.4.9 cross-slice neighbour unavailability shapes skip/MV
    derivation identically to the decoder).  Per macroblock, in
    raster order, the encoder takes the first LOSSLESS mode:

    1. P_Skip — when MC at the §8.4.1.1 derived skip MV reproduces
       the source MB exactly (run-length coded via ``mb_skip_run``),
    2. P_L0_16x16 with cbp 0 — the first candidate MV whose MC copy
       matches exactly (mvd coded against the §8.4.1.3 median
       predictor),
    3. P_L0_L0_16x8 / P_L0_L0_8x16 with cbp 0 (Table 7-13 mb_type
       1/2) — the first (kind, mv0, mv1) pair from
       ``mv_pair_candidates`` whose two per-partition MC copies both
       match; each partition's mvd is coded against the §8.4.1.3.1
       DIRECTIONAL predictor (16x8: top takes mvB, bottom mvA; 8x16:
       left mvA, right mvC), with partition 0's reconstructed mv
       visible to partition 1's derivation,
    4. P_8x8 with four P_L0_8x8 sub-macroblocks and cbp 0 (mb_type 3,
       sub_mb_type 0 ×4, Table 7-17) — the first (mv0..mv3) quad from
       ``mv_quad_candidates`` whose four 8x8 MC copies all match;
       each sub-partition's mvd codes against the general §8.4.1.3
       median over the partition's 4x4-granular neighbours, earlier
       sub-partitions feeding later derivations,
    5. I_PCM (mb_type 30 = 25 + 5, Table 7-13) — the intra fallback
       for genuinely changed content (conditional replenishment).

    Every mode is exact, so the reconstruction IS the source — the
    closed loop that lets the oracle pin the decode bit-for-bit.
    ``src``/``ref`` are PADDED uint8 (y, cb, cr) planes; vectors are
    quarter-pel and may be fractional (§8.4.2.2 interpolation).

    ``wp`` — explicit weighted prediction (§8.4.2.3): when given as
    (luma_log2_denom, wY, oY, chroma_log2_denom, wCb, oCb, wCr, oCr),
    the slice header carries the §7.3.3.2 pred_weight_table (the PPS
    must assert weighted_pred_flag) and EVERY inter prediction —
    including P_Skip — is scaled through eq. 8-270/8-271 before the
    lossless-mode comparison, so fade content matches inter modes
    exactly instead of falling back to I_PCM."""
    y, cb, cr = (p.astype(np.uint8) for p in src)
    ry, rcb, rcr = ref
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16
    bw = _EgWriter()
    bw.ue(first_mb)     # first_mb_in_slice
    bw.ue(5)            # slice_type: P (all slices in pic)
    bw.ue(0)            # pic_parameter_set_id
    bw.u(frame_num % 16, 4)  # frame_num (log2_max_frame_num = 4)
    if poc_lsb is not None:
        bw.u(poc_lsb % 256, 8)  # pic_order_cnt_lsb (poc_type 0)
    bw.u(0, 1)          # num_ref_idx_active_override_flag
    bw.u(0, 1)          # ref_pic_list_modification_flag_l0 (§7.3.3.1)
    if wp is not None:
        # pred_weight_table (§7.3.3.2), one L0 reference: explicit
        # luma AND chroma weights — present exactly when the PPS
        # asserts weighted_pred_flag for a P slice
        ld, wy, oy, cd, wcb, ocb, wcr, ocr = wp
        bw.ue(ld)       # luma_log2_weight_denom
        bw.ue(cd)       # chroma_log2_weight_denom
        if (wy, oy) == (1 << ld, 0):
            bw.u(0, 1)  # luma_weight_l0_flag: identity → defaults
        else:
            bw.u(1, 1)  # luma_weight_l0_flag
            bw.se(wy)   # luma_weight_l0[0]
            bw.se(oy)   # luma_offset_l0[0]
        if (wcb, ocb, wcr, ocr) == (1 << cd, 0, 1 << cd, 0):
            bw.u(0, 1)  # chroma_weight_l0_flag: identity → defaults
        else:
            bw.u(1, 1)  # chroma_weight_l0_flag
            bw.se(wcb)  # chroma_weight_l0[0][Cb]
            bw.se(ocb)  # chroma_offset_l0[0][Cb]
            bw.se(wcr)  # chroma_weight_l0[0][Cr]
            bw.se(ocr)  # chroma_offset_l0[0][Cr]
    bw.u(0, 1)          # adaptive_ref_pic_marking_mode_flag (7.3.3.3)
    bw.se(0)            # slice_qp_delta
    bw.ue(1)            # disable_deblocking_filter_idc: filter OFF
    if ms is None:
        ms = _MotionState(mbh, mbw)
    stats = _stats_zero(is_p=True)
    skip_run = 0

    def _src_mb(mx: int, my: int):
        return (
            y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
        )

    # Per-MV full-plane prediction memo (optimization round 15): the
    # candidate pools are small and the matcher re-fetched tiny
    # blocks per (candidate, partition).  Interpolation is
    # position-local — every output sample depends only on its own
    # edge-clamped window, so ONE full-plane interpolation per
    # distinct vector yields exactly the samples every per-block
    # fetch produced (same absolute coordinates, same clamps), and
    # the per-candidate test reduces to slice compares.  Weighted
    # prediction is per-sample, so it memoizes with the plane.
    _mv_planes: dict = {}

    def _planes_for(mv: tuple):
        r = _mv_planes.get(mv)
        if r is None:
            py_f = _interp_luma_block(
                ry, 0, 0, ry.shape[1], ry.shape[0], mv[0], mv[1]
            )
            pcb_f = _interp_chroma_block(
                rcb, 0, 0, rcb.shape[1], rcb.shape[0], mv[0], mv[1]
            )
            pcr_f = _interp_chroma_block(
                rcr, 0, 0, rcr.shape[1], rcr.shape[0], mv[0], mv[1]
            )
            if wp is not None:
                py_f = _wp_plane(py_f, wp[1], wp[2], wp[0])
                pcb_f = _wp_plane(pcb_f, wp[4], wp[5], wp[3])
                pcr_f = _wp_plane(pcr_f, wp[6], wp[7], wp[3])
            r = (py_f, pcb_f, pcr_f)
            _mv_planes[mv] = r
        return r

    def _part_matches(mx: int, my: int, geom: tuple, mv: tuple) -> bool:
        (lx, ly, lw, lh), (cx, cy, cw, ch) = geom
        py_f, pcb_f, pcr_f = _planes_for(mv)
        ly0, lx0 = my * 16 + ly, mx * 16 + lx
        if not np.array_equal(
            py_f[ly0 : ly0 + lh, lx0 : lx0 + lw],
            y[ly0 : ly0 + lh, lx0 : lx0 + lw],
        ):
            return False
        cy_, cx_ = my * 8 + cy, mx * 8 + cx
        return np.array_equal(
            pcb_f[cy_ : cy_ + ch, cx_ : cx_ + cw],
            cb[cy_ : cy_ + ch, cx_ : cx_ + cw],
        ) and np.array_equal(
            pcr_f[cy_ : cy_ + ch, cx_ : cx_ + cw],
            cr[cy_ : cy_ + ch, cx_ : cx_ + cw],
        )

    # full-MB geometry for the lazy per-plane matcher: luma first,
    # chroma only when luma already matches (optimization round 15 —
    # the eager _mc_mb test interpolated BOTH chroma planes for every
    # failing candidate; ~2/3 of all interp calls were dead work.
    # Decisions are identical: same planes, same weighting, same
    # array_equal, just short-circuited)
    geom_full = ((0, 0, 16, 16), (0, 0, 8, 8))
    last_mb = first_mb + (n_mbs if n_mbs is not None else mbh * mbw - first_mb)
    for idx in range(first_mb, last_mb):
        my, mx = divmod(idx, mbw)
        if ms.slice_mb is not None:
            ms.slice_mb[my, mx] = ms.cur_slice
        s = _src_mb(mx, my)
        smv = _pskip_mv(ms, mx, my)
        if _part_matches(mx, my, geom_full, smv):
            skip_run += 1
            ms.set_mb(mx, my, smv)
            stats["skip"] += 1
            continue
        hit = None
        for mv in mv_candidates:
            if _part_matches(mx, my, geom_full, mv):
                hit = mv
                break
        pair_hit = None
        if hit is None:
            for kind, mv0, mv1 in (mv_pair_candidates or ()):
                if _part_matches(
                    mx, my, _PART_GEOM[kind][0], mv0
                ) and _part_matches(mx, my, _PART_GEOM[kind][1], mv1):
                    pair_hit = (kind, mv0, mv1)
                    break
        quad_hit = None
        if hit is None and pair_hit is None:
            for quad in (mv_quad_candidates or ()):
                if all(
                    _part_matches(mx, my, _PART_GEOM8[i], quad[i])
                    for i in range(4)
                ):
                    quad_hit = quad
                    break
        sub_hit = None
        if hit is None and pair_hit is None and quad_hit is None:
            for sub_kind, mvs in (mv_sub_candidates or ()):
                geoms = _SUB_GEOM[sub_kind]
                i, ok = 0, True
                for part in range(4):
                    (plx, ply, _w, _h), _c = _PART_GEOM8[part]
                    for dx4, dy4, w4, h4 in geoms:
                        geom = (
                            (plx + dx4 * 4, ply + dy4 * 4,
                             w4 * 4, h4 * 4),
                            ((plx + dx4 * 4) // 2, (ply + dy4 * 4) // 2,
                             w4 * 2, h4 * 2),
                        )
                        if not _part_matches(mx, my, geom, mvs[i]):
                            ok = False
                            break
                        i += 1
                    if not ok:
                        break
                if ok:
                    sub_hit = (sub_kind, mvs)
                    break
        bw.ue(skip_run)  # mb_skip_run before every coded MB
        skip_run = 0
        if hit is not None:
            mvp = _mvp_16x16(ms, mx, my)
            bw.ue(0)                 # mb_type P_L0_16x16
            bw.se(hit[0] - mvp[0])   # mvd_l0 x
            bw.se(hit[1] - mvp[1])   # mvd_l0 y
            bw.ue(0)                 # coded_block_pattern: Inter cbp 0
            ms.set_mb(mx, my, hit)
            stats["p16"] += 1
            continue
        if pair_hit is not None:
            kind, mv0, mv1 = pair_hit
            bw.ue(1 if kind == "16x8" else 2)  # mb_type (Table 7-13)
            for part, mv in ((0, mv0), (1, mv1)):
                (lx, ly, lw, lh), _c = _PART_GEOM[kind][part]
                bx0, by0 = mx * 4 + lx // 4, my * 4 + ly // 4
                mvp = _mvp_part(ms, bx0, by0, lw // 4, lh // 4,
                                kind, part)
                bw.se(mv[0] - mvp[0])
                bw.se(mv[1] - mvp[1])
                # partition 0's mv is visible to partition 1's
                # §8.4.1.3.1 derivation, exactly like the decoder
                ms.set_part(bx0, by0, lw // 4, lh // 4, mv)
            bw.ue(0)  # coded_block_pattern: Inter cbp 0
            stats["p16x8" if kind == "16x8" else "p8x16"] += 1
            continue
        if quad_hit is not None:
            bw.ue(3)  # mb_type P_8x8 (Table 7-13)
            for _ in range(4):
                bw.ue(0)  # sub_mb_type: P_L0_8x8 (Table 7-17)
            # §7.3.5.2: all sub_mb_types first, THEN the mvds; each
            # sub-partition's reconstructed mv feeds later derivations
            for part, mv in enumerate(quad_hit):
                (lx, ly, _lw, _lh), _c = _PART_GEOM8[part]
                bx0, by0 = mx * 4 + lx // 4, my * 4 + ly // 4
                mvp = _mvp_part(ms, bx0, by0, 2, 2, "8x8", part)
                bw.se(mv[0] - mvp[0])
                bw.se(mv[1] - mvp[1])
                ms.set_part(bx0, by0, 2, 2, mv)
            bw.ue(0)  # coded_block_pattern: Inter cbp 0
            stats["p8x8"] += 1
            continue
        if sub_hit is not None:
            sub_kind, mvs = sub_hit
            bw.ue(3)  # mb_type P_8x8
            for _ in range(4):
                bw.ue(sub_kind)  # sub_mb_type (Table 7-17)
            i = 0
            for part in range(4):
                (plx, ply, _w, _h), _c = _PART_GEOM8[part]
                pbx, pby = mx * 4 + plx // 4, my * 4 + ply // 4
                for dx4, dy4, w4, h4 in _SUB_GEOM[sub_kind]:
                    bx0, by0 = pbx + dx4, pby + dy4
                    mvp = _mvp_part(ms, bx0, by0, w4, h4, "sub", 0)
                    mv = mvs[i]
                    i += 1
                    bw.se(mv[0] - mvp[0])
                    bw.se(mv[1] - mvp[1])
                    ms.set_part(bx0, by0, w4, h4, mv)
            bw.ue(0)  # coded_block_pattern: Inter cbp 0
            stats["p8x8"] += 1
            continue
        bw.ue(30)  # mb_type: I_PCM in a P slice (25 + 5, Table 7-13)
        bw.align_zero()
        bw.raw_bytes(s[0].tobytes())
        bw.raw_bytes(s[1].tobytes())
        bw.raw_bytes(s[2].tobytes())
        ms.set_intra(mx, my)
        stats["ipcm"] += 1
    if skip_run:
        bw.ue(skip_run)  # trailing run when the picture ends in skips
    bw.rbsp_trailing()
    return bw.tobytes(), stats


# -- inter residuals: P_L0_16x16 with CAVLC-coded prediction error ----------
# coded_block_pattern me(v) mapping, Table 9-4 (ChromaArrayType 1),
# Inter column: the transcribed PREFIX codeNum 0..12 — the well-known
# head of the table (it is sorted by coding probability: cbp 0, the
# single-plane patterns, then the all-coded patterns 15 and 47).  The
# encoder below emits only codeNum 0 (cbp 0) and 12 (cbp 47 = luma 15
# + chroma 2); decoding any later codeNum raises NotImplementedError
# rather than guessing the rest of the lookup table.
_CBP_INTER_CODE = {  # cbp -> codeNum
    0: 0, 16: 1, 1: 2, 2: 3, 4: 4, 8: 5, 32: 6, 3: 7, 5: 8,
    10: 9, 12: 10, 15: 11, 47: 12,
}
_CBP_INTER_DEC = {v: k for k, v in _CBP_INTER_CODE.items()}


def _dense8(coeffs: list[int]) -> list[int]:
    """Pin a scan-order coefficient list to EXACTLY eight nonzeros:
    keep the 8 largest |level| (ties to the lower scan position),
    raise the lowest-frequency zeros to +1 when fewer — the density
    trick that keeps every derived nC in the implemented {<2, >=8}
    coeff_token columns (see _i16ac8_slice_rbsp)."""
    ac = list(coeffs)
    nz = [i for i, v in enumerate(ac) if v != 0]
    if len(nz) > 8:
        for i in sorted(nz, key=lambda i: (-abs(ac[i]), i))[8:]:
            ac[i] = 0
    elif len(nz) < 8:
        fill = [i for i in range(len(ac)) if ac[i] == 0]
        for i in fill[: 8 - len(nz)]:
            ac[i] = 1
    return ac


def _pr_slice_rbsp(
    src: tuple, ref: tuple, frame_num: int, qp: int, mv: tuple
) -> tuple[bytes, dict, tuple]:
    """One P slice where EVERY macroblock is P_L0_16x16 carrying
    dense-8 CAVLC residuals (cbp 47: all four luma 8x8 quadrants +
    chroma DC&AC) — real LOSSY inter coding: full-pel MC prediction
    from the previous RECONSTRUCTED picture (§8.4, the same median
    MV predictor / edge-extended fetch as _p_slice_rbsp), prediction
    error quantized with the inter rounding offset (1<<(15+e))/6,
    LumaLevel4x4 blocks coded with ALL 16 scan positions (§7.3.5.3.2
    — no DC/AC split outside Intra_16x16), chroma as the §7.3.5.3.3
    DC-then-AC order with d(0,0) carried by the 2x2 Hadamard chain.
    The pinned 8-coefficient density keeps every derived nC in the
    implemented {<2, >=8} coeff_token columns (the _i16ac8 trick),
    and a UNIFORM residual-coded picture never mixes TotalCoeff-0
    neighbours in, so nC 2..7 is unreachable by construction.
    Returns (rbsp, stats, reconstructed uint8 (y, cb, cr)) — the
    closed-loop reference for the next picture."""
    y, cb, cr = (p.astype(np.int64) for p in src)
    ry, rcb, rcr = ref
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16
    e = qp // 6
    mf = _mf4x4(qp % 6)
    fq = (1 << (15 + e)) // 6  # inter rounding offset
    qpc = _chroma_qpc(qp)
    ec = qpc // 6
    mfc = _mf4x4(qpc % 6)
    fqc = (1 << (15 + ec)) // 6
    bw = _EgWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(5)            # slice_type: P (all slices in pic)
    bw.ue(0)            # pic_parameter_set_id
    bw.u(frame_num % 16, 4)  # frame_num
    bw.u(0, 1)          # num_ref_idx_active_override_flag
    bw.u(0, 1)          # ref_pic_list_modification_flag_l0
    bw.u(0, 1)          # adaptive_ref_pic_marking_mode_flag
    bw.se(qp - 26)      # slice_qp_delta
    bw.ue(1)            # disable_deblocking_filter_idc: OFF
    rec_y = np.zeros_like(y)
    rec_cb = np.zeros_like(cb)
    rec_cr = np.zeros_like(cr)
    nc_grid = np.zeros((mbh * 4, mbw * 4), np.int64)
    nc_c = [
        np.zeros((mbh * 2, mbw * 2), np.int64),
        np.zeros((mbh * 2, mbw * 2), np.int64),
    ]

    def _nc_in(grid, gx: int, gy: int) -> int:
        has_a, has_b = gx > 0, gy > 0
        if has_a and has_b:
            return int((grid[gy, gx - 1] + grid[gy - 1, gx] + 1) >> 1)
        if has_a:
            return int(grid[gy, gx - 1])
        if has_b:
            return int(grid[gy - 1, gx])
        return 0

    def _ct_for(nc: int) -> dict:
        if nc < 2:
            return _CT_NC02
        if nc >= 8:
            return _CT_NC8
        raise AssertionError(f"dense-8 inter encoder derived nC {nc}")

    ms = _MotionState(mbh, mbw)
    stats = _stats_zero(is_p=True)
    for idx in range(mbh * mbw):
        my, mx = divmod(idx, mbw)
        y0, x0 = my * 16, mx * 16
        cy0, cx0 = my * 8, mx * 8
        gx0, gy0 = mx * 4, my * 4
        bw.ue(0)  # mb_skip_run: no skips in a uniform residual slice
        mvp = _mvp_16x16(ms, mx, my)
        bw.ue(0)                 # mb_type P_L0_16x16
        bw.se(mv[0] - mvp[0])    # mvd_l0 x
        bw.se(mv[1] - mvp[1])    # mvd_l0 y
        bw.ue(_CBP_INTER_CODE[47])  # coded_block_pattern me(v)
        bw.se(0)                 # mb_qp_delta
        ms.set_mb(mx, my, mv)
        stats["p16r"] += 1
        pred = _interp_luma_block(
            ry, x0, y0, 16, 16, mv[0], mv[1]
        ).astype(np.int64)
        resid = y[y0 : y0 + 16, x0 : x0 + 16] - pred
        # all 16 blocks: forward transform, quantize, zigzag, dense-8
        # as one numpy pass (the CAVLC writes stay sequential below)
        w = _CF @ _mb_blocks(resid) @ _CF.T
        cq = np.sign(w) * ((np.abs(w) * mf + fq) >> (15 + e))
        c16m = _dense8_batch(cq.reshape(16, 16)[:, _ZZ4_ARR])
        for bi in range(16):
            bx, by = _BLK_SCAN[bi]
            nc = _nc_in(nc_grid, gx0 + bx, gy0 + by)
            cavlc_encode_block(bw, c16m[bi].tolist(), _ct_for(nc))
            nc_grid[gy0 + by, gx0 + bx] = 8
        cm = np.zeros((16, 16), np.int64)
        cm[:, _ZZ4_ARR] = c16m
        d = _ac_dequant_batch(cm.reshape(16, 4, 4), qp)
        r = (_inv_transform4x4_batch(d) + 32) >> 6
        rec_y[y0 : y0 + 16, x0 : x0 + 16] = _uclip(
            pred + _mb_from_blocks(r), 0, 255
        )
        # chroma: §7.3.5.3.3 order — ChromaDCLevel Cb then Cr, then
        # the ChromaACLevel blocks of Cb, then Cr (cbp_chroma 2)
        cpreds, cresids, dccs = [], [], []
        for src_p, ref_p in ((cb, rcb), (cr, rcr)):
            cpred = _interp_chroma_block(
                ref_p, cx0, cy0, 8, 8, mv[0], mv[1]
            ).astype(np.int64)
            cresid = src_p[cy0 : cy0 + 8, cx0 : cx0 + 8] - cpred
            cc = _chroma_dc_quant(cresid, qpc)
            cavlc_encode_block(bw, cc, _CT_NCM1, _TOTAL_ZEROS_CDC,
                               max_coeff=4)
            cpreds.append(cpred)
            cresids.append(cresid)
            dccs.append(_chroma_dc_dequant(cc, qpc))
        cgx0, cgy0 = mx * 2, my * 2
        for pi, rec_p in enumerate((rec_cb, rec_cr)):
            # the 4 chroma blocks batched exactly like the luma 16
            # (cbi order 0..3 is row-major (cby, cbx))
            cblocks = cresids[pi].reshape(2, 4, 2, 4).swapaxes(1, 2)
            wq = _CF @ cblocks.reshape(4, 4, 4) @ _CF.T
            cq = np.sign(wq) * ((np.abs(wq) * mfc + fqc) >> (15 + ec))
            acm = _dense8_batch(cq.reshape(4, 16)[:, _ZZ4_ARR[1:]])
            for cbi in range(4):
                cbx, cby = cbi % 2, cbi // 2
                nc = _nc_in(nc_c[pi], cgx0 + cbx, cgy0 + cby)
                cavlc_encode_block(
                    bw, acm[cbi].tolist(), _ct_for(nc), max_coeff=15
                )
                nc_c[pi][cgy0 + cby, cgx0 + cbx] = 8
            cm = np.zeros((4, 16), np.int64)
            cm[:, _ZZ4_ARR[1:]] = acm
            d = _ac_dequant_batch(cm.reshape(4, 4, 4), qpc)
            d[:, 0, 0] = dccs[pi].reshape(4)
            r = (_inv_transform4x4_batch(d) + 32) >> 6
            rec_p[cy0 : cy0 + 8, cx0 : cx0 + 8] = _uclip(
                cpreds[pi]
                + r.reshape(2, 2, 4, 4).swapaxes(1, 2).reshape(8, 8),
                0,
                255,
            )
    bw.rbsp_trailing()
    return (
        bw.tobytes(),
        stats,
        (
            rec_y.astype(np.uint8),
            rec_cb.astype(np.uint8),
            rec_cr.astype(np.uint8),
        ),
    )


def h264_encode_gop_pr(
    frames_yuv: list[tuple], w: int, h: int, qp: int = 28,
    mv: tuple = (8, 0),
) -> tuple[list[bytes], list[dict], list[tuple]]:
    """Encode a GOP with REAL LOSSY INTER CODING: frame 0 as an
    all-I_PCM IDR (lossless reference), every later frame as a P
    slice of P_L0_16x16 macroblocks carrying dense-8 CAVLC residuals
    over full-pel MC prediction (cbp 47 — see _pr_slice_rbsp).  The
    loop is CLOSED over reconstructions: each P picture predicts from
    the previous picture's decoded output, exactly like the decoder,
    so quantization error never drifts.  Returns ([SPS, PPS, IDR, P,
    ...] NALs, per-frame stats, per-frame reconstructed (y, cb, cr)
    uint8 planes)."""
    y0, cb0, cr0 = frames_yuv[0]
    nals = [
        _nal(7, _sps_rbsp(w, h, max_ref_frames=1)),
        _nal(8, _pps_rbsp()),
        _nal(5, _idr_slice_rbsp(y0, cb0, cr0, idr_pic_id=0)),
    ]
    stats_list: list[dict] = [
        _stats_zero(ipcm=(y0.shape[0] // 16) * (y0.shape[1] // 16))
    ]
    recs: list[tuple] = [frames_yuv[0]]  # I_PCM: lossless
    ref = frames_yuv[0]
    for fno, cur in enumerate(frames_yuv[1:], start=1):
        rbsp, stats, rec = _pr_slice_rbsp(cur, ref, fno, qp, mv)
        nals.append(_nal(1, rbsp, ref_idc=2))
        stats_list.append(stats)
        recs.append(rec)
        ref = rec  # closed loop over the RECONSTRUCTION
    return nals, stats_list, recs


def h264_encode_gop_p(
    frames_yuv: list[tuple], w: int, h: int,
    mv_candidates: list | None = None,
    mv_pair_candidates: list | None = None,
    mv_quad_candidates: list | None = None,
    mv_sub_candidates: list | None = None,
) -> tuple[list[bytes], list[dict]]:
    """Encode a GOP: frame 0 as an all-I_PCM IDR, every later frame
    as a P slice (P_Skip / P_16x16 / sub-16x16 partitions / I_PCM
    replenishment — see _p_slice_rbsp).  ``frames_yuv`` are PADDED
    (y, cb, cr) uint8 plane triples (mb-aligned, as _rgb_to_yuv420 of
    a padded frame yields); every mode is lossless so the
    reconstruction equals the input exactly.
    ``mv_pair_candidates`` are ("16x8"|"8x16", mv0, mv1) triples for
    the two-partition modes.  Returns ([SPS, PPS, IDR, P, P, ...]
    NAL units, per-frame MB-mode stats)."""
    if mv_candidates is None:
        mv_candidates = [(0, 0)]
    y0, cb0, cr0 = frames_yuv[0]
    nals = [
        _nal(7, _sps_rbsp(w, h, max_ref_frames=1)),
        _nal(8, _pps_rbsp()),
        _nal(5, _idr_slice_rbsp(y0, cb0, cr0, idr_pic_id=0)),
    ]
    stats_list: list[dict] = [
        _stats_zero(ipcm=(y0.shape[0] // 16) * (y0.shape[1] // 16))
    ]
    ref = frames_yuv[0]
    for fno, cur in enumerate(frames_yuv[1:], start=1):
        rbsp, stats = _p_slice_rbsp(
            cur, ref, fno, mv_candidates, mv_pair_candidates,
            mv_quad_candidates, mv_sub_candidates,
        )
        nals.append(_nal(1, rbsp, ref_idc=2))
        stats_list.append(stats)
        ref = cur  # closed loop: every mode is exact
    return nals, stats_list


def h264_encode_gop_pwp(
    frames_yuv: list[tuple], w: int, h: int, wp: tuple,
    mv_candidates: list | None = None,
) -> tuple[list[bytes], list[dict]]:
    """Encode a GOP whose P slices carry EXPLICIT WEIGHTED PREDICTION
    (§8.4.2.3): frame 0 as an all-I_PCM IDR, every later frame as a P
    slice under a weighted_pred_flag PPS whose header writes the
    §7.3.3.2 pred_weight_table ``wp`` = (luma_log2_denom, wY, oY,
    chroma_log2_denom, wCb, oCb, wCr, oCr).  Every inter prediction —
    P_Skip included — is scaled through eq. 8-270/8-271 before the
    lossless-mode comparison, so global fades (optionally composed
    with pans) code as P_Skip / P_L0_16x16 instead of I_PCM.  Main
    profile (Baseline forbids weighted prediction); CAVLC stays on.
    Returns ([SPS, PPS, IDR, P, ...] NAL units, per-frame stats)."""
    if mv_candidates is None:
        mv_candidates = [(0, 0)]
    y0, cb0, cr0 = frames_yuv[0]
    nals = [
        _nal(7, _sps_rbsp(w, h, max_ref_frames=1, profile=77)),
        _nal(8, _pps_rbsp(weighted_pred=True)),
        _nal(5, _idr_slice_rbsp(y0, cb0, cr0, idr_pic_id=0)),
    ]
    stats_list: list[dict] = [
        _stats_zero(ipcm=(y0.shape[0] // 16) * (y0.shape[1] // 16))
    ]
    ref = frames_yuv[0]
    for fno, cur in enumerate(frames_yuv[1:], start=1):
        rbsp, stats = _p_slice_rbsp(
            cur, ref, fno, mv_candidates, wp=wp,
        )
        nals.append(_nal(1, rbsp, ref_idc=2))
        stats_list.append(stats)
        ref = cur  # closed loop: every mode is exact
    return nals, stats_list


def h264_encode_gop_p_ms(
    frames_yuv: list[tuple], w: int, h: int, n_slices: int,
    mv_candidates: list | None = None, wp: tuple | None = None,
) -> tuple[list[bytes], list[dict]]:
    """Encode a GOP where EVERY picture is split into ``n_slices``
    row-aligned slices (§7.4.3 first_mb_in_slice > 0) — the
    slice-parallel layout real encoders emit so a decoder farm can
    reconstruct one picture concurrently.  Each slice carries its own
    header, skip-run state, and (optionally, ``wp``) pred_weight_table;
    prediction availability stops at slice boundaries (§6.4.9), which
    the shared slice-aware _MotionState enforces identically to the
    decoder, so each slice's first row re-anchors its motion field.
    Frame 0 is an all-I_PCM IDR split the same way (purely
    structural: I_PCM has no neighbour dependence).  Returns
    ([SPS, PPS, IDR×n, P×n, ...] NAL units, per-PICTURE stats)."""
    if mv_candidates is None:
        mv_candidates = [(0, 0)]
    y0, cb0, cr0 = frames_yuv[0]
    mbh, mbw = y0.shape[0] // 16, y0.shape[1] // 16
    if not 1 <= n_slices <= mbh:
        raise ValueError(
            f"n_slices must be in [1, mb rows = {mbh}], got {n_slices}"
        )
    rows = [round(i * mbh / n_slices) for i in range(n_slices + 1)]
    starts = [r * mbw for r in rows]
    profile = 77 if wp is not None else 66
    nals = [
        _nal(7, _sps_rbsp(w, h, max_ref_frames=1, profile=profile)),
        _nal(8, _pps_rbsp(weighted_pred=wp is not None)),
    ]
    for k in range(n_slices):
        nals.append(_nal(5, _idr_slice_rbsp(
            y0, cb0, cr0, idr_pic_id=0,
            first_mb=starts[k], n_mbs=starts[k + 1] - starts[k],
        )))
    stats_list: list[dict] = [
        _stats_zero(ipcm=mbh * mbw, n_slices=n_slices)
    ]
    ref = frames_yuv[0]
    sum_keys = ("skip", "p16", "p16x8", "p8x16", "p8x8", "p16r",
                "ipcm", "i16")
    for fno, cur in enumerate(frames_yuv[1:], start=1):
        ms = _MotionState(mbh, mbw)
        ms.slice_mb = np.full((mbh, mbw), -1, np.int64)
        pstats = _stats_zero(is_p=True, n_slices=n_slices)
        for k in range(n_slices):
            ms.cur_slice = k
            rbsp, st = _p_slice_rbsp(
                cur, ref, fno, mv_candidates, wp=wp,
                first_mb=starts[k], n_mbs=starts[k + 1] - starts[k],
                ms=ms,
            )
            nals.append(_nal(1, rbsp, ref_idc=2))
            for kk in sum_keys:
                pstats[kk] += st[kk]
        stats_list.append(pstats)
        ref = cur  # closed loop: every mode is exact
    return nals, stats_list


def _stats_zero(**flags) -> dict:
    s = {"skip": 0, "p16": 0, "p16x8": 0, "p8x16": 0, "p8x8": 0,
         "p16r": 0, "bl0": 0, "bl1": 0, "bbi": 0, "bskip": 0,
         "bdir": 0, "b8x8": 0, "b8_l0": 0, "b8_l1": 0, "b8_bi": 0,
         "b8_dir": 0, "b8_split": 0, "b8_parts": 0,
         "ipcm": 0, "i16": 0,
         "is_p": False, "is_b": False, "n_slices": 1}
    s.update(flags)
    return s


def _b_slice_rbsp(
    src: tuple, ref0: tuple, ref1: tuple, frame_num: int, poc_lsb: int,
    l0_candidates: list, l1_candidates: list, bi_candidates: list,
    wpb: tuple | None = None,
    implicit_pocs: tuple | None = None,
    direct: bool = False,
    direct_col: tuple | None = None,
    direct_as_coded: bool = False,
    direct_mode: str = "spatial",
    direct_pocs: tuple | None = None,
    first_mb: int = 0,
    n_mbs: int | None = None,
    ms0: "_MotionState | None" = None,
    ms1: "_MotionState | None" = None,
    sub_candidates: list | None = None,
) -> tuple[bytes, dict]:
    """One B slice covering the whole picture — or, for MULTI-SLICE
    B pictures (round 12), the ``n_mbs`` macroblocks starting at
    raster address ``first_mb``: the caller shares one slice-aware
    (``ms0``, ``ms1``) pair across the picture's slices and advances
    their ``cur_slice`` per slice, so §6.4.9 cross-slice neighbour
    unavailability shapes BOTH lists' medians and the spatial-direct
    derivation identically to the decoder (each slice's first
    macroblock re-anchors: no neighbours → directZeroPrediction,
    which pan content never matches, so every slice opens with a
    coded seed).  Per macroblock, in raster order, the encoder takes
    the first LOSSLESS mode:

    0. B_Skip (``direct=True``) — when the direct derivation
       reproduces the source exactly: §8.4.1.2.2 SPATIAL
       (``direct_mode="spatial"``: refIdx MinPositive over
       neighbours, per-list 16x16 medians, per-8x8 colZeroFlag
       against ``direct_col`` = the colocated L1 reference's
       (mv, inter) grids) or §8.4.1.2.3 TEMPORAL
       (``direct_mode="temporal"``: the colocated vector scaled by
       the ``direct_pocs`` = (curr, poc0, poc1) POC distances);
       run-length coded via ``mb_skip_run``, or written as explicit
       B_Direct_16x16 + cbp 0 macroblocks when ``direct_as_coded``
       (bit-different, decode-identical),
    1. B_L0_16x16 (mb_type 1) — the first ``l0_candidates`` vector
       whose MC copy from the PAST reference matches exactly,
    2. B_L1_16x16 (mb_type 2) — same against the FUTURE reference,
    3. B_Bi_16x16 (mb_type 3) — the first (mv0, mv1) pair whose
       bi-prediction — the ``(predL0 + predL1 + 1) >> 1`` rounded
       mean (§8.4.2.3.2, weighted_bipred_idc 0), or the explicit
       eq. 8-272 weighting when ``wpb`` is given — matches exactly,
    4. B_8x8 (mb_type 22, round 12) — the first ``sub_candidates``
       entry (modes, mvs) whose four 8x8 sub-macroblocks all match:
       modes are Table 7-18 sub_mb_types 1/2/3 (B_L0_8x8 / B_L1_8x8
       / B_Bi_8x8; B_Direct_8x8 and the sub-8x8 splits stay out of
       scope), mvs carries one vector (one-list) or a pair (bi) per
       sub-block.  Syntax per §7.3.5.2: four sub_mb_types, then ALL
       mvd_l0 in mbPartIdx order, then ALL mvd_l1 — each list's
       §8.4.1.3 median derives per sub-block with earlier sub-blocks'
       reconstructed state visible (a one-list sub-block marks the
       OTHER list refIdx −1, like the 16x16 modes),
    5. I_PCM (mb_type 48 = 25 + 23, Table 7-14) — intra fallback.

    ``wpb`` — EXPLICIT WEIGHTED BI-PREDICTION (weighted_bipred_idc
    1): (luma_log2_denom, chroma_log2_denom, L0 weights, L1 weights)
    writes the §7.3.3.2 pred_weight_table with BOTH list loops into
    the header, one-list predictions scale through eq. 8-270/8-271
    with their list's weights, and bi-predictions through eq. 8-272.

    ``implicit_pocs`` — IMPLICIT weighted bi-prediction
    (weighted_bipred_idc 2): (curr_poc, poc_L0, poc_L1) derives the
    §8.4.2.3.1 POC-distance weights; NO pred_weight_table is written
    (the weights are decoder-derived), one-list predictions stay
    UNWEIGHTED (implicit mode only touches bi-predicted blocks), and
    bi-predictions use (p0·w0 + p1·w1 + 32) >> 6.  Mutually
    exclusive with ``wpb``.

    Each list keeps its own §8.4.1.3 motion state: a macroblock
    predicted from only one list contributes refIdx −1 / mv 0 to the
    OTHER list's median derivation (§8.4.1.3.2), exactly like an
    intra block.  B_Skip / B_Direct (co-located MV derivation) and
    sub-16x16 B partitions are not emitted — the decoder rejects
    them explicitly.  B pictures are NON-REFERENCE (nal_ref_idc 0):
    no dec_ref_pic_marking in the header, and the GOP's prediction
    chain never passes through a B picture."""
    y, cb, cr = (p.astype(np.uint8) for p in src)
    r0y, r0cb, r0cr = ref0
    r1y, r1cb, r1cr = ref1
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16
    if n_mbs is None:
        n_mbs = mbh * mbw - first_mb
    bw = _EgWriter()
    bw.ue(first_mb)     # first_mb_in_slice
    bw.ue(6)            # slice_type: B (all slices in pic)
    bw.ue(0)            # pic_parameter_set_id
    bw.u(frame_num % 16, 4)  # frame_num
    bw.u(poc_lsb % 256, 8)   # pic_order_cnt_lsb (poc_type 0)
    # direct_spatial_mv_pred_flag: 1 spatial (§8.4.1.2.2), 0 temporal
    # (§8.4.1.2.3 colocated-MV scaling)
    bw.u(1 if direct_mode == "spatial" else 0, 1)
    bw.u(0, 1)          # num_ref_idx_active_override_flag
    bw.u(0, 1)          # ref_pic_list_modification_flag_l0
    bw.u(0, 1)          # ref_pic_list_modification_flag_l1
    if wpb is not None:
        # pred_weight_table (§7.3.3.2) under weighted_bipred_idc 1:
        # shared denominators, then the L0 loop, then the L1 loop;
        # identity planes written as spec-default flag-0 entries
        ld, cd, l0w, l1w = wpb
        bw.ue(ld)       # luma_log2_weight_denom
        bw.ue(cd)       # chroma_log2_weight_denom
        for wy, oy, wcb, ocb, wcr, ocr in (l0w, l1w):
            if (wy, oy) == (1 << ld, 0):
                bw.u(0, 1)
            else:
                bw.u(1, 1)
                bw.se(wy)
                bw.se(oy)
            if (wcb, ocb, wcr, ocr) == (1 << cd, 0, 1 << cd, 0):
                bw.u(0, 1)
            else:
                bw.u(1, 1)
                bw.se(wcb)
                bw.se(ocb)
                bw.se(wcr)
                bw.se(ocr)
    # nal_ref_idc 0 → dec_ref_pic_marking absent (§7.3.3)
    bw.se(0)            # slice_qp_delta
    bw.ue(1)            # disable_deblocking_filter_idc: filter OFF
    if ms0 is None:
        ms0, ms1 = _MotionState(mbh, mbw), _MotionState(mbh, mbw)
    stats = _stats_zero(is_b=True)

    def _src_mb(mx: int, my: int):
        return (
            y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
        )

    def _part_planes(ref: tuple, mx: int, my: int, geom: tuple,
                     mv: tuple):
        (lx, ly, lw, lh), (cx, cy, cw, ch) = geom
        ryy, rcbb, rcrr = ref
        return (
            _interp_luma_block(ryy, mx * 16 + lx, my * 16 + ly,
                               lw, lh, mv[0], mv[1]),
            _interp_chroma_block(rcbb, mx * 8 + cx, my * 8 + cy,
                                 cw, ch, mv[0], mv[1]),
            _interp_chroma_block(rcrr, mx * 8 + cx, my * 8 + cy,
                                 cw, ch, mv[0], mv[1]),
        )

    def _single_mb_matches(ref: tuple, lst: int, mx: int, my: int,
                           mv: tuple, s: tuple) -> bool:
        """Lazy per-plane twin of the eager
        ``_wpb_single(_mc_mb_planes(...)) == s`` candidate test
        (optimization round 15): luma first, each chroma plane only
        when every previous plane already matched — the same samples,
        the same §8.4.2.3.2 single-list weighting, the same equality,
        short-circuited (most failing candidates fail on luma, so the
        two chroma interpolations were dead work)."""
        ryy, rcbb, rcrr = ref
        if wpb is not None:
            ld, cd, l0w, l1w = wpb
            wy, oy, wcb, ocb, wcr, ocr = l0w if lst == 0 else l1w
        p = _interp_luma_block(ryy, mx * 16, my * 16, 16, 16,
                               mv[0], mv[1])
        if wpb is not None:
            p = _wp_plane(p, wy, oy, ld)
        if not np.array_equal(p, s[0]):
            return False
        p = _interp_chroma_block(rcbb, mx * 8, my * 8, 8, 8,
                                 mv[0], mv[1])
        if wpb is not None:
            p = _wp_plane(p, wcb, ocb, cd)
        if not np.array_equal(p, s[1]):
            return False
        p = _interp_chroma_block(rcrr, mx * 8, my * 8, 8, 8,
                                 mv[0], mv[1])
        if wpb is not None:
            p = _wp_plane(p, wcr, ocr, cd)
        return np.array_equal(p, s[2])

    def _bi_mb_matches(mx: int, my: int, mv0: tuple, mv1: tuple,
                       s: tuple) -> bool:
        """Lazy per-plane twin of ``_bi_mb(...) == s`` — identical
        combination arithmetic (implicit POC weights / explicit
        eq. 8-272 / rounded mean), short-circuited per plane."""
        if implicit_pocs is not None:
            w0, w1 = _implicit_bi_weights(*implicit_pocs)
            wts = ((w0, w1, 0, 0, 5),) * 3
        elif wpb is not None:
            ld, cd, (wy0, oy0, wcb0, ocb0, wcr0, ocr0), \
                (wy1, oy1, wcb1, ocb1, wcr1, ocr1) = wpb
            wts = (
                (wy0, wy1, oy0, oy1, ld),
                (wcb0, wcb1, ocb0, ocb1, cd),
                (wcr0, wcr1, ocr0, ocr1, cd),
            )
        else:
            wts = None
        refs0 = (r0y, r0cb, r0cr)
        refs1 = (r1y, r1cb, r1cr)
        for k in range(3):
            if k == 0:
                a = _interp_luma_block(refs0[0], mx * 16, my * 16,
                                       16, 16, mv0[0], mv0[1])
                b = _interp_luma_block(refs1[0], mx * 16, my * 16,
                                       16, 16, mv1[0], mv1[1])
            else:
                a = _interp_chroma_block(refs0[k], mx * 8, my * 8,
                                         8, 8, mv0[0], mv0[1])
                b = _interp_chroma_block(refs1[k], mx * 8, my * 8,
                                         8, 8, mv1[0], mv1[1])
            if wts is None:
                p = (
                    (a.astype(np.int64) + b.astype(np.int64) + 1) >> 1
                ).astype(np.uint8)
            else:
                p = _wpb_bi_plane(a, b, wts[k][0], wts[k][1],
                                  wts[k][2], wts[k][3], wts[k][4])
            if not np.array_equal(p, s[k]):
                return False
        return True

    def _mb_direct(mx: int, my: int):
        """The current macroblock's direct derivation — (use0, use1,
        per-8x8 blocks) — for B_Direct_8x8 sub-macroblocks.  Spatial
        derivation consults only OUTSIDE-the-MB neighbours, so it is
        safe to compute before this MB's own state updates."""
        if direct_mode == "temporal":
            return True, True, _temporal_direct(
                mx, my, direct_col, *direct_pocs
            )
        return _spatial_direct(ms0, ms1, mx, my, direct_col)

    def _usage_pred(mx: int, my: int, geom: tuple, usage: int, mvv):
        """Weighted prediction of ONE motion partition (geom) under
        list usage 0=L0 / 1=L1 / 2=Bi (mvv: mv, mv, or (mv0, mv1))."""
        if usage == 0:
            return _wpb_single(_part_planes(ref0, mx, my, geom, mvv),
                               wpb, 0)
        if usage == 1:
            return _wpb_single(_part_planes(ref1, mx, my, geom, mvv),
                               wpb, 1)
        p0 = _part_planes(ref0, mx, my, geom, mvv[0])
        p1 = _part_planes(ref1, mx, my, geom, mvv[1])
        if implicit_pocs is not None:
            w0, w1 = _implicit_bi_weights(*implicit_pocs)
            return tuple(
                _wpb_bi_plane(a, b, w0, w1, 0, 0, 5)
                for a, b in zip(p0, p1)
            )
        return _wpb_bi(p0, p1, wpb)

    def _region_matches(mx: int, my: int, geom: tuple, pred) -> bool:
        (lx, ly, lw, lh), (cx, cy, cw, ch) = geom
        py_, pcb_, pcr_ = pred
        return (
            np.array_equal(
                py_, y[my * 16 + ly : my * 16 + ly + lh,
                       mx * 16 + lx : mx * 16 + lx + lw]
            )
            and np.array_equal(
                pcb_, cb[my * 8 + cy : my * 8 + cy + ch,
                         mx * 8 + cx : mx * 8 + cx + cw]
            )
            and np.array_equal(
                pcr_, cr[my * 8 + cy : my * 8 + cy + ch,
                         mx * 8 + cx : mx * 8 + cx + cw]
            )
        )

    def _sub_matches(mx: int, my: int, modes: tuple, mvs: tuple,
                     drv=None) -> bool:
        for part in range(4):
            mode = modes[part]
            if mode == 0:
                duse0, duse1, dblocks = drv
                pred = _direct_part_pred(
                    ref0, ref1, mx, my, part, duse0, duse1, dblocks,
                    wpb=wpb, wbi=wbi_enc,
                )
                if not _region_matches(mx, my, _PART_GEOM8[part],
                                       pred):
                    return False
            elif mode <= 3:
                pred = _usage_pred(mx, my, _PART_GEOM8[part],
                                   mode - 1, mvs[part])
                if not _region_matches(mx, my, _PART_GEOM8[part],
                                       pred):
                    return False
            else:
                kind, usage = _B_SUB_SPLIT[mode]
                for i, geom in enumerate(_b_subpart_geoms(part, kind)):
                    pred = _usage_pred(mx, my, geom, usage,
                                       mvs[part][i])
                    if not _region_matches(mx, my, geom, pred):
                        return False
        return True

    wbi_enc = (
        _implicit_bi_weights(*implicit_pocs)
        if implicit_pocs is not None else None
    )
    skip_run = 0
    for idx in range(first_mb, first_mb + n_mbs):
        my, mx = divmod(idx, mbw)
        if ms0.slice_mb is not None:
            # slice ownership (shared grid between the two lists)
            ms0.slice_mb[my, mx] = ms0.cur_slice
        s = _src_mb(mx, my)
        if direct:
            if direct_mode == "temporal":
                use0 = use1 = True
                blocks = _temporal_direct(
                    mx, my, direct_col, *direct_pocs
                )
            else:
                use0, use1, blocks = _spatial_direct(
                    ms0, ms1, mx, my, direct_col
                )
            pred = _direct_mb_pred(
                ref0, ref1, mx, my, use0, use1, blocks,
                wpb=wpb, wbi=wbi_enc,
            )
            if all(np.array_equal(a, b) for a, b in zip(pred, s)):
                if direct_as_coded:
                    bw.ue(skip_run)
                    skip_run = 0
                    bw.ue(0)  # mb_type B_Direct_16x16 (Table 7-14)
                    bw.ue(0)  # coded_block_pattern: cbp 0
                    stats["bdir"] += 1
                else:
                    skip_run += 1
                    stats["bskip"] += 1
                _direct_update_ms(ms0, ms1, mx, my, use0, use1, blocks)
                continue
        bw.ue(skip_run)  # mb_skip_run before every coded MB
        skip_run = 0
        hit0 = next(
            (
                mv for mv in l0_candidates
                if _single_mb_matches((r0y, r0cb, r0cr), 0, mx, my,
                                      mv, s)
            ),
            None,
        )
        if hit0 is not None:
            mvp = _mvp_16x16(ms0, mx, my)
            bw.ue(1)                  # mb_type B_L0_16x16
            bw.se(hit0[0] - mvp[0])   # mvd_l0
            bw.se(hit0[1] - mvp[1])
            bw.ue(0)                  # coded_block_pattern: cbp 0
            ms0.set_mb(mx, my, hit0)
            ms1.set_intra(mx, my)     # refIdxL1 −1 for L1 derivations
            stats["bl0"] += 1
            continue
        hit1 = next(
            (
                mv for mv in l1_candidates
                if _single_mb_matches((r1y, r1cb, r1cr), 1, mx, my,
                                      mv, s)
            ),
            None,
        )
        if hit1 is not None:
            mvp = _mvp_16x16(ms1, mx, my)
            bw.ue(2)                  # mb_type B_L1_16x16
            bw.se(hit1[0] - mvp[0])   # mvd_l1
            bw.se(hit1[1] - mvp[1])
            bw.ue(0)
            ms1.set_mb(mx, my, hit1)
            ms0.set_intra(mx, my)
            stats["bl1"] += 1
            continue
        hitb = next(
            (
                (mv0, mv1) for mv0, mv1 in bi_candidates
                if _bi_mb_matches(mx, my, mv0, mv1, s)
            ),
            None,
        )
        if hitb is not None:
            mv0, mv1 = hitb
            mvp0 = _mvp_16x16(ms0, mx, my)
            mvp1 = _mvp_16x16(ms1, mx, my)
            bw.ue(3)                  # mb_type B_Bi_16x16
            bw.se(mv0[0] - mvp0[0])   # mvd_l0 before mvd_l1 (§7.3.5.1)
            bw.se(mv0[1] - mvp0[1])
            bw.se(mv1[0] - mvp1[0])
            bw.se(mv1[1] - mvp1[1])
            bw.ue(0)
            ms0.set_mb(mx, my, mv0)
            ms1.set_mb(mx, my, mv1)
            stats["bbi"] += 1
            continue
        sub_hit = None
        mb_drv = None
        for modes, mvs in (sub_candidates or ()):
            if any(m == 0 for m in modes) and mb_drv is None:
                mb_drv = _mb_direct(mx, my)
            if _sub_matches(mx, my, modes, mvs, drv=mb_drv):
                sub_hit = (modes, mvs)
                break
        if sub_hit is not None:
            modes, mvs = sub_hit
            bw.ue(22)  # mb_type B_8x8 (Table 7-14)
            for t in modes:
                bw.ue(t)  # sub_mb_type (Table 7-18: 0/1/2/3)
            # §7.3.5.2: ALL mvd_l0 in mbPartIdx order, THEN all
            # mvd_l1 — each list's state (incl. refIdx −1 marks for
            # the other-list sub-blocks AND the direct sub-blocks'
            # DERIVED vectors) advances per sub-block, exactly like
            # the decoder; B_Direct_8x8 writes no mvd in either loop
            for lst, msx in ((0, ms0), (1, ms1)):
                uses = (1, 3) if lst == 0 else (2, 3)
                for part in range(4):
                    (lx, ly, _w, _h), _c = _PART_GEOM8[part]
                    bx0 = mx * 4 + lx // 4
                    by0 = my * 4 + ly // 4
                    mode = modes[part]
                    if mode == 0:
                        duse0, duse1, dblocks = mb_drv
                        used = duse0 if lst == 0 else duse1
                        if used:
                            msx.set_part(bx0, by0, 2, 2,
                                         dblocks[part][lst])
                        else:
                            msx.set_part(bx0, by0, 2, 2, (0, 0),
                                         inter=False)
                    elif mode <= 3 and mode in uses:
                        mv = (mvs[part][lst] if mode == 3
                              else mvs[part])
                        mvp = _mvp_part(msx, bx0, by0, 2, 2,
                                        "8x8", part)
                        bw.se(mv[0] - mvp[0])
                        bw.se(mv[1] - mvp[1])
                        msx.set_part(bx0, by0, 2, 2, mv)
                    elif mode > 3:
                        # sub-8x8 split: per sub-partition mvd for
                        # the used list(s), each against the general
                        # §8.4.1.3 median at its own granularity,
                        # earlier sub-partitions feeding later ones
                        kind, usage = _B_SUB_SPLIT[mode]
                        used = (usage == 2) or (usage == lst)
                        if used:
                            for i, (dx4, dy4, w4, h4) in enumerate(
                                _SUB_GEOM[kind]
                            ):
                                sx0, sy0 = bx0 + dx4, by0 + dy4
                                mv = (mvs[part][i][lst]
                                      if usage == 2
                                      else mvs[part][i])
                                mvp = _mvp_part(msx, sx0, sy0,
                                                w4, h4, "sub", 0)
                                bw.se(mv[0] - mvp[0])
                                bw.se(mv[1] - mvp[1])
                                msx.set_part(sx0, sy0, w4, h4, mv)
                        else:
                            msx.set_part(bx0, by0, 2, 2, (0, 0),
                                         inter=False)
                    else:
                        msx.set_part(bx0, by0, 2, 2, (0, 0),
                                     inter=False)
            bw.ue(0)  # coded_block_pattern: cbp 0
            stats["b8x8"] += 1
            stats["b8_dir"] += sum(1 for m in modes if m == 0)
            # per-list sub-block census, symmetric with the decoder's
            # (r12 advice: the encoder never incremented these, so an
            # encode-vs-decode stats comparison would silently read
            # 0 L0/L1/Bi sub-blocks on the encoder side): non-split
            # coded sub-mbs by sub_mb_type, splits by their used list
            stats["b8_l0"] += sum(1 for m in modes if m == 1)
            stats["b8_l1"] += sum(1 for m in modes if m == 2)
            stats["b8_bi"] += sum(1 for m in modes if m == 3)
            for m in modes:
                if m > 3:
                    stats[{0: "b8_l0", 1: "b8_l1",
                           2: "b8_bi"}[_B_SUB_SPLIT[m][1]]] += 1
            stats["b8_split"] += sum(1 for m in modes if m > 3)
            stats["b8_parts"] += sum(
                len(_SUB_GEOM[_B_SUB_SPLIT[m][0]])
                for m in modes if m > 3
            )
            continue
        bw.ue(48)  # mb_type: I_PCM in a B slice (25 + 23, Table 7-14)
        bw.align_zero()
        bw.raw_bytes(s[0].tobytes())
        bw.raw_bytes(s[1].tobytes())
        bw.raw_bytes(s[2].tobytes())
        ms0.set_intra(mx, my)
        ms1.set_intra(mx, my)
        stats["ipcm"] += 1
    if skip_run:
        bw.ue(skip_run)  # trailing run when the picture ends in skips
    bw.rbsp_trailing()
    return bw.tobytes(), stats


def h264_encode_gop_b(
    frames_yuv: list[tuple], w: int, h: int,
    l0_candidates: list, l1_candidates: list, bi_candidates: list,
    p_candidates: list | None = None,
    wpb: tuple | None = None,
    direct: bool = False,
    direct_as_coded: bool = False,
    direct_mode: str = "spatial",
    sub_candidates: list | None = None,
) -> tuple[list[bytes], list[dict]]:
    """Encode a hierarchical-free IBPBP GOP with NON-REFERENCE B
    pictures: display order [I, B, P, B, P, ...] (``frames_yuv`` in
    DISPLAY order, odd length), DECODE order [I, P, B, P, B, ...] —
    each B is emitted AFTER its future reference and predicts from
    both surrounding reference pictures.

    Bitstream structure: Main-profile SPS (B slices are outside
    Baseline), pic_order_cnt_type 0 with poc_lsb = 2·display_index
    (decode order ≠ output order needs explicit POC), max_ref 2.
    frame_num follows §7.4.3: reference pictures increment it (I=0,
    P_j=j), a non-reference B carries PrevRefFrameNum + 1 — the same
    value the NEXT reference picture uses.  P pictures ride the
    existing lossless ``_p_slice_rbsp``; every implemented B mode is
    lossless too, so the whole GOP closes bit-exactly.

    ``wpb`` turns on EXPLICIT WEIGHTED BI-PREDICTION
    (weighted_bipred_idc 1): B slices carry two-list
    pred_weight_tables and predict through §8.4.2.3.2 eq. 8-270/272;
    the reference P pans stay unweighted (weighted_pred_flag 0 — the
    two PPS flags are independent).

    Returns ([SPS, PPS, IDR, P, B, P, B, ...] NALs in decode order,
    per-picture stats in DECODE order)."""
    if len(frames_yuv) % 2 == 0:
        raise ValueError("IBPBP GOP needs an odd display-frame count")
    y0, cb0, cr0 = frames_yuv[0]
    nals = [
        _nal(7, _sps_rbsp(w, h, max_ref_frames=2, poc_type=0,
                          profile=77)),
        _nal(8, _pps_rbsp(
            weighted_bipred_idc=1 if wpb is not None else 0
        )),
        _nal(5, _idr_slice_rbsp(y0, cb0, cr0, idr_pic_id=0, poc_lsb=0)),
    ]
    stats_list = [
        _stats_zero(ipcm=(y0.shape[0] // 16) * (y0.shape[1] // 16))
    ]
    prev_ref = frames_yuv[0]
    mbh_, mbw_ = y0.shape[0] // 16, y0.shape[1] // 16
    for j in range(1, (len(frames_yuv) + 1) // 2):
        p_frame = frames_yuv[2 * j]
        b_frame = frames_yuv[2 * j - 1]
        ms_p = _MotionState(mbh_, mbw_)
        rbsp, pstats = _p_slice_rbsp(
            p_frame, prev_ref, j, p_candidates or [(0, 0)],
            poc_lsb=4 * j, ms=ms_p,
        )
        nals.append(_nal(1, rbsp, ref_idc=2))
        stats_list.append(pstats)
        # colocated motion of RefPicList1[0] (this P) for the B's
        # §8.4.1.2.2 colZeroFlag — identical to what the decoder
        # stores into its DPB
        col = (ms_p.mv.copy(), (ms_p.inter & ms_p.avail).copy())
        rbsp, bstats = _b_slice_rbsp(
            b_frame, prev_ref, p_frame, j + 1, 4 * j - 2,
            l0_candidates, l1_candidates, bi_candidates, wpb=wpb,
            direct=direct, direct_col=col,
            direct_as_coded=direct_as_coded,
            direct_mode=direct_mode,
            direct_pocs=(4 * j - 2, 4 * j - 4, 4 * j),
            sub_candidates=sub_candidates,
        )
        nals.append(_nal(1, rbsp, ref_idc=0))
        stats_list.append(bstats)
        prev_ref = p_frame  # every P mode is exact → rec == src
    return nals, stats_list


def h264_encode_gop_b_ms(
    frames_yuv: list[tuple], w: int, h: int, n_slices: int,
    l0_candidates: list, l1_candidates: list, bi_candidates: list,
    p_candidates: list | None = None,
    wpb_slices: list | None = None,
    direct: bool = False,
    direct_mode: str = "spatial",
) -> tuple[list[bytes], list[dict]]:
    """Encode an IBPBP GOP where EVERY picture — IDR, P, and B — is
    split into ``n_slices`` row-aligned slices (round 12: the
    composition of the round-11 multi-slice machinery with the
    round-10/11 B machinery).  Each B slice carries its own header
    (first_mb_in_slice per §7.4.3), its own skip-run state, its own
    direct_spatial_mv_pred_flag, and — ``wpb_slices`` — its OWN
    §7.3.3.2 two-list pred_weight_table (``wpb_slices[k]`` applies to
    slice ``k`` of every B picture; the spec scopes the table to the
    slice, so weights may genuinely differ across one picture).  The
    shared slice-aware (ms0, ms1) pair makes §6.4.9 cross-slice
    neighbour unavailability shape per-list medians and the
    spatial-direct derivation exactly as the decoder re-derives them:
    every slice's first macroblock sees no neighbours, derives
    directZeroPrediction, fails to match pan content, and opens the
    slice with a coded one-list seed — the direct-mode re-anchoring
    this layout exists to prove.  P pictures ride the multi-slice
    path unweighted (weighted_pred_flag 0 — independent of
    weighted_bipred_idc).  Returns ([SPS, PPS, IDR×n, P×n, B×n, ...]
    NALs in decode order, per-PICTURE stats in decode order)."""
    if len(frames_yuv) % 2 == 0:
        raise ValueError("IBPBP GOP needs an odd display-frame count")
    if wpb_slices is not None and len(wpb_slices) != n_slices:
        raise ValueError("wpb_slices must carry one table per slice")
    y0, cb0, cr0 = frames_yuv[0]
    mbh, mbw = y0.shape[0] // 16, y0.shape[1] // 16
    if not 1 <= n_slices <= mbh:
        raise ValueError(
            f"n_slices must be in [1, mb rows = {mbh}], got {n_slices}"
        )
    rows = [round(i * mbh / n_slices) for i in range(n_slices + 1)]
    starts = [r * mbw for r in rows]
    nals = [
        _nal(7, _sps_rbsp(w, h, max_ref_frames=2, poc_type=0,
                          profile=77)),
        _nal(8, _pps_rbsp(
            weighted_bipred_idc=1 if wpb_slices is not None else 0
        )),
    ]
    for k in range(n_slices):
        nals.append(_nal(5, _idr_slice_rbsp(
            y0, cb0, cr0, idr_pic_id=0, poc_lsb=0,
            first_mb=starts[k], n_mbs=starts[k + 1] - starts[k],
        )))
    stats_list: list[dict] = [
        _stats_zero(ipcm=mbh * mbw, n_slices=n_slices)
    ]
    prev_ref = frames_yuv[0]
    p_keys = ("skip", "p16", "p16x8", "p8x16", "p8x8", "p16r",
              "ipcm", "i16")
    b_keys = ("bl0", "bl1", "bbi", "bskip", "bdir", "b8x8",
              "b8_l0", "b8_l1", "b8_bi", "b8_dir", "b8_split",
              "b8_parts", "ipcm")
    for j in range(1, (len(frames_yuv) + 1) // 2):
        p_frame = frames_yuv[2 * j]
        b_frame = frames_yuv[2 * j - 1]
        ms_p = _MotionState(mbh, mbw)
        ms_p.slice_mb = np.full((mbh, mbw), -1, np.int64)
        pstats = _stats_zero(is_p=True, n_slices=n_slices)
        for k in range(n_slices):
            ms_p.cur_slice = k
            rbsp, st = _p_slice_rbsp(
                p_frame, prev_ref, j, p_candidates or [(0, 0)],
                poc_lsb=4 * j,
                first_mb=starts[k], n_mbs=starts[k + 1] - starts[k],
                ms=ms_p,
            )
            nals.append(_nal(1, rbsp, ref_idc=2))
            for kk in p_keys:
                pstats[kk] += st[kk]
        stats_list.append(pstats)
        # colocated motion of RefPicList1[0] (this P, ALL slices) for
        # the B's direct derivations — identical to the decoder's DPB
        col = (ms_p.mv.copy(), (ms_p.inter & ms_p.avail).copy())
        ms0, ms1 = _MotionState(mbh, mbw), _MotionState(mbh, mbw)
        ms0.slice_mb = ms1.slice_mb = np.full((mbh, mbw), -1, np.int64)
        bstats = _stats_zero(is_b=True, n_slices=n_slices)
        for k in range(n_slices):
            ms0.cur_slice = ms1.cur_slice = k
            rbsp, st = _b_slice_rbsp(
                b_frame, prev_ref, p_frame, j + 1, 4 * j - 2,
                l0_candidates, l1_candidates, bi_candidates,
                wpb=wpb_slices[k] if wpb_slices is not None else None,
                direct=direct, direct_col=col,
                direct_mode=direct_mode,
                direct_pocs=(4 * j - 2, 4 * j - 4, 4 * j),
                first_mb=starts[k], n_mbs=starts[k + 1] - starts[k],
                ms0=ms0, ms1=ms1,
            )
            nals.append(_nal(1, rbsp, ref_idc=0))
            for kk in b_keys:
                bstats[kk] += st[kk]
        stats_list.append(bstats)
        prev_ref = p_frame  # every P mode is exact → rec == src
    return nals, stats_list


def h264_encode_gop_bimp(
    frames_yuv: list[tuple], w: int, h: int,
    l0_candidates: list, l1_candidates: list, bi_candidates: list,
    p_candidates: list | None = None,
) -> tuple[list[bytes], list[dict]]:
    """Encode an I(BBP)* GOP under IMPLICIT weighted bi-prediction
    (weighted_bipred_idc 2): display order [I, B, B, P, B, B, P, ...]
    (length 1 + 3k), decode order [I, P, B, B, ...].  TWO consecutive
    non-reference B pictures sit UNEVENLY between their references
    (POC 2 and 4 of a 0..6 span), so the §8.4.2.3.1 POC-distance
    derivation produces genuinely asymmetric weights — (43, 21) for
    the early B, (22, 42) for the late one — which an equidistant
    IBPBP GOP could never distinguish from the default mean (its
    derivation lands exactly on 32/32).  No pred_weight_table is
    written: the decoder re-derives the weights from POC alone.
    Returns ([SPS, PPS, IDR, P, B, B, ...] NALs in decode order,
    per-picture stats in DECODE order)."""
    if len(frames_yuv) % 3 != 1:
        raise ValueError("I(BBP)* GOP needs 1 + 3k display frames")
    y0, cb0, cr0 = frames_yuv[0]
    nals = [
        _nal(7, _sps_rbsp(w, h, max_ref_frames=2, poc_type=0,
                          profile=77)),
        _nal(8, _pps_rbsp(weighted_bipred_idc=2)),
        _nal(5, _idr_slice_rbsp(y0, cb0, cr0, idr_pic_id=0, poc_lsb=0)),
    ]
    stats_list = [
        _stats_zero(ipcm=(y0.shape[0] // 16) * (y0.shape[1] // 16))
    ]
    prev_ref = frames_yuv[0]
    for j in range(1, len(frames_yuv) // 3 + 1):
        p_frame = frames_yuv[3 * j]
        poc0, poc1 = 6 * (j - 1), 6 * j
        rbsp, pstats = _p_slice_rbsp(
            p_frame, prev_ref, j, p_candidates or [(0, 0)],
            poc_lsb=poc1,
        )
        nals.append(_nal(1, rbsp, ref_idc=2))
        stats_list.append(pstats)
        for bi_idx in (1, 2):  # display indices 3j-2, 3j-1
            b_frame = frames_yuv[3 * j - 3 + bi_idx]
            curr_poc = poc0 + 2 * bi_idx
            rbsp, bstats = _b_slice_rbsp(
                b_frame, prev_ref, p_frame, j + 1, curr_poc,
                l0_candidates, l1_candidates, bi_candidates,
                implicit_pocs=(curr_poc, poc0, poc1),
            )
            nals.append(_nal(1, rbsp, ref_idc=0))
            stats_list.append(bstats)
        prev_ref = p_frame  # every P mode is exact → rec == src
    return nals, stats_list


def h264_decode_gop(
    nals: list[bytes],
) -> tuple[list[np.ndarray], list[dict]]:
    """Decode an access-unit sequence (SPS/PPS + one slice per
    picture) of the supported subset into a list of h×w×3 uint8 RGB
    frames plus per-frame macroblock-mode stats.

    Intra pictures: I_PCM and Intra_16x16 macroblocks, mixed freely —
    an I_PCM neighbour counts TotalCoeff 16, which always lands in
    the implemented formula-defined nC >= 8 FLC coeff_token column;
    only streams whose derived nC falls in the lookup-defined 2..7
    range are rejected.

    P pictures (§7.3.4, §8.4): P_Skip runs (``mb_skip_run``) and
    P_L0_16x16 with cbp 0, both reconstructed by FULL-PEL motion
    compensation from the previous decoded picture with picture-edge
    extension (§8.4.2.2.1), the real median MV predictor
    (§8.4.1.3) and P_Skip MV derivation (§8.4.1.1) — pan pictures
    legitimately produce skipped macroblocks with NONZERO derived
    motion; intra macroblock types ride along at mb_type − 5
    (Table 7-13), so a changed region can drop back to I_PCM
    (conditional replenishment); fractional-pel motion, sub-16x16
    partitions, and inter residuals ride the round-8/9 paths.
    Explicit weighted prediction (round 11): when the PPS asserts
    weighted_pred_flag, the §7.3.3.2 pred_weight_table parses from
    the P slice header and EVERY P inter prediction — P_Skip, all
    partition shapes, and the pre-residual prediction of the lossy
    path — is scaled through §8.4.2.3.2 eq. 8-270/8-271 before use,
    which is how fade GOPs stay inter-coded.

    B pictures (round 10): decoded from a reference-only DPB with
    nearest-POC L0/L1 selection, per-list median MV prediction, and
    the §8.4.2.3.2 rounded bi-prediction mean; output is reordered
    to display order by POC.  Explicit weighted bi-prediction
    (round 11, weighted_bipred_idc 1): the two-list pred_weight_table
    parses and one-list/bi predictions scale through eq. 8-270/8-272.
    B_Skip/B_Direct, B partitions, IMPLICIT weighted bi-prediction
    (idc 2), and B inter residuals stay honest
    NotImplementedError."""
    sps = pps = None
    frames: list[np.ndarray] = []
    stats_all: list[dict] = []
    # decoded-picture buffer of REFERENCE pictures only: (poc_key,
    # padded planes) in decode order, trimmed to the SPS sliding
    # window; non-reference B pictures never enter it
    ref_dpb: list[tuple[int, tuple]] = []
    order_keys: list[int] = []  # POC for poc_type 0, decode idx else
    seq = 0
    pic_open = False  # a multi-slice picture awaiting its next slice
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
            first_mb = br.ue()  # first_mb_in_slice (§7.4.3)
            slice_type = br.ue()
            is_b = False
            if slice_type % 5 == 2:
                is_p = False
            elif slice_type % 5 == 0:
                is_p = True
                if ntype == 5:
                    raise ValueError("IDR picture with a P slice")
                if not ref_dpb:
                    raise ValueError("P slice without a reference picture")
            elif slice_type % 5 == 1:
                is_p, is_b = False, True
                if ntype == 5:
                    raise ValueError("IDR picture with a B slice")
                if sps["poc_type"] != 0:
                    raise NotImplementedError(
                        "B slices need explicit output order "
                        "(pic_order_cnt_type 0)"
                    )
                if len(ref_dpb) < 2:
                    raise ValueError(
                        "B slice without two reference pictures"
                    )
            else:
                raise NotImplementedError(
                    "only I, P, and B slices are supported (no SP/SI)"
                )
            br.ue()  # pps id
            br.u(sps["log2_max_frame_num"])
            if ntype == 5:
                br.ue()  # idr_pic_id
            poc_lsb = None
            if sps["poc_type"] == 0:
                # no MSB-wrap handling: GOPs stay far below the
                # 2^log2_max_poc_lsb wrap (the encoder emits <128
                # pictures per IDR)
                poc_lsb = br.u(sps["log2_max_poc_lsb"])
            if pps["redundant_present"]:
                br.ue()  # redundant_pic_cnt
            wp = wpb = None
            if is_p:
                if br.u(1):  # num_ref_idx_active_override_flag
                    raise NotImplementedError(
                        "num_ref_idx_active override (one reference)"
                    )
                if br.u(1):  # ref_pic_list_modification_flag_l0 (§7.3.3.1)
                    raise NotImplementedError(
                        "reference picture list modification"
                    )
                if pps["weighted_pred"]:
                    # pred_weight_table (§7.3.3.2), one L0 reference;
                    # absent flags default to the identity weight
                    # 2^logWD with zero offset (§7.4.3.2)
                    luma_ld = br.ue()   # luma_log2_weight_denom
                    chroma_ld = br.ue()  # chroma_log2_weight_denom
                    if br.u(1):  # luma_weight_l0_flag
                        wy, oy = br.se(), br.se()
                    else:
                        wy, oy = 1 << luma_ld, 0
                    if br.u(1):  # chroma_weight_l0_flag
                        wcb, ocb = br.se(), br.se()
                        wcr, ocr = br.se(), br.se()
                    else:
                        wcb = wcr = 1 << chroma_ld
                        ocb = ocr = 0
                    wp = (luma_ld, wy, oy, chroma_ld,
                          wcb, ocb, wcr, ocr)
            direct_spatial = True
            if is_b:
                # direct_spatial_mv_pred_flag: 1 → §8.4.1.2.2 spatial
                # derivation, 0 → §8.4.1.2.3 temporal (colocated MV
                # scaled by POC distances)
                direct_spatial = bool(br.u(1))
                if br.u(1):  # num_ref_idx_active_override_flag
                    raise NotImplementedError(
                        "num_ref_idx_active override (one ref per list)"
                    )
                mod0 = br.u(1)  # ref_pic_list_modification_flag_l0
                mod1 = br.u(1)  # ref_pic_list_modification_flag_l1
                if mod0 or mod1:
                    raise NotImplementedError(
                        "reference picture list modification"
                    )
                if pps["weighted_bipred"] == 1:
                    # explicit weighted bi-prediction: the §7.3.3.2
                    # pred_weight_table with BOTH list loops (shared
                    # denominators; absent flags default to identity
                    # 2^logWD / 0 per §7.4.3.2)
                    luma_ld = br.ue()
                    chroma_ld = br.ue()
                    lsts = []
                    for _ in range(2):
                        if br.u(1):  # luma_weight_lX_flag
                            wy_, oy_ = br.se(), br.se()
                        else:
                            wy_, oy_ = 1 << luma_ld, 0
                        if br.u(1):  # chroma_weight_lX_flag
                            wcb_, ocb_ = br.se(), br.se()
                            wcr_, ocr_ = br.se(), br.se()
                        else:
                            wcb_ = wcr_ = 1 << chroma_ld
                            ocb_ = ocr_ = 0
                        lsts.append((wy_, oy_, wcb_, ocb_, wcr_, ocr_))
                    wpb = (luma_ld, chroma_ld, lsts[0], lsts[1])
                # idc 2 (implicit): weights derive from POC distances
                # once the reference pair is selected below — no
                # pred_weight_table to parse
            nal_ref_idc = (nal[0] >> 5) & 0x3
            if ntype == 5:
                br.u(1); br.u(1)  # dec_ref_pic_marking (IDR form)
            elif nal_ref_idc != 0:
                # dec_ref_pic_marking, non-IDR form (7.3.3.3)
                if br.u(1):  # adaptive_ref_pic_marking_mode_flag
                    raise NotImplementedError(
                        "adaptive reference-picture marking (MMCO)"
                    )
            qp = 26 + pps["init_qp_delta"] + br.se()  # slice_qp_delta
            if pps["dbf_present"]:
                # alpha/beta offsets are present whenever
                # disable_deblocking_filter_idc != 1 (7.3.3), i.e. for
                # idc 0 AND 2 — not only idc 0.
                if br.ue() != 1:
                    br.se(); br.se()
            mbw, mbh = sps["mb_w"], sps["mb_h"]
            total_mbs = mbh * mbw
            if first_mb == 0:
                # ---- new picture: per-PICTURE state ----
                if pic_open:
                    raise ValueError(
                        "new picture before the previous multi-slice "
                        "picture completed"
                    )
                y = np.zeros((mbh * 16, mbw * 16), np.int64)
                cb = np.zeros((mbh * 8, mbw * 8), np.int64)
                cr = np.zeros((mbh * 8, mbw * 8), np.int64)
                is_pcm = np.zeros((mbh, mbw), bool)
                # per-4x4-luma-block AC TotalCoeff grid for nC
                # (§9.2.1); I_PCM blocks count 16.  Chroma AC blocks
                # keep their own per-plane grids (2x2 per MB/plane).
                nc_grid = np.zeros((mbh * 4, mbw * 4), np.int64)
                nc_c = [
                    np.zeros((mbh * 2, mbw * 2), np.int64),
                    np.zeros((mbh * 2, mbw * 2), np.int64),
                ]
                # per-MB slice ownership: §6.4.9 makes a neighbour in
                # another slice UNAVAILABLE for every prediction (MV,
                # skip derivation, intra, and CAVLC nC)
                slice_mb = np.full((mbh, mbw), -1, np.int64)
                slice_idx = 0
                addr = 0
                pic_open = True

                def _nc_in(grid, gx: int, gy: int) -> int:
                    g = grid.shape[0] // mbh  # blocks/MB edge: 4 or 2
                    has_a = (
                        gx > 0
                        and slice_mb[gy // g, (gx - 1) // g] == slice_idx
                    )
                    has_b = (
                        gy > 0
                        and slice_mb[(gy - 1) // g, gx // g] == slice_idx
                    )
                    if has_a and has_b:
                        return int(
                            (grid[gy, gx - 1] + grid[gy - 1, gx] + 1) >> 1
                        )
                    if has_a:
                        return int(grid[gy, gx - 1])
                    if has_b:
                        return int(grid[gy - 1, gx])
                    return 0

                def _nc_of(gx: int, gy: int) -> int:
                    return _nc_in(nc_grid, gx, gy)
                # P-slice motion state: per-MB mv (quarter-pel) +
                # inter flag for the §8.4.1.3 predictor; slice-aware
                # so cross-slice neighbours go unavailable
                ms = _MotionState(mbh, mbw)
                ms.slice_mb = slice_mb
                ms.cur_slice = 0
                if is_b:
                    # B-slice per-PICTURE motion states, one per
                    # reference list, sharing the picture's slice
                    # grid: §6.4.9 makes cross-slice neighbours
                    # unavailable to per-list medians AND the
                    # §8.4.1.2.2 spatial-direct derivation, which is
                    # what re-anchors direct mode at every slice's
                    # first row in multi-slice B pictures (round 12)
                    ms0 = _MotionState(mbh, mbw)
                    ms1 = _MotionState(mbh, mbw)
                    ms0.slice_mb = ms1.slice_mb = slice_mb
                    ms0.cur_slice = ms1.cur_slice = 0
                stats = _stats_zero(is_p=is_p, is_b=is_b)
            else:
                # ---- continuation slice of the open picture ----
                if not pic_open:
                    raise ValueError(
                        "first_mb_in_slice > 0 without an open picture"
                    )
                if first_mb != addr:
                    raise ValueError(
                        f"slice gap/overlap: picture decoded to MB "
                        f"{addr}, slice starts at {first_mb}"
                    )
                if (is_p, is_b) != (stats["is_p"], stats["is_b"]):
                    raise NotImplementedError(
                        "mixed slice types within one picture"
                    )
                slice_idx += 1
                ms.cur_slice = slice_idx
                if is_b:
                    ms0.cur_slice = ms1.cur_slice = slice_idx
            if wp is not None:
                # echo the parsed pred_weight_table so oracle gates
                # can pin the header round-trip from the stats alone
                stats["wp_log2_denom"] = wp[0]
                stats["wp_luma_w"], stats["wp_luma_off"] = wp[1], wp[2]
                stats["wp_cb_w"], stats["wp_cb_off"] = wp[4], wp[5]
                stats["wp_cr_w"], stats["wp_cr_off"] = wp[6], wp[7]
            if wpb is not None:
                # echo the two-list table for the oracle gates
                stats["wpb_log2_denom"] = wpb[0]
                stats["wpb_l0_w"], stats["wpb_l0_off"] = (
                    wpb[2][0], wpb[2][1],
                )
                stats["wpb_l1_w"], stats["wpb_l1_off"] = (
                    wpb[3][0], wpb[3][1],
                )
                # multi-slice B pictures carry one table PER SLICE:
                # accumulate the L0 luma weights so a gate can pin
                # every slice's table from the picture stats alone
                stats["wpb_luma_w_sum"] = (
                    stats.get("wpb_luma_w_sum", 0) + wpb[2][0]
                )

            def _wpl(p):
                return p if wp is None else _wp_plane(p, wp[1], wp[2], wp[0])

            def _wpcb(p):
                return p if wp is None else _wp_plane(p, wp[4], wp[5], wp[3])

            def _wpcr(p):
                return p if wp is None else _wp_plane(p, wp[6], wp[7], wp[3])

            key = poc_lsb if sps["poc_type"] == 0 else 2 * seq
            if is_p:
                # RefPicList0[0] for P = the most recently decoded
                # reference picture (descending PicNum, §8.2.4.2.1)
                ry, rcb, rcr = ref_dpb[-1][1]
            if is_b:
                # RefPicList init for B (§8.2.4.2.3): L0[0] = nearest
                # PAST reference by POC, L1[0] = nearest FUTURE one
                past = max(
                    (e for e in ref_dpb if e[0] < key),
                    key=lambda e: e[0],
                    default=None,
                )
                fut = min(
                    (e for e in ref_dpb if e[0] > key),
                    key=lambda e: e[0],
                    default=None,
                )
                if past is None or fut is None:
                    raise ValueError(
                        "B slice needs references on both temporal sides"
                    )
                r0y, r0cb, r0cr = past[1]
                r1y, r1cb, r1cr = fut[1]
                col_fut = fut[2]  # colocated motion (RefPicList1[0])
                b_pocs = (key, past[0], fut[0])  # temporal-direct POCs
                wbi = None
                if pps["weighted_bipred"] == 2:
                    # implicit mode (§8.4.2.3.1): POC-distance
                    # weights, re-derived — never signalled; one-list
                    # predictions stay unweighted
                    wbi = _implicit_bi_weights(key, past[0], fut[0])
                    stats["wbi_w0"], stats["wbi_w1"] = wbi
                # per-list motion states are per-PICTURE (created at
                # first_mb == 0), so continuation slices of a
                # multi-slice B picture extend the same fields
            pending_skips = 0
            need_run = is_p or is_b
            while addr < total_mbs:
                my, mx = divmod(addr, mbw)
                slice_mb[my, mx] = slice_idx
                if need_run:
                    if not br.more_rbsp_data():
                        break  # slice ends after a coded macroblock
                    pending_skips = br.ue()
                    need_run = False
                if pending_skips > 0 and is_b:
                    # B_Skip (§8.4.1.2.2 spatial direct): derive the
                    # per-list refIdx/medians + per-8x8 colZeroFlag
                    # against the colocated L1 reference and
                    # reconstruct; derived motion feeds later medians
                    pending_skips -= 1
                    if direct_spatial:
                        use0, use1, blocks = _spatial_direct(
                            ms0, ms1, mx, my, col_fut
                        )
                    else:
                        use0 = use1 = True
                        blocks = _temporal_direct(
                            mx, my, col_fut, *b_pocs
                        )
                    sy_, scb_, scr_ = _direct_mb_pred(
                        (r0y, r0cb, r0cr), (r1y, r1cb, r1cr),
                        mx, my, use0, use1, blocks,
                        wpb=wpb, wbi=wbi,
                    )
                    y[my * 16 : my * 16 + 16,
                      mx * 16 : mx * 16 + 16] = sy_
                    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = scb_
                    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = scr_
                    _direct_update_ms(ms0, ms1, mx, my,
                                      use0, use1, blocks)
                    stats["bskip"] += 1
                    addr += 1
                    continue
                if pending_skips > 0:
                    pending_skips -= 1
                    mv = _pskip_mv(ms, mx, my)
                    sy, scb, scr = _wp_planes(
                        _mc_mb_planes(ry, rcb, rcr, mx, my, mv),
                        wp,
                    )
                    y[my * 16 : my * 16 + 16,
                      mx * 16 : mx * 16 + 16] = sy
                    cb[my * 8 : my * 8 + 8,
                       mx * 8 : mx * 8 + 8] = scb
                    cr[my * 8 : my * 8 + 8,
                       mx * 8 : mx * 8 + 8] = scr
                    ms.set_mb(mx, my, mv)
                    stats["skip"] += 1
                    addr += 1
                    # after the run: the next symbol is the coded
                    # MB the run preceded (§7.3.4), not a new run
                    continue
                if not br.more_rbsp_data():
                    break  # slice data exhausted (trailing run / I end)
                mb_type = br.ue()
                addr += 1
                if is_b:
                    need_run = True
                    if mb_type == 0:
                        # B_Direct_16x16 (Table 7-14): same spatial
                        # derivation as B_Skip, plus a coded_block_
                        # pattern (residuals stay out of scope)
                        cbp_i = _CBP_INTER_DEC.get(br.ue())
                        if cbp_i is None:
                            raise NotImplementedError(
                                "coded_block_pattern beyond the "
                                "transcribed Table 9-4 Inter prefix"
                            )
                        if cbp_i != 0:
                            raise NotImplementedError(
                                "inter residuals on B_Direct_16x16"
                            )
                        if direct_spatial:
                            use0, use1, blocks = _spatial_direct(
                                ms0, ms1, mx, my, col_fut
                            )
                        else:
                            use0 = use1 = True
                            blocks = _temporal_direct(
                                mx, my, col_fut, *b_pocs
                            )
                        sy_, scb_, scr_ = _direct_mb_pred(
                            (r0y, r0cb, r0cr), (r1y, r1cb, r1cr),
                            mx, my, use0, use1, blocks,
                            wpb=wpb, wbi=wbi,
                        )
                        y[my * 16 : my * 16 + 16,
                          mx * 16 : mx * 16 + 16] = sy_
                        cb[my * 8 : my * 8 + 8,
                           mx * 8 : mx * 8 + 8] = scb_
                        cr[my * 8 : my * 8 + 8,
                           mx * 8 : mx * 8 + 8] = scr_
                        _direct_update_ms(ms0, ms1, mx, my,
                                          use0, use1, blocks)
                        stats["bdir"] += 1
                        continue
                    if mb_type in (1, 2, 3):
                        # B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
                        # (Table 7-14); each list keeps its own
                        # §8.4.1.3 motion state, and a one-list MB
                        # contributes refIdx −1 to the other list
                        use_l0 = mb_type in (1, 3)
                        use_l1 = mb_type in (2, 3)
                        mv0 = mv1 = None
                        if use_l0:  # mvd_l0 precedes mvd_l1
                            mvp = _mvp_16x16(ms0, mx, my)
                            mv0 = (mvp[0] + br.se(),
                                   mvp[1] + br.se())
                        if use_l1:
                            mvp = _mvp_16x16(ms1, mx, my)
                            mv1 = (mvp[0] + br.se(),
                                   mvp[1] + br.se())
                        cbp_i = _CBP_INTER_DEC.get(br.ue())
                        if cbp_i is None:
                            raise NotImplementedError(
                                "coded_block_pattern beyond the "
                                "transcribed Table 9-4 Inter "
                                "prefix (codeNum 0..12)"
                            )
                        if cbp_i != 0:
                            raise NotImplementedError(
                                "inter residuals in B slices"
                            )
                        if use_l0:
                            p0 = _mc_mb_planes(
                                r0y, r0cb, r0cr, mx, my, mv0
                            )
                            ms0.set_mb(mx, my, mv0)
                        else:
                            ms0.set_intra(mx, my)
                        if use_l1:
                            p1 = _mc_mb_planes(
                                r1y, r1cb, r1cr, mx, my, mv1
                            )
                            ms1.set_mb(mx, my, mv1)
                        else:
                            ms1.set_intra(mx, my)
                        if use_l0 and use_l1:
                            # bi-prediction (§8.4.2.3.2): the rounded
                            # mean at weighted_bipred_idc 0, the
                            # explicit eq. 8-272 weighting at idc 1,
                            # POC-distance implicit weights at idc 2
                            if wbi is not None:
                                outp = tuple(
                                    _wpb_bi_plane(
                                        a, b, wbi[0], wbi[1], 0, 0, 5
                                    ).astype(np.int64)
                                    for a, b in zip(p0, p1)
                                )
                            else:
                                outp = tuple(
                                    q.astype(np.int64)
                                    for q in _wpb_bi(p0, p1, wpb)
                                )
                            stats["bbi"] += 1
                        elif use_l0:
                            outp = tuple(
                                q.astype(np.int64)
                                for q in _wpb_single(p0, wpb, 0)
                            )
                            stats["bl0"] += 1
                        else:
                            outp = tuple(
                                q.astype(np.int64)
                                for q in _wpb_single(p1, wpb, 1)
                            )
                            stats["bl1"] += 1
                        y[my * 16 : my * 16 + 16,
                          mx * 16 : mx * 16 + 16] = outp[0]
                        cb[my * 8 : my * 8 + 8,
                           mx * 8 : mx * 8 + 8] = outp[1]
                        cr[my * 8 : my * 8 + 8,
                           mx * 8 : mx * 8 + 8] = outp[2]
                        continue
                    if mb_type == 22:
                        # B_8x8 (Table 7-14, round 12): four Table
                        # 7-18 sub-macroblocks, each one-list or bi
                        subs = [br.ue() for _ in range(4)]
                        if any(t > 12 for t in subs):
                            raise ValueError(
                                "sub_mb_type beyond Table 7-18 "
                                "(max 12)"
                            )
                        mb_drv = None
                        if any(t == 0 for t in subs):
                            # B_Direct_8x8 (round 12): the MB-level
                            # direct derivation (spatial consults
                            # only outside-the-MB neighbours; safe
                            # before this MB's state updates), each
                            # direct sub-block taking its raster
                            # 8x8 entry
                            if direct_spatial:
                                mb_drv = _spatial_direct(
                                    ms0, ms1, mx, my, col_fut
                                )
                            else:
                                mb_drv = (True, True,
                                          _temporal_direct(
                                              mx, my, col_fut,
                                              *b_pocs))
                        # §7.3.5.2: ALL mvd_l0 in mbPartIdx order,
                        # then all mvd_l1; each list's median
                        # derivation sees earlier sub-blocks' state,
                        # and one-list sub-blocks mark the other
                        # list refIdx −1 as the loop passes them
                        smv = [[None] * 4, [None] * 4]
                        for lst, msx in ((0, ms0), (1, ms1)):
                            uses = (1, 3) if lst == 0 else (2, 3)
                            for part in range(4):
                                (lx, ly, _w, _h), _c = (
                                    _PART_GEOM8[part]
                                )
                                bx0 = mx * 4 + lx // 4
                                by0 = my * 4 + ly // 4
                                st = subs[part]
                                if st == 0:
                                    duse0, duse1, dblocks = mb_drv
                                    used = (duse0 if lst == 0
                                            else duse1)
                                    if used:
                                        msx.set_part(
                                            bx0, by0, 2, 2,
                                            dblocks[part][lst],
                                        )
                                    else:
                                        msx.set_part(
                                            bx0, by0, 2, 2, (0, 0),
                                            inter=False,
                                        )
                                elif st <= 3 and st in uses:
                                    mvp = _mvp_part(
                                        msx, bx0, by0, 2, 2,
                                        "8x8", part,
                                    )
                                    mv = (mvp[0] + br.se(),
                                          mvp[1] + br.se())
                                    smv[lst][part] = mv
                                    msx.set_part(bx0, by0, 2, 2, mv)
                                elif st > 3:
                                    # sub-8x8 split (round 12): one
                                    # mvd per sub-partition for the
                                    # used list(s), general §8.4.1.3
                                    # median at each sub-partition's
                                    # own granularity
                                    kind, usage = _B_SUB_SPLIT[st]
                                    used = (usage == 2
                                            or usage == lst)
                                    if used:
                                        pmvs = []
                                        for dx4, dy4, w4, h4 in (
                                            _SUB_GEOM[kind]
                                        ):
                                            sx0 = bx0 + dx4
                                            sy0 = by0 + dy4
                                            mvp = _mvp_part(
                                                msx, sx0, sy0,
                                                w4, h4, "sub", 0,
                                            )
                                            mv = (mvp[0] + br.se(),
                                                  mvp[1] + br.se())
                                            pmvs.append(mv)
                                            msx.set_part(
                                                sx0, sy0, w4, h4, mv
                                            )
                                        smv[lst][part] = pmvs
                                    else:
                                        msx.set_part(
                                            bx0, by0, 2, 2, (0, 0),
                                            inter=False,
                                        )
                                else:
                                    msx.set_part(
                                        bx0, by0, 2, 2, (0, 0),
                                        inter=False,
                                    )
                        cbp_i = _CBP_INTER_DEC.get(br.ue())
                        if cbp_i is None:
                            raise NotImplementedError(
                                "coded_block_pattern beyond the "
                                "transcribed Table 9-4 Inter prefix"
                            )
                        if cbp_i != 0:
                            raise NotImplementedError(
                                "inter residuals in B slices"
                            )
                        def _fetch(geom, ref3, mv):
                            (flx, fly, flw, flh), (fcx, fcy, fcw,
                                                   fch) = geom
                            ryy, rcbb, rcrr = ref3
                            return (
                                _interp_luma_block(
                                    ryy, mx * 16 + flx,
                                    my * 16 + fly, flw, flh,
                                    mv[0], mv[1],
                                ),
                                _interp_chroma_block(
                                    rcbb, mx * 8 + fcx,
                                    my * 8 + fcy, fcw, fch,
                                    mv[0], mv[1],
                                ),
                                _interp_chroma_block(
                                    rcrr, mx * 8 + fcx,
                                    my * 8 + fcy, fcw, fch,
                                    mv[0], mv[1],
                                ),
                            )

                        def _combine(geom, usage, mv0_, mv1_):
                            if usage == 0:
                                return _wpb_single(
                                    _fetch(geom, (r0y, r0cb, r0cr),
                                           mv0_), wpb, 0,
                                )
                            if usage == 1:
                                return _wpb_single(
                                    _fetch(geom, (r1y, r1cb, r1cr),
                                           mv1_), wpb, 1,
                                )
                            p0 = _fetch(geom, (r0y, r0cb, r0cr),
                                        mv0_)
                            p1 = _fetch(geom, (r1y, r1cb, r1cr),
                                        mv1_)
                            if wbi is not None:
                                return tuple(
                                    _wpb_bi_plane(
                                        a, b, wbi[0], wbi[1],
                                        0, 0, 5,
                                    )
                                    for a, b in zip(p0, p1)
                                )
                            return _wpb_bi(p0, p1, wpb)

                        def _emit(geom, outp):
                            (flx, fly, flw, flh), (fcx, fcy, fcw,
                                                   fch) = geom
                            y[my * 16 + fly : my * 16 + fly + flh,
                              mx * 16 + flx : mx * 16 + flx + flw] \
                                = outp[0]
                            cb[my * 8 + fcy : my * 8 + fcy + fch,
                               mx * 8 + fcx : mx * 8 + fcx + fcw] \
                                = outp[1]
                            cr[my * 8 + fcy : my * 8 + fcy + fch,
                               mx * 8 + fcx : mx * 8 + fcx + fcw] \
                                = outp[2]

                        for part in range(4):
                            st = subs[part]
                            if st == 0:
                                duse0, duse1, dblocks = mb_drv
                                _emit(
                                    _PART_GEOM8[part],
                                    _direct_part_pred(
                                        (r0y, r0cb, r0cr),
                                        (r1y, r1cb, r1cr),
                                        mx, my, part, duse0, duse1,
                                        dblocks, wpb=wpb, wbi=wbi,
                                    ),
                                )
                                stats["b8_dir"] += 1
                            elif st <= 3:
                                _emit(
                                    _PART_GEOM8[part],
                                    _combine(
                                        _PART_GEOM8[part], st - 1,
                                        smv[0][part], smv[1][part],
                                    ),
                                )
                                stats[{1: "b8_l0", 2: "b8_l1",
                                       3: "b8_bi"}[st]] += 1
                            else:
                                kind, usage = _B_SUB_SPLIT[st]
                                geoms = _b_subpart_geoms(part, kind)
                                for i, geom in enumerate(geoms):
                                    mv0_ = (smv[0][part][i]
                                            if usage != 1 else None)
                                    mv1_ = (smv[1][part][i]
                                            if usage != 0 else None)
                                    _emit(
                                        geom,
                                        _combine(geom, usage,
                                                 mv0_, mv1_),
                                    )
                                stats[{0: "b8_l0", 1: "b8_l1",
                                       2: "b8_bi"}[usage]] += 1
                                stats["b8_split"] += 1
                                stats["b8_parts"] += len(geoms)
                        stats["b8x8"] += 1
                        continue
                    if mb_type < 22:
                        raise NotImplementedError(
                            f"B mb_type {mb_type}: partitions "
                            "below 16x16 in B slices"
                        )
                    mb_type -= 23  # intra types in B (Table 7-14)
                if is_p:
                    need_run = True
                    if mb_type == 0:  # P_L0_16x16 (Table 7-13)
                        mvp = _mvp_16x16(ms, mx, my)
                        mv = (mvp[0] + br.se(), mvp[1] + br.se())
                        # coded_block_pattern me(v), Table 9-4
                        # Inter column (transcribed prefix)
                        cbp_i = _CBP_INTER_DEC.get(br.ue())
                        if cbp_i is None:
                            raise NotImplementedError(
                                "coded_block_pattern beyond the "
                                "transcribed Table 9-4 Inter "
                                "prefix (codeNum 0..12)"
                            )
                        # weighted prediction (when the PPS asserts
                        # it) scales the MC prediction BEFORE any
                        # residual is added (§8.4.2.3)
                        py, pcb, pcr = (
                            p.astype(np.int64)
                            for p in _wp_planes(
                                _mc_mb_planes(
                                    ry, rcb, rcr, mx, my, mv
                                ),
                                wp,
                            )
                        )
                        ms.set_mb(mx, my, mv)
                        y0_, x0_ = my * 16, mx * 16
                        cy0_, cx0_ = my * 8, mx * 8
                        if cbp_i == 0:
                            y[y0_ : y0_ + 16, x0_ : x0_ + 16] = py
                            cb[cy0_ : cy0_ + 8, cx0_ : cx0_ + 8] = pcb
                            cr[cy0_ : cy0_ + 8, cx0_ : cx0_ + 8] = pcr
                            stats["p16"] += 1
                            continue
                        # inter residuals (§7.3.5.3.2/.3): luma
                        # LumaLevel4x4 per coded 8x8 quadrant (all
                        # 16 scan positions — no DC/AC split),
                        # then chroma DC + (cbpC 2) chroma AC,
                        # all added to the MC prediction
                        cbpl_i, cbpc_i = cbp_i & 15, cbp_i >> 4
                        qp = min(51, max(0, qp + br.se()))
                        gx0, gy0 = mx * 4, my * 4
                        # parse sequentially (CAVLC + nC bookkeeping),
                        # then dequant + inverse-transform all 16
                        # blocks as one batch (uncoded blocks hold
                        # zero coefficients -> zero residual)
                        c16m = np.zeros((16, 16), np.int64)
                        for bi in range(16):
                            bx, by = _BLK_SCAN[bi]
                            if not cbpl_i & (1 << (bi // 4)):
                                continue
                            nc = _nc_of(gx0 + bx, gy0 + by)
                            c16 = cavlc_decode_block(
                                br, ct_dec=_ct_dec_for_nc(nc)
                            )
                            nc_grid[gy0 + by, gx0 + bx] = (
                                16 - c16.count(0)
                            )
                            c16m[bi] = c16
                        cm = np.zeros((16, 16), np.int64)
                        cm[:, _ZZ4_ARR] = c16m
                        d = _ac_dequant_batch(cm.reshape(16, 4, 4), qp)
                        r = (_inv_transform4x4_batch(d) + 32) >> 6
                        y[y0_ : y0_ + 16, x0_ : x0_ + 16] = _uclip(
                            py + _mb_from_blocks(r), 0, 255
                        )
                        qpc = _chroma_qpc(qp)
                        dccs = []
                        if cbpc_i:
                            for _ in range(2):
                                cc = cavlc_decode_block(
                                    br, _CT_NCM1_DEC, _TZ_CDC_DEC,
                                    max_coeff=4,
                                )
                                dccs.append(
                                    _chroma_dc_dequant(cc, qpc)
                                )
                        for pi, (plane, cpred) in enumerate(
                            ((cb, pcb), (cr, pcr))
                        ):
                            if cbpc_i == 2:
                                cgx0, cgy0 = mx * 2, my * 2
                                cacs = np.zeros((4, 15), np.int64)
                                for cbi in range(4):
                                    cbx, cby = cbi % 2, cbi // 2
                                    cac = cavlc_decode_block(
                                        br,
                                        ct_dec=_ct_dec_for_nc(
                                            _nc_in(
                                                nc_c[pi],
                                                cgx0 + cbx,
                                                cgy0 + cby,
                                            )
                                        ),
                                        max_coeff=15,
                                    )
                                    nc_c[pi][
                                        cgy0 + cby, cgx0 + cbx
                                    ] = 15 - cac.count(0)
                                    cacs[cbi] = cac
                                cm = np.zeros((4, 16), np.int64)
                                cm[:, _ZZ4_ARR[1:]] = cacs
                                d = _ac_dequant_batch(
                                    cm.reshape(4, 4, 4), qpc
                                )
                                d[:, 0, 0] = dccs[pi].reshape(4)
                                r = (
                                    _inv_transform4x4_batch(d) + 32
                                ) >> 6
                                out8 = _uclip(
                                    cpred
                                    + r.reshape(2, 2, 4, 4)
                                    .swapaxes(1, 2)
                                    .reshape(8, 8),
                                    0,
                                    255,
                                )
                            elif cbpc_i:
                                rc = (dccs[pi] + 32) >> 6
                                out8 = _uclip(
                                    cpred
                                    + np.repeat(
                                        np.repeat(rc, 4, axis=0),
                                        4,
                                        axis=1,
                                    ),
                                    0,
                                    255,
                                )
                            else:
                                out8 = cpred
                            plane[
                                cy0_ : cy0_ + 8, cx0_ : cx0_ + 8
                            ] = out8
                        stats["p16r"] += 1
                        continue
                    if mb_type in (1, 2):
                        # P_L0_L0_16x8 / P_L0_L0_8x16 (Table
                        # 7-13): two partitions, each with its own
                        # mvd against the §8.4.1.3.1 DIRECTIONAL
                        # predictor; partition 0's reconstructed
                        # mv feeds partition 1's derivation
                        kind = "16x8" if mb_type == 1 else "8x16"
                        pmvs = []
                        for part in range(2):
                            (lx, ly, lw, lh), _c = (
                                _PART_GEOM[kind][part]
                            )
                            bx0 = mx * 4 + lx // 4
                            by0 = my * 4 + ly // 4
                            mvp = _mvp_part(
                                ms, bx0, by0, lw // 4, lh // 4,
                                kind, part,
                            )
                            pmv = (mvp[0] + br.se(),
                                   mvp[1] + br.se())
                            ms.set_part(
                                bx0, by0, lw // 4, lh // 4, pmv
                            )
                            pmvs.append(pmv)
                        if br.ue() != 0:
                            raise NotImplementedError(
                                "inter residuals on sub-16x16 "
                                "partitions (cbp != 0)"
                            )
                        for part, pmv in enumerate(pmvs):
                            (lx, ly, lw, lh), (cx, cy, cw, ch) = (
                                _PART_GEOM[kind][part]
                            )
                            y[my * 16 + ly : my * 16 + ly + lh,
                              mx * 16 + lx : mx * 16 + lx + lw] = (
                                _wpl(_interp_luma_block(
                                    ry, mx * 16 + lx, my * 16 + ly,
                                    lw, lh, pmv[0], pmv[1],
                                ))
                            )
                            for plane, rp, wfn in (
                                (cb, rcb, _wpcb), (cr, rcr, _wpcr)
                            ):
                                plane[
                                    my * 8 + cy : my * 8 + cy + ch,
                                    mx * 8 + cx : mx * 8 + cx + cw,
                                ] = wfn(_interp_chroma_block(
                                    rp, mx * 8 + cx, my * 8 + cy,
                                    cw, ch, pmv[0], pmv[1],
                                ))
                        stats["p16x8" if kind == "16x8"
                              else "p8x16"] += 1
                        continue
                    if mb_type == 3:  # P_8x8 (Table 7-13)
                        # §7.3.5.2: four sub_mb_types first, then
                        # mvds per (mbPartIdx, subMbPartIdx); the
                        # whole Table 7-17 split ladder decodes
                        # (8x8/8x4/4x8/4x4), each sub-partition
                        # predicted by the general §8.4.1.3
                        # median over its 4x4-granular neighbours
                        sub_types = [br.ue() for _ in range(4)]
                        if any(s > 3 for s in sub_types):
                            raise NotImplementedError(
                                f"sub_mb_type {max(sub_types)} "
                                "(B sub-macroblock types)"
                            )
                        smvs = []
                        for part in range(4):
                            (lx, ly, _lw, _lh), _c = (
                                _PART_GEOM8[part]
                            )
                            pbx = mx * 4 + lx // 4
                            pby = my * 4 + ly // 4
                            for dx4, dy4, w4, h4 in _SUB_GEOM[
                                sub_types[part]
                            ]:
                                bx0, by0 = pbx + dx4, pby + dy4
                                mvp = _mvp_part(
                                    ms, bx0, by0, w4, h4, "sub", 0
                                )
                                pmv = (mvp[0] + br.se(),
                                       mvp[1] + br.se())
                                ms.set_part(bx0, by0, w4, h4, pmv)
                                smvs.append((bx0, by0, w4, h4, pmv))
                        if br.ue() != 0:
                            raise NotImplementedError(
                                "inter residuals on P_8x8 "
                                "sub-macroblocks (cbp != 0)"
                            )
                        for bx0, by0, w4, h4, pmv in smvs:
                            lx_, ly_ = bx0 * 4, by0 * 4
                            y[ly_ : ly_ + h4 * 4,
                              lx_ : lx_ + w4 * 4] = (
                                _wpl(_interp_luma_block(
                                    ry, lx_, ly_, w4 * 4, h4 * 4,
                                    pmv[0], pmv[1],
                                ))
                            )
                            cxp, cyp = bx0 * 2, by0 * 2
                            for plane, rp, wfn in (
                                (cb, rcb, _wpcb), (cr, rcr, _wpcr)
                            ):
                                plane[
                                    cyp : cyp + h4 * 2,
                                    cxp : cxp + w4 * 2,
                                ] = wfn(_interp_chroma_block(
                                    rp, cxp, cyp, w4 * 2, h4 * 2,
                                    pmv[0], pmv[1],
                                ))
                        stats["p8x8"] += 1
                        continue
                    if mb_type == 4:
                        raise NotImplementedError(
                            "P_8x8ref0 macroblocks"
                        )
                    mb_type -= 5  # intra types in P (Table 7-13)
                if mb_type == 25:  # I_PCM
                    stats["ipcm"] += 1
                    if is_p:
                        ms.set_intra(mx, my)
                    if is_b:
                        ms0.set_intra(mx, my)
                        ms1.set_intra(mx, my)
                    is_pcm[my, mx] = True
                    nc_grid[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
                    for g in nc_c:
                        g[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
                    br.align_zero()
                    y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                        np.frombuffer(br.raw(256), np.uint8)
                        .reshape(16, 16)
                        .astype(np.int64)
                    )
                    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        np.frombuffer(br.raw(64), np.uint8)
                        .reshape(8, 8)
                        .astype(np.int64)
                    )
                    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        np.frombuffer(br.raw(64), np.uint8)
                        .reshape(8, 8)
                        .astype(np.int64)
                    )
                    continue
                if not 1 <= mb_type <= 24:
                    raise NotImplementedError(
                        f"mb_type {mb_type}: I_NxN macroblocks require "
                        "per-4x4 prediction + AC residual decoding"
                    )
                # I_16x16_<pred>_<cbpC>_<cbpL> (Table 7-11)
                stats["i16"] += 1
                if is_p:
                    ms.set_intra(mx, my)
                if is_b:
                    ms0.set_intra(mx, my)
                    ms1.set_intra(mx, my)
                pred_mode = (mb_type - 1) % 4
                cbp_chroma = ((mb_type - 1) // 4) % 3
                cbp_luma = 15 * ((mb_type - 1) // 12)
                if br.ue() != 0:
                    raise NotImplementedError(
                        "non-DC intra_chroma_pred_mode"
                    )
                qp = min(51, max(0, qp + br.se()))  # mb_qp_delta
                gx0, gy0 = mx * 4, my * 4

                def _ct_dec_for(nc: int):
                    # nC < 2: transcribed VLC column; nC >= 8:
                    # formula-defined 6-bit FLC column (covers
                    # I_PCM neighbours, which count 16); the
                    # lookup-defined middle columns stay honest
                    if nc < 2:
                        return _CT_NC02_DEC
                    if nc >= 8:
                        return _CT_NC8_DEC
                    raise NotImplementedError(
                        "coeff_token columns for 2 <= nC < 8 are "
                        "not implemented (lookup-defined in the "
                        "spec; no codec libs to transcribe them "
                        "against — the nC >= 8 column IS "
                        "implemented because it is a formula)"
                    )

                # Intra16x16DCLevel: nC derived as for blkIdx 0
                c_zz = cavlc_decode_block(
                    br, ct_dec=_ct_dec_for(_nc_of(gx0, gy0))
                )
                y0, x0 = my * 16, mx * 16
                # §6.4.9: intra-prediction neighbours in a DIFFERENT
                # slice are unavailable (single-slice pictures: every
                # decoded MB owns slice 0, so this reduces to bounds)
                avail_top = my > 0 and slice_mb[my - 1, mx] == slice_idx
                avail_left = mx > 0 and slice_mb[my, mx - 1] == slice_idx
                pred = _intra16_pred_luma(
                    pred_mode,
                    y[y0 - 1, x0 : x0 + 16] if avail_top else None,
                    y[y0 : y0 + 16, x0 - 1] if avail_left else None,
                    y[y0 - 1, x0 - 1]
                    if (avail_top and avail_left)
                    else 0,
                    avail_top,
                    avail_left,
                )
                dc = _luma_dc_dequant(c_zz, qp)
                if cbp_luma:
                    # Intra16x16ACLevel, 16 blocks in §6.4.3 z-scan;
                    # real nC bookkeeping per block during the parse,
                    # then one batched dequant + inverse transform
                    acm = np.empty((16, 15), np.int64)
                    for bi in range(16):
                        bx, by = _BLK_SCAN[bi]
                        ac = cavlc_decode_block(
                            br,
                            ct_dec=_ct_dec_for(
                                _nc_of(gx0 + bx, gy0 + by)
                            ),
                            max_coeff=15,
                        )
                        nc_grid[gy0 + by, gx0 + bx] = 15 - ac.count(0)
                        acm[bi] = ac
                    cm = np.zeros((16, 16), np.int64)
                    cm[:, _ZZ4_ARR[1:]] = acm
                    d = _ac_dequant_batch(cm.reshape(16, 4, 4), qp)
                    d[:, 0, 0] = dc[_BLK_SCAN_BY, _BLK_SCAN_BX]
                    r = (_inv_transform4x4_batch(d) + 32) >> 6
                    y[y0 : y0 + 16, x0 : x0 + 16] = _uclip(
                        pred + _mb_from_blocks(r), 0, 255
                    )
                else:
                    r = (dc + 32) >> 6
                    y[y0 : y0 + 16, x0 : x0 + 16] = _uclip(
                        pred
                        + np.repeat(np.repeat(r, 4, axis=0), 4, axis=1),
                        0,
                        255,
                    )
                cy0, cx0 = my * 8, mx * 8
                qpc = _chroma_qpc(qp)
                # §7.3.5.3.3 residual order: ChromaDCLevel for
                # BOTH components first, then (cbp_chroma 2) all
                # ChromaACLevel blocks of Cb, then of Cr
                dccs = []
                if cbp_chroma:
                    for _ in range(2):
                        cc = cavlc_decode_block(
                            br, _CT_NCM1_DEC, _TZ_CDC_DEC, max_coeff=4
                        )
                        dccs.append(_chroma_dc_dequant(cc, qpc))
                for pi, plane in enumerate((cb, cr)):
                    cpred = _chroma_dc_pred(
                        plane[cy0 - 1, cx0 : cx0 + 8] if avail_top else None,
                        plane[cy0 : cy0 + 8, cx0 - 1] if avail_left else None,
                        avail_top,
                        avail_left,
                    )
                    if cbp_chroma == 2:
                        # chroma AC: 4 blocks in raster scan, nC
                        # from the per-plane chroma grid (§9.2.1);
                        # parse sequentially, reconstruct batched
                        cgx0, cgy0 = mx * 2, my * 2
                        cacs = np.empty((4, 15), np.int64)
                        for cbi in range(4):
                            cbx, cby = cbi % 2, cbi // 2
                            cac = cavlc_decode_block(
                                br,
                                ct_dec=_ct_dec_for(
                                    _nc_in(
                                        nc_c[pi],
                                        cgx0 + cbx,
                                        cgy0 + cby,
                                    )
                                ),
                                max_coeff=15,
                            )
                            nc_c[pi][cgy0 + cby, cgx0 + cbx] = (
                                15 - cac.count(0)
                            )
                            cacs[cbi] = cac
                        cm = np.zeros((4, 16), np.int64)
                        cm[:, _ZZ4_ARR[1:]] = cacs
                        d = _ac_dequant_batch(cm.reshape(4, 4, 4), qpc)
                        d[:, 0, 0] = dccs[pi].reshape(4)
                        r = (_inv_transform4x4_batch(d) + 32) >> 6
                        cpred = _uclip(
                            cpred
                            + r.reshape(2, 2, 4, 4)
                            .swapaxes(1, 2)
                            .reshape(8, 8),
                            0,
                            255,
                        )
                    elif cbp_chroma:
                        rc = (dccs[pi] + 32) >> 6
                        cpred = _uclip(
                            cpred
                            + np.repeat(np.repeat(rc, 4, axis=0), 4, axis=1),
                            0,
                            255,
                        )
                    plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = cpred
            if addr < total_mbs:
                # picture incomplete: the next NAL must carry the
                # continuation slice (first_mb_in_slice == addr)
                continue
            pic_open = False
            stats["n_slices"] = slice_idx + 1
            y = y.astype(np.uint8)
            cb = cb.astype(np.uint8)
            cr = cr.astype(np.uint8)
            if nal_ref_idc:
                # sliding-window marking (§8.2.5.3): only REFERENCE
                # pictures enter the DPB, trimmed to the SPS window;
                # each entry keeps its MOTION FIELD too — the
                # colocated source for §8.4.1.2.2 spatial-direct
                # colZeroFlag derivation in later B pictures
                ref_dpb.append((
                    key, (y, cb, cr),
                    (ms.mv.copy(), (ms.inter & ms.avail).copy()),
                ))
                del ref_dpb[: -max(1, sps["max_ref"])]
            w, h = sps["w"], sps["h"]
            frames.append(
                _yuv420_to_rgb(
                    y[:h, :w],
                    cb[: (h + 1) // 2, : (w + 1) // 2],
                    cr[: (h + 1) // 2, : (w + 1) // 2],
                )
            )
            stats_all.append(stats)
            order_keys.append(key)
            seq += 1
    if pic_open:
        raise ValueError("stream ended inside a multi-slice picture")
    if not frames:
        raise ValueError("no slice NAL in access unit")
    # emit in OUTPUT order: POC for poc_type-0 streams (B GOPs decode
    # out of display order), decode order otherwise
    order = sorted(range(len(frames)), key=lambda i: order_keys[i])
    return [frames[i] for i in order], [stats_all[i] for i in order]


def h264_decode_frame(nals: list[bytes]) -> np.ndarray:
    """Decode one access unit (SPS/PPS + a single intra slice) into
    h×w×3 uint8 RGB — the single-picture entry the image-oriented
    gates use; GOPs with P pictures go through h264_decode_gop."""
    return h264_decode_gop(nals)[0][-1]


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
