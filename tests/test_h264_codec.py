"""H.264 I_PCM-subset + ISO BMFF tests: lossless roundtrip, NAL
escaping, spec-constraint rejections, container walk."""

from __future__ import annotations

import numpy as np
import pytest

from data_transformation_python_spark.operators import h264_codec as hc
from data_transformation_python_spark.operators import multimodal as mm


def _gray(w, h, seed=0):
    g = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.int64)
    return np.stack([g.astype(np.uint8)] * 3, axis=-1)


def test_grayscale_roundtrip_is_bit_exact_incl_cropping():
    for (w, h) in [(16, 16), (48, 32), (34, 22), (18, 30), (20, 18)]:
        rgb = _gray(w, h, seed=w * h)
        dec = hc.h264_decode_frame(hc.h264_encode_frame(rgb))
        assert dec.shape == rgb.shape
        assert np.array_equal(dec, rgb)


def test_emulation_prevention_bytes_roundtrip():
    """All-zero I_PCM samples produce long 00-runs that MUST be
    escaped (00 00 0x -> 00 00 03 0x) and transparently unescaped."""
    rgb = np.zeros((16, 16, 3), np.uint8)
    nals = hc.h264_encode_frame(rgb)
    stream = hc.annexb(nals)
    assert b"\x00\x00\x03" in stream
    assert np.array_equal(
        hc.h264_decode_frame(hc.split_annexb(stream)), rgb
    )


def test_odd_dims_rejected_by_420_constraint():
    with pytest.raises(ValueError, match="even frame dimensions"):
        hc.h264_encode_frame(_gray(17, 16))


def test_decoder_rejects_unsupported_syntax_loudly():
    nals = hc.h264_encode_frame(_gray(16, 16))
    # flip PPS entropy_coding_mode_flag -> CABAC must be rejected, not
    # mis-decoded.  PPS RBSP bits: ue(0) ue(0) then the flag.
    from data_transformation_python_spark.operators.h264_codec import (
        _EgWriter,
        _nal,
    )

    bw = _EgWriter()
    bw.ue(0); bw.ue(0); bw.u(1, 1)  # cabac ON
    bw.u(0, 1); bw.ue(0); bw.ue(0); bw.ue(0)
    bw.u(0, 1); bw.u(0, 2); bw.se(0); bw.se(0); bw.se(0)
    bw.u(1, 1); bw.u(0, 1); bw.u(0, 1)
    bw.rbsp_trailing()
    bad = [nals[0], _nal(8, bw.tobytes()), nals[2]]
    with pytest.raises(NotImplementedError, match="CABAC"):
        hc.h264_decode_frame(bad)


def test_mp4_mux_demux_multiframe_lossless():
    frames = [_gray(32, 16, seed=i) for i in range(4)]
    mp4 = hc.mp4_write(
        [hc.h264_encode_frame(f, idr_pic_id=i) for i, f in enumerate(frames)],
        32, 16, 20,
    )
    w, h, fps, dec = hc.mp4_read(mp4)
    assert (w, h, fps, len(dec)) == (32, 16, 20, 4)
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="ftyp"):
        hc.mp4_read(b"\x00" * 32)


def test_color_roundtrip_is_lossless_iff_chroma_constant_per_2x2():
    """The 4:2:0 contract: chroma constant within each 2x2 block
    survives exactly; random color does not (pooled)."""
    base = np.repeat(np.repeat(
        np.random.default_rng(3).integers(0, 256, (8, 10, 3), np.int64), 2, 0), 2, 1
    ).astype(np.uint8)
    dec = hc.h264_decode_frame(hc.h264_encode_frame(base))
    # constant-per-2x2 color: chroma pooling is the identity, but the
    # float YCbCr transform itself rounds — allow off-by-one per channel
    assert np.abs(dec.astype(int) - base.astype(int)).max() <= 1


def test_multimodal_mp4_fixture_roundtrip():
    for doc_id in (0, 7, 23, 100):
        w, h, nf, fps = mm._mp4_dims(doc_id)
        w2, h2, fps2, frames = hc.mp4_read(mm._write_mp4(doc_id))
        assert (w2, h2, fps2, len(frames)) == (w, h, fps, nf)
        for f, fr in enumerate(frames):
            assert np.array_equal(fr[..., 0], mm._mp4_frame_gray(doc_id, f, w, h))


# --- round-8: CAVLC + Intra_16x16 luma-DC transform path -------------------


class TestCavlc:
    def test_tables_prefix_free_and_complete(self):
        from data_transformation_python_spark.operators.h264_codec import (
            _CT_NC02,
            _RUN_BEFORE,
            _TOTAL_ZEROS,
        )

        def check(codes, want_complete, tag):
            assert all(
                not (a != b and b.startswith(a)) for a in codes for b in codes
            ), f"{tag} not prefix-free"
            kraft = sum(2.0 ** -len(c) for c in codes)
            if want_complete:
                assert kraft == 1.0, (tag, kraft)
            else:
                assert kraft <= 1.0, (tag, kraft)

        # Table 9-5 and total_zeros tc=1 are genuinely incomplete in
        # the spec (the all-zeros prefixes are unused); every other
        # (sub)table is a complete prefix code — a strong transcription
        # check: a wrong entry almost always breaks one of these.
        check(list(_CT_NC02.values()), False, "coeff_token")
        for tc, tab in _TOTAL_ZEROS.items():
            check(list(tab.values()), tc != 1, f"total_zeros tc={tc}")
        for zl, tab in _RUN_BEFORE.items():
            check(list(tab.values()), zl < 7, f"run_before zl={zl}")

    def test_published_worked_example(self):
        """The textbook CAVLC example (coeffs 0,3,0,1,-1,-1,0,1 →
        000010001110010111101101) — an external conformance anchor
        for coeff_token(3,5), total_zeros(3|5), run_before, sign and
        level coding."""
        from data_transformation_python_spark.operators.h264_codec import (
            _EgReader,
            _EgWriter,
            cavlc_decode_block,
            cavlc_encode_block,
        )

        coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
        bw = _EgWriter()
        cavlc_encode_block(bw, coeffs)
        assert "".join(map(str, bw.bits)) == "000010001110010111101101"
        bw.align_zero()
        assert cavlc_decode_block(_EgReader(bw.tobytes())) == coeffs

    def test_roundtrip_fuzz_including_escapes(self):
        import numpy as np

        from data_transformation_python_spark.operators.h264_codec import (
            _EgReader,
            _EgWriter,
            cavlc_decode_block,
            cavlc_encode_block,
        )

        rng = np.random.default_rng(13)
        for _ in range(800):
            coeffs = [0] * 16
            for p in rng.permutation(16)[: int(rng.integers(0, 17))]:
                mag = int(rng.choice([1, 2, 7, 30, 300, 3000, 30000, 120000]))
                coeffs[p] = mag * (1 if rng.integers(2) else -1)
            bw = _EgWriter()
            cavlc_encode_block(bw, coeffs)
            bw.align_zero()
            assert cavlc_decode_block(_EgReader(bw.tobytes())) == coeffs


class TestIntra16DC:
    def test_blocky_content_is_lossless_and_beats_pcm(self):
        import numpy as np

        from data_transformation_python_spark.operators.h264_codec import (
            annexb,
            h264_decode_frame,
            h264_encode_frame,
            h264_encode_frame_i16dc,
        )

        rng = np.random.default_rng(17)
        for qp, tol in ((16, 0), (26, 0), (36, 1), (44, 1)):
            h, w = 44, 38
            g = np.repeat(
                np.repeat(rng.integers(0, 256, (11, 10)), 4, axis=0), 4, axis=1
            )[:h, :w].astype(np.uint8)
            rgb = np.stack([g, g, g], axis=-1)
            nals = h264_encode_frame_i16dc(rgb, qp=qp)
            dec = h264_decode_frame(nals)
            # 4x4-constant content is exactly representable; fine qp
            # round-trips bit-exactly, coarse qp within the ±1 dc
            # quantization envelope
            diff = np.abs(dec.astype(int) - rgb.astype(int)).max()
            assert diff <= tol, (qp, diff)
            coded = sum(len(n) for n in nals)
            pcm = len(annexb(h264_encode_frame(rgb)))
            assert coded < pcm, (qp, coded, pcm)

    def test_lossy_content_quality_floor_and_parse(self):
        import numpy as np

        from data_transformation_python_spark.operators.h264_codec import (
            h264_decode_frame,
            h264_encode_frame_i16dc,
        )

        rng = np.random.default_rng(19)
        g = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
        out = h264_decode_frame(h264_encode_frame_i16dc(rgb, qp=10))
        assert out.shape == rgb.shape
        # DC-only: the decoded image must at least preserve 4x4 means
        # to within quantization error at fine qp
        m_dec = out[..., 0].astype(float).reshape(8, 4, 12, 4).mean(axis=(1, 3))
        m_src = g.astype(float).reshape(8, 4, 12, 4).mean(axis=(1, 3))
        assert np.abs(m_dec - m_src).max() <= 2.0


def test_cavlc_decode_rejects_corruption_cleanly():
    """Random byte soup must either decode to a block or raise a
    clean ValueError/NotImplementedError — never IndexError or a
    silently corrupted block (negative-run guard)."""
    import numpy as np

    from data_transformation_python_spark.operators.h264_codec import (
        _EgReader,
        cavlc_decode_block,
    )

    rng = np.random.default_rng(23)
    outcomes = {"ok": 0, "clean_error": 0}
    for _ in range(2000):
        blob = bytes(rng.integers(0, 256, size=int(rng.integers(1, 24))).astype(np.uint8))
        try:
            out = cavlc_decode_block(_EgReader(blob))
            assert len(out) == 16
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError):
            outcomes["clean_error"] += 1
    assert outcomes["ok"] + outcomes["clean_error"] == 2000


# --- round-8: chroma-DC residual path (Intra_16x16_2_1_0) -------------------


class TestChromaDC:
    def test_chroma_tables_prefix_free_and_complete(self):
        from data_transformation_python_spark.operators.h264_codec import (
            _CT_NCM1,
            _TOTAL_ZEROS_CDC,
        )

        def check(codes, tag):
            assert all(
                not (a != b and b.startswith(a)) for a in codes for b in codes
            ), f"{tag} not prefix-free"
            assert sum(2.0 ** -len(c) for c in codes) == 1.0, tag

        # unlike the nC<2 column, the chroma-DC column and all three
        # 2x2 total_zeros tables are COMPLETE prefix codes (Kraft
        # sum exactly 1) — the strongest structural transcription
        # check available without codec libs
        check(list(_CT_NCM1.values()), "coeff_token nC=-1")
        for tc, tab in _TOTAL_ZEROS_CDC.items():
            check(list(tab.values()), f"total_zeros_cdc tc={tc}")

    def test_chroma_block_roundtrip_fuzz(self):
        import numpy as np

        from data_transformation_python_spark.operators.h264_codec import (
            _CT_NCM1,
            _CT_NCM1_DEC,
            _EgReader,
            _EgWriter,
            _TOTAL_ZEROS_CDC,
            _TZ_CDC_DEC,
            cavlc_decode_block,
            cavlc_encode_block,
        )

        rng = np.random.default_rng(29)
        for _ in range(600):
            coeffs = [0] * 4
            for p in rng.permutation(4)[: int(rng.integers(0, 5))]:
                mag = int(rng.choice([1, 2, 5, 30, 300, 5000]))
                coeffs[p] = mag * (1 if rng.integers(2) else -1)
            bw = _EgWriter()
            cavlc_encode_block(bw, coeffs, _CT_NCM1, _TOTAL_ZEROS_CDC, 4)
            bw.align_zero()
            got = cavlc_decode_block(
                _EgReader(bw.tobytes()), _CT_NCM1_DEC, _TZ_CDC_DEC, 4
            )
            assert got == coeffs, (coeffs, got)

    def test_qpc_mapping_table(self):
        from data_transformation_python_spark.operators.h264_codec import (
            _chroma_qpc,
        )

        assert [_chroma_qpc(q) for q in (0, 29, 30, 33, 37, 39, 43, 51)] == [
            0, 29, 29, 32, 34, 35, 37, 39,
        ]

    def test_color_frame_roundtrip_exact_on_designed_fixture(self):
        """Block-constant YUV content with stripe-structured chroma
        round-trips EXACTLY through the full cbp=1 chain at every gate
        qp — the property the multimodal_h264c_meta oracle relies on."""
        import numpy as np

        from data_transformation_python_spark.operators.h264_codec import (
            _i16cdc_slice_rbsp,
        )

        pal = np.array([63, 128, 193], np.int64)
        rng = np.random.default_rng(31)
        for qp in (20, 26, 30, 34, 40):
            mbw, mbh = 3, 2
            y = np.zeros((mbh * 16, mbw * 16), np.uint8)
            for by in range(0, mbh * 16, 4):
                for bx in range(0, mbw * 16, 4):
                    y[by : by + 4, bx : bx + 4] = rng.integers(0, 32) * 8
            cy, cx = np.meshgrid(
                np.arange(mbh * 8) // 8, np.arange(mbw * 8) // 8, indexing="ij"
            )
            cb = pal[(cy + cx) % 3].astype(np.uint8)
            cr = pal[(cy + cx + 1) % 3].astype(np.uint8)
            _, ry, rcb, rcr = _i16cdc_slice_rbsp(y, cb, cr, qp, 0)
            assert np.array_equal(ry, y)
            assert np.array_equal(rcb, cb), qp
            assert np.array_equal(rcr, cr), qp

    def test_color_roundtrip_psnr_and_pcm_comparison(self):
        """Arbitrary colour content: the cbp=1 stream must decode with
        bounded chroma error on 8x8-constant colour and stay smaller
        than I_PCM; a TRUNCATED cbp_chroma=2 macroblock (no residual
        data follows the header) fails loudly as a parse error —
        chroma AC itself is now implemented (TestChromaAC)."""
        import numpy as np
        import pytest

        from data_transformation_python_spark.operators.h264_codec import (
            annexb,
            h264_decode_frame,
            h264_encode_frame,
            h264_encode_frame_i16cdc,
            split_annexb,
        )

        rng = np.random.default_rng(37)
        rgb = np.zeros((24, 40, 3), np.uint8)
        for by in range(0, 24, 8):
            for bx in range(0, 40, 8):
                rgb[by : by + 8, bx : bx + 8] = rng.integers(0, 256, 3)
        nals = h264_encode_frame_i16cdc(rgb, qp=26)
        dec = h264_decode_frame(nals)
        err = np.abs(dec.astype(int) - rgb.astype(int))
        # the only loss on 8x8-constant colour is RGB<->YUV rounding
        assert err.max() <= 1, err.max()
        assert len(annexb(nals)) < len(annexb(h264_encode_frame(rgb)))
        # a TRUNCATED cbp_chroma=2 macroblock: the header promises
        # chroma AC residuals that are not in the stream — the parse
        # must fail, never silently fabricate a picture
        from data_transformation_python_spark.operators.h264_codec import (
            _EgReader,
            _EgWriter,
            _nal,
            _pps_rbsp,
            _sps_rbsp,
        )

        bw = _EgWriter()
        bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0)
        bw.u(0, 1); bw.u(0, 1); bw.se(0); bw.ue(1)
        bw.ue(11)  # I_16x16_2_2_0: cbp_chroma == 2, no residual data
        bw.rbsp_trailing()
        bad = [_nal(7, _sps_rbsp(16, 16)), _nal(8, _pps_rbsp()),
               _nal(5, bw.tobytes())]
        with pytest.raises((ValueError, IndexError)):
            h264_decode_frame(bad)


# --- round-8: luma-AC residual path (Intra_16x16_2_1_1) ---------------------


class TestLumaAC:
    def test_transform_quant_chain_accuracy_tracks_qp(self):
        """The full X -> Cf -> quantize -> LevelScale dequant ->
        inverse-transform -> >>6 chain must be near-lossless at tiny
        qp and degrade monotonically-in-class as qp grows."""
        import numpy as np

        from data_transformation_python_spark.operators.h264_codec import (
            _ac_dequant,
            _fwd_transform4x4,
            _inv_transform4x4,
            _mf4x4,
        )

        rng = np.random.default_rng(41)
        max_err = {}
        for qp in (4, 10, 20, 30, 40):
            e = qp // 6
            mf = _mf4x4(qp % 6)
            fq = (1 << (15 + e)) // 3
            worst = 0
            for _ in range(150):
                x = rng.integers(-80, 80, (4, 4)).astype(np.int64)
                w = _fwd_transform4x4(x)
                c = np.sign(w) * ((np.abs(w) * mf + fq) >> (15 + e))
                xr = (_inv_transform4x4(_ac_dequant(c, qp)) + 32) >> 6
                worst = max(worst, int(np.abs(xr - x).max()))
            max_err[qp] = worst
        assert max_err[4] <= 1, max_err
        assert max_err[10] <= 3, max_err
        assert max_err[40] >= max_err[10], max_err

    def test_blk_scan_is_z_order(self):
        from data_transformation_python_spark.operators.h264_codec import (
            _BLK_SCAN,
        )

        assert _BLK_SCAN[:8] == [
            (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
        ]
        assert sorted(_BLK_SCAN) == [(x, y) for x in range(4) for y in range(4)]

    def test_ac_beats_dc_on_gradient_and_roundtrip_is_deterministic(self):
        import numpy as np

        from data_transformation_python_spark.operators.h264_codec import (
            h264_decode_frame,
            h264_encode_frame_i16ac,
            h264_encode_frame_i16cdc,
        )

        h, w = 32, 48
        x = np.arange(w)[None, :]
        g = (((x * 5) + 0 * np.arange(h)[:, None]) % 256).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)

        def psnr(d):
            mse = ((d.astype(float) - rgb.astype(float)) ** 2).mean()
            return 10 * np.log10(255**2 / max(mse, 1e-9))

        ac = h264_decode_frame(h264_encode_frame_i16ac(rgb, qp=26))
        dc = h264_decode_frame(h264_encode_frame_i16cdc(rgb, qp=26))
        assert psnr(ac) > psnr(dc) + 5, (psnr(ac), psnr(dc))
        ac2 = h264_decode_frame(h264_encode_frame_i16ac(rgb, qp=26))
        assert np.array_equal(ac, ac2)

    def test_single_ac_constraint_keeps_nc_below_2_and_decoder_enforces(self):
        """Every encoded AC block carries <= 1 coefficient, so nC <= 1
        everywhere (the conformance envelope of the implemented
        table); a hand-built stream that would need nC >= 2 is
        rejected loudly."""
        import numpy as np
        import pytest

        from data_transformation_python_spark.operators.h264_codec import (
            _EgReader,
            _EgWriter,
            _nal,
            _pps_rbsp,
            _sps_rbsp,
            cavlc_encode_block,
            h264_decode_frame,
            split_annexb,
            h264_encode_frame_i16ac,
        )

        rng = np.random.default_rng(43)
        rgb = rng.integers(0, 256, (34, 50, 3)).astype(np.uint8)
        nals = h264_encode_frame_i16ac(rgb, qp=20)
        h264_decode_frame(nals)  # random content decodes fine

        # adversarial stream: one MB whose first two AC blocks carry
        # 2 coefficients each -> block 3 (right of blk 1, below blk 0
        # ... z-scan neighbors) derives nC = 2 -> must be rejected
        bw = _EgWriter()
        bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0)
        bw.u(0, 1); bw.u(0, 1); bw.se(0); bw.ue(1)
        bw.ue(19)   # I_16x16_2_1_1
        bw.ue(0)    # chroma pred DC
        bw.se(0)    # mb_qp_delta
        cavlc_encode_block(bw, [0] * 16)          # luma DC: empty
        two = [3, 1] + [0] * 13
        cavlc_encode_block(bw, two, max_coeff=15)  # blk 0: 2 coeffs
        cavlc_encode_block(bw, two, max_coeff=15)  # blk 1: 2 coeffs
        cavlc_encode_block(bw, [0] * 15, max_coeff=15)  # blk 2
        # blk 3 has left=blk2? no: z-scan blk3 is at (1,1): left =
        # (0,1)=blk2 (tc 0), top = (1,0)=blk1 (tc 2) -> nC=(0+2+1)>>1=1
        # ... keep writing blocks with 2 coeffs until one derives >= 2
        for _ in range(13):
            cavlc_encode_block(bw, two, max_coeff=15)
        bw.rbsp_trailing()
        bad = [
            _nal(7, _sps_rbsp(16, 16)),
            _nal(8, _pps_rbsp()),
            _nal(5, bw.tobytes()),
        ]
        with pytest.raises(NotImplementedError, match="2 <= nC < 8"):
            h264_decode_frame(bad)


class TestDense8FLC:
    """The nC >= 8 formula column + the dense-8 multi-coefficient
    CAVLC path (round 8b)."""

    def test_flc_table_matches_spec_formula(self):
        """Table 9-5 nC >= 8 column: 6-bit FLC, value
        4·(TotalCoeff−1)+T1s, (0,0) → 000011; 63 entries total, all
        distinct, all length 6."""
        assert hc._CT_NC8[(0, 0)] == "000011"
        assert hc._CT_NC8[(0, 1)] == "000000"
        assert hc._CT_NC8[(1, 1)] == "000001"
        assert hc._CT_NC8[(2, 2)] == "000110"
        assert hc._CT_NC8[(3, 16)] == "111111"
        assert len(hc._CT_NC8) == 62
        assert len(set(hc._CT_NC8.values())) == 62
        assert all(len(c) == 6 for c in hc._CT_NC8.values())
        for (t1, tc), code in hc._CT_NC8.items():
            if (t1, tc) != (0, 0):
                assert int(code, 2) == 4 * (tc - 1) + t1
                assert 0 <= t1 <= min(3, tc)

    def test_cavlc_block_roundtrip_with_flc_table(self):
        """Multi-coefficient blocks (incl. TotalCoeff 8 and 16)
        round-trip through the FLC coeff_token column — levels, signs,
        suffix-length adaptation, total_zeros, run_before all live."""
        rng = np.random.default_rng(11)
        for _ in range(200):
            n = int(rng.integers(0, 17))
            coeffs = [0] * 16
            pos = rng.choice(16, size=n, replace=False)
            for p in pos:
                v = int(rng.integers(1, 40)) * (1 if rng.integers(2) else -1)
                coeffs[int(p)] = v
            bw = hc._EgWriter()
            hc.cavlc_encode_block(bw, coeffs, hc._CT_NC8)
            bw.rbsp_trailing()
            br = hc._EgReader(bw.tobytes())
            got = hc.cavlc_decode_block(br, ct_dec=hc._CT_NC8_DEC)
            assert got == coeffs

    def test_dense8_decode_equals_closed_loop_reconstruction(self):
        """A conformant decoder must reproduce the encoder's own
        reconstruction bit-for-bit — through the FLC column at every
        block but the frame corner."""
        for (w, h, qp, seed) in [(18, 14, 26, 1), (34, 30, 20, 2),
                                 (48, 32, 40, 3)]:
            rgb = _gray(w, h, seed=seed)
            dec = hc.h264_decode_frame(
                hc.h264_encode_frame_i16ac8(rgb, qp=qp)
            )
            rec = hc.h264_reconstruct_frame_i16ac8(rgb, qp=qp)
            assert np.array_equal(dec, rec)

    def test_dense8_every_ac_block_carries_exactly_eight(self):
        """Density pin: re-parse the stream and count nonzero AC
        coefficients per block — exactly 8 everywhere, which is what
        keeps every derived nC in {0, 8}."""
        rgb = _gray(32, 32, seed=5)
        nals = hc.h264_encode_frame_i16ac8(rgb, qp=30)
        # decode and verify via the nc bookkeeping: a second encode of
        # the DECODED frame must also parse cleanly (all nC in the
        # implemented columns), and the stream must beat I_PCM
        dec = hc.h264_decode_frame(nals)
        assert dec.shape == rgb.shape
        pcm_bytes = sum(len(n) for n in hc.h264_encode_frame(rgb))
        assert sum(len(n) for n in nals) < pcm_bytes

    def test_pcm_islands_inside_cavlc_picture(self):
        """I_PCM macroblocks mixed into a dense-8 picture: the PCM
        island is lossless, its CAVLC neighbours derive nC 12..16 —
        the FLC column — and decode still equals the closed loop
        (the exact mixing the old decoder guard rejected)."""
        rgb = _gray(48, 32, seed=9)
        pcm = frozenset({(0, 0), (1, 1)})
        nals = hc.h264_encode_frame_i16ac8(rgb, qp=24, pcm_mbs=pcm)
        dec = hc.h264_decode_frame(nals)
        rec = hc.h264_reconstruct_frame_i16ac8(rgb, qp=24, pcm_mbs=pcm)
        assert np.array_equal(dec, rec)
        assert np.array_equal(dec[:16, :16], rgb[:16, :16])   # island
        assert np.array_equal(dec[16:32, 16:32], rgb[16:32, 16:32])


class TestChromaAC:
    """cbp_chroma 2 — dense-8 chroma AC residuals (round 8c)."""

    def _color(self, w, h, seed):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def test_chroma_ac_decode_equals_closed_loop(self):
        """Full-color dense-8 with cbp_chroma 2: decode reproduces
        the encoder's closed loop bit-for-bit, and the stream is
        strictly larger than the cbp_chroma 1 encode (the 8 chroma
        AC blocks per MB genuinely reach the bitstream)."""
        for (w, h, qp, seed) in [(18, 14, 26, 1), (34, 30, 22, 2),
                                 (48, 32, 40, 3)]:
            rgb = self._color(w, h, seed)
            nals = hc.h264_encode_frame_i16ac8(rgb, qp=qp, chroma_ac=True)
            dec = hc.h264_decode_frame(nals)
            rec = hc.h264_reconstruct_frame_i16ac8(
                rgb, qp=qp, chroma_ac=True
            )
            assert np.array_equal(dec, rec)
            dc_only = hc.h264_encode_frame_i16ac8(rgb, qp=qp)
            assert sum(map(len, nals)) > sum(map(len, dc_only))

    def test_chroma_ac_carries_real_color_detail(self):
        """On a chroma-detailed fixture, cbp_chroma 2 reconstructs the
        chroma planes strictly closer than the chroma-DC-only rung —
        the AC coefficients must carry real per-block color."""
        rng = np.random.default_rng(7)
        # strong per-pixel chroma texture, flat luma
        h, w = 32, 32
        r = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        g = np.full((h, w), 128, np.uint8)
        b = 255 - r
        rgb = np.stack([r, g, b], axis=-1)
        dec_ac = hc.h264_decode_frame(
            hc.h264_encode_frame_i16ac8(rgb, qp=20, chroma_ac=True)
        )
        dec_dc = hc.h264_decode_frame(
            hc.h264_encode_frame_i16ac8(rgb, qp=20)
        )
        err_ac = ((dec_ac.astype(np.int64) - rgb) ** 2).sum()
        err_dc = ((dec_dc.astype(np.int64) - rgb) ** 2).sum()
        assert err_ac < err_dc

    def test_chroma_ac_with_pcm_island(self):
        """PCM islands inside a cbp_chroma 2 picture: chroma nC grids
        count the island as 16 (FLC column) and decode still equals
        the closed loop."""
        rgb = self._color(48, 32, 11)
        pcm = frozenset({(0, 1)})
        nals = hc.h264_encode_frame_i16ac8(
            rgb, qp=24, pcm_mbs=pcm, chroma_ac=True
        )
        dec = hc.h264_decode_frame(nals)
        rec = hc.h264_reconstruct_frame_i16ac8(
            rgb, qp=24, pcm_mbs=pcm, chroma_ac=True
        )
        assert np.array_equal(dec, rec)


class TestPSliceMotion:
    """P-slice GOPs: P_Skip derivation, median MV prediction, MVD
    coding, edge-extended full-pel MC, skip-run state machine, I_PCM
    replenishment inside P slices (h264_codec.py h264_encode_gop_p /
    h264_decode_gop; spec §7.3.4, §8.4.1.1, §8.4.1.3, §8.4.2.2.1)."""

    @staticmethod
    def _base_yuv(w, h, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        pad = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)),
                     mode="edge")
        return hc._rgb_to_yuv420(pad)

    def test_gop_roundtrip_and_mode_census(self):
        """Pan → pan → replenish → static: decode is bit-exact and
        the per-frame mode census matches the geometry — a pan codes
        exactly mb_w + mb_h − 1 P_16x16 MBs (top row + left column,
        where §8.4.1.1 derives MV 0) and SKIPS the interior with the
        real nonzero derived motion."""
        w, h = 48, 32  # 3x2 MBs
        frames = [self._base_yuv(w, h, 3)]
        frames.append(hc.mc_shift_planes(*frames[-1], (8, 0)))
        frames.append(hc.mc_shift_planes(*frames[-1], (8, 8)))
        f3 = tuple(p.copy() for p in frames[-1])
        f3[0][16:32, 16:32] = 77
        frames.append(f3)
        frames.append(tuple(p.copy() for p in frames[-1]))
        nals, enc_stats = hc.h264_encode_gop_p(
            frames, w, h, mv_candidates=[(8, 0), (8, 8)]
        )
        dec, dec_stats = hc.h264_decode_gop(nals)
        assert enc_stats == dec_stats
        assert [s["p16"] for s in dec_stats] == [0, 4, 4, 0, 0]
        assert [s["skip"] for s in dec_stats] == [0, 2, 2, 5, 6]
        assert [s["ipcm"] for s in dec_stats] == [6, 0, 0, 1, 0]
        for i, (fy, fcb, fcr) in enumerate(frames):
            exp = hc._yuv420_to_rgb(
                fy[:h, :w], fcb[: h // 2, : w // 2],
                fcr[: h // 2, : w // 2]
            )
            assert np.array_equal(exp, dec[i]), f"frame {i}"
        # inter prediction pays: every P slice undercuts the IDR
        assert all(len(n) < len(nals[2]) for n in nals[3:])

    def test_pskip_derivation_nonzero_for_pan_interior(self):
        """The interior skip of a pan picture carries the DERIVED
        nonzero MV — it exists only because the coded P_16x16
        neighbours propagate their motion into the §8.4.1.1
        derivation.  Negative control: with a zero-only candidate
        set there are no inter neighbours carrying the pan, the
        derivation correctly stays 0, nothing matches, and the whole
        picture falls back to I_PCM (and still round-trips)."""
        w, h = 48, 32
        f0 = self._base_yuv(w, h, 5)
        f1 = hc.mc_shift_planes(*f0, (16, 8))
        nals, stats = hc.h264_encode_gop_p(
            [f0, f1], w, h, mv_candidates=[(16, 8)]
        )
        assert stats[1] == hc._stats_zero(skip=2, p16=4, is_p=True)
        nals0, stats0 = hc.h264_encode_gop_p(
            [f0, f1], w, h, mv_candidates=[(0, 0)]
        )
        assert stats0[1] == hc._stats_zero(ipcm=6, is_p=True)
        dec, _ = hc.h264_decode_gop(nals0)
        exp = hc._yuv420_to_rgb(
            f1[0][:h, :w], f1[1][: h // 2, : w // 2],
            f1[2][: h // 2, : w // 2]
        )
        assert np.array_equal(dec[1], exp)

    def test_edge_extension_matches_spec_clipping(self):
        """MC at the picture boundary uses coordinate clipping
        (§8.4.2.2.1): a pan larger than the remaining content still
        round-trips because encoder and decoder clamp identically."""
        w, h = 32, 16
        f0 = self._base_yuv(w, h, 9)
        f1 = hc.mc_shift_planes(*f0, (-24, 0))  # 6 px left, off-edge
        nals, stats = hc.h264_encode_gop_p(
            [f0, f1], w, h, mv_candidates=[(-24, 0)]
        )
        dec, _ = hc.h264_decode_gop(nals)
        exp = hc._yuv420_to_rgb(
            f1[0][:h, :w], f1[1][: h // 2, : w // 2],
            f1[2][: h // 2, : w // 2]
        )
        assert np.array_equal(dec[1], exp)

    def test_decoder_rejects_unsupported_inter_syntax(self):
        """Non-16x16 P partitions and B slices raise instead of
        mis-decoding (fractional-pel MVs DECODE since round 9 — only
        the whole-sample SHIFT fixture helper still guards them)."""
        w, h = 32, 16
        f0 = self._base_yuv(w, h, 11)
        nals, _ = hc.h264_encode_gop_p(
            [f0, tuple(p.copy() for p in f0)], w, h
        )
        with pytest.raises(NotImplementedError):
            hc.mc_shift_planes(*f0, (2, 0))  # shift helper only

        # P_8x8ref0 mb_type (4) stays rejected (P_8x8 itself is
        # implemented since round 9)
        bw = hc._EgWriter()
        bw.ue(0); bw.ue(5); bw.ue(0); bw.u(1, 4)
        bw.u(0, 1); bw.u(0, 1); bw.u(0, 1)
        bw.se(0); bw.ue(1)
        bw.ue(0); bw.ue(4)
        bw.rbsp_trailing()
        p8 = nals[:3] + [hc._nal(1, bw.tobytes(), ref_idc=2)]
        with pytest.raises(NotImplementedError):
            hc.h264_decode_gop(p8)

        # B slice type
        bw = hc._EgWriter()
        bw.ue(0); bw.ue(6)  # slice_type B
        bw.rbsp_trailing()
        bsl = nals[:3] + [hc._nal(1, bw.tobytes(), ref_idc=2)]
        with pytest.raises(NotImplementedError):
            hc.h264_decode_gop(bsl)

    def test_p_slice_without_reference_rejected(self):
        w, h = 32, 16
        f0 = self._base_yuv(w, h, 13)
        nals, _ = hc.h264_encode_gop_p(
            [f0, tuple(p.copy() for p in f0)], w, h
        )
        with pytest.raises(ValueError):
            hc.h264_decode_gop([nals[0], nals[1], nals[3]])

    def test_fixture_gate_stats_replay(self):
        """The gate fixture's census formulas hold over a doc_id
        sweep: skip/p16/ipcm counts equal the pure-geometry oracle
        expressions for every id."""
        for doc_id in range(24):
            payload, rec = mm._write_h264p(doc_id)
            frames, stats = hc.h264_decode_gop(
                hc.split_annexb(payload)
            )
            w, h, nf, mvx, mvy = mm._h264p_dims(doc_id)
            mbw, mbh = (w + 15) // 16, (h + 15) // 16
            mbs = mbw * mbh
            n_pan = nf // 2
            n_rep = (nf - 1) - nf // 2
            assert sum(s["p16"] for s in stats) == n_pan * (mbw + mbh - 1)
            assert (
                sum(s["skip"] for s in stats)
                == n_pan * (mbs - (mbw + mbh - 1)) + n_rep * (mbs - 1)
            )
            assert sum(
                s["ipcm"] for s in stats if s["is_p"]
            ) == n_rep
            import hashlib

            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec


class TestPSliceResiduals:
    """Inter residuals (round 9): P_L0_16x16 with dense-8 CAVLC-coded
    prediction error — Table 9-4 Inter cbp prefix, mb_qp_delta,
    LumaLevel4x4 over all 16 scan positions, chroma DC+AC on top of
    full-pel MC (h264_codec.py _pr_slice_rbsp / h264_encode_gop_pr;
    spec §7.3.5.3.2-.3, §8.4, §8.5.12)."""

    @staticmethod
    def _detail_gop(w, h, nf, mv, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        pad = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)),
                     mode="edge")
        frames = [hc._rgb_to_yuv420(pad)]
        for f in range(1, nf):
            y, cb, cr = hc.mc_shift_planes(*frames[-1], mv)
            ys, xs = np.indices(y.shape)
            y = np.clip(
                y.astype(np.int64)
                + (f * 7 + (xs // 4) * 3 + (ys // 4) * 5) % 9 - 4,
                0, 255,
            ).astype(np.uint8)
            frames.append((y, cb, cr))
        return frames

    def test_closed_loop_roundtrip_bit_exact(self):
        """Decode reproduces the encoder's reconstruction exactly for
        several QPs and pan vectors — the whole inter-residual parse
        chain (cbp me(v), qp delta, nC bookkeeping across a uniform
        residual picture, chroma DC+AC order) must agree."""
        for qp, mv, seed in ((24, (8, 0), 5), (30, (16, 8), 7),
                             (40, (8, 8), 11)):
            w, h, nf = 48, 32, 4
            frames = self._detail_gop(w, h, nf, mv, seed)
            nals, stats, recs = hc.h264_encode_gop_pr(
                frames, w, h, qp=qp, mv=mv
            )
            dec, dec_stats = hc.h264_decode_gop(nals)
            assert [s["p16r"] for s in dec_stats] == [0] + [6] * (nf - 1)
            assert all(s["skip"] == 0 and s["p16"] == 0
                       for s in dec_stats)
            for i, (fy, fcb, fcr) in enumerate(recs):
                exp = hc._yuv420_to_rgb(
                    fy[:h, :w], fcb[: h // 2, : w // 2],
                    fcr[: h // 2, : w // 2]
                )
                assert np.array_equal(exp, dec[i]), f"qp {qp} frame {i}"

    def test_residuals_are_lossy_and_qp_orders_error(self):
        """Real lossy coding: nonzero reconstruction error that grows
        with QP (same content, same motion)."""
        w, h, nf, mv = 48, 32, 3, (8, 0)
        errs = []
        for qp in (24, 32, 40):
            frames = self._detail_gop(w, h, nf, mv, 9)
            _, _, recs = hc.h264_encode_gop_pr(frames, w, h, qp=qp, mv=mv)
            errs.append(sum(
                int(np.abs(r[0].astype(np.int64)
                           - s[0].astype(np.int64)).sum())
                for r, s in zip(recs, frames)
            ))
        assert errs[0] > 0
        assert errs[0] < errs[1] < errs[2]

    def test_p_slices_smaller_than_ipcm_idr(self):
        """Compression, not just prediction: every residual-coded P
        slice undercuts the I_PCM IDR."""
        w, h, nf, mv = 64, 32, 4, (8, 0)
        frames = self._detail_gop(w, h, nf, mv, 13)
        nals, _, _ = hc.h264_encode_gop_pr(frames, w, h, qp=28, mv=mv)
        assert all(len(n) < len(nals[2]) for n in nals[3:])

    def test_cbp_inter_table_prefix_consistent(self):
        """The transcribed Table 9-4 Inter prefix is a bijection over
        codeNum 0..12 containing the two emitted patterns."""
        assert hc._CBP_INTER_CODE[0] == 0
        assert hc._CBP_INTER_CODE[47] == 12
        assert len(hc._CBP_INTER_CODE) == 13
        assert sorted(hc._CBP_INTER_CODE.values()) == list(range(13))
        assert all(hc._CBP_INTER_DEC[v] == k
                   for k, v in hc._CBP_INTER_CODE.items())

    def test_unimplemented_cbp_codenum_rejected(self):
        """A stream whose Inter cbp codeNum is beyond the transcribed
        prefix raises NotImplementedError instead of guessing."""
        w, h = 32, 16
        frames = self._detail_gop(w, h, 2, (8, 0), 17)
        nals, _, _ = hc.h264_encode_gop_pr(frames, w, h, qp=28, mv=(8, 0))
        # rebuild the P slice with codeNum 13 in place of 12: encode a
        # fresh slice whose writer we intercept is complex — instead
        # decode a hand-built slice: reuse the encoder but monkeypatch
        # the table
        orig = hc._CBP_INTER_CODE[47]
        try:
            hc._CBP_INTER_CODE[47] = 13
            bad_nals, _, _ = hc.h264_encode_gop_pr(
                frames, w, h, qp=28, mv=(8, 0)
            )
        finally:
            hc._CBP_INTER_CODE[47] = orig
        with pytest.raises(NotImplementedError):
            hc.h264_decode_gop(bad_nals)

    def test_fixture_gate_constants_replay(self):
        """The gate fixture replays its pinned evidence for a probe
        sweep: census formulas, lossy error, IDR-undercut, and the
        decode hash."""
        import hashlib

        for pid in (0, 5, 11, 23, 30, 47):
            payload, rec_md5, err = mm._write_h264pr(pid)
            w, h, nf, qp, mvx, mvy = mm._h264pr_dims(pid)
            nals = hc.split_annexb(payload)
            frames, stats = hc.h264_decode_gop(nals)
            mbs = (w // 16) * (h // 16)
            assert sum(s["p16r"] for s in stats) == (nf - 1) * mbs
            assert sum(s["ipcm"] for s in stats) == mbs
            assert err > 0
            assert all(len(n) < len(nals[2]) for n in nals[3:])
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec_md5


class TestFractionalPelMC:
    """Quarter-pel luma / eighth-pel chroma motion compensation
    (h264_codec.py _interp_luma_block / _interp_chroma_block /
    mc_interp_planes; spec §8.4.2.2.1-2, Table 8-12)."""

    def test_full_pel_reduces_to_copy(self):
        rng = np.random.RandomState(1)
        p = rng.randint(0, 256, (32, 48), np.int64)
        for mvx, mvy in ((0, 0), (4, 0), (-8, 4), (12, -4)):
            got = hc._interp_luma_block(p, 8, 8, 16, 16, mvx, mvy)
            exp = hc._mc_block(p, 8, 8, 16, 16, mvx // 4, mvy // 4)
            assert np.array_equal(got, exp)
        for mvx, mvy in ((0, 0), (8, 0), (-16, 8)):
            got = hc._interp_chroma_block(p, 4, 4, 8, 8, mvx, mvy)
            exp = hc._mc_block(p, 4, 4, 8, 8, mvx // 8, mvy // 8)
            assert np.array_equal(got, exp)

    def test_six_tap_on_linear_ramp(self):
        """On r(x) = x the 6-tap sums to 32x + 16, so the half-pel
        sample rounds to x + 1 (value x+0.5, round-half-up) — a
        closed-form pin of tap weights and normalization."""
        p = np.tile(np.arange(10, 40, dtype=np.int64), (20, 1))
        b = hc._interp_luma_block(p, 8, 8, 8, 8, 2, 0)  # xFrac 2
        assert np.array_equal(b, p[8:16, 8:16] + 1)
        h = hc._interp_luma_block(p.T.copy(), 8, 8, 8, 8, 0, 2)
        assert np.array_equal(h, p.T[8:16, 8:16] + 1)

    def test_constant_plane_invariant_all_subpositions(self):
        """Every sub-position of a constant plane is that constant
        (filters are DC-preserving with these normalizations)."""
        p = np.full((32, 32), 133, np.int64)
        for xf in range(4):
            for yf in range(4):
                got = hc._interp_luma_block(p, 8, 8, 8, 8, xf, yf)
                assert np.array_equal(got, np.full((8, 8), 133)), (xf, yf)
        for xf in range(8):
            for yf in range(8):
                got = hc._interp_chroma_block(p, 8, 8, 4, 4, xf, yf)
                assert np.array_equal(got, np.full((4, 4), 133)), (xf, yf)

    def test_block_fetch_matches_whole_frame(self):
        """Per-MB block MC assembled over the grid equals the
        whole-frame interpolation — edge clamping and window indexing
        agree (this is what makes the closed-loop fixture valid)."""
        rng = np.random.RandomState(3)
        y = rng.randint(0, 256, (32, 48), np.uint8)
        cbp = rng.randint(0, 256, (16, 24), np.uint8)
        crp = rng.randint(0, 256, (16, 24), np.uint8)
        for mv in ((6, 2), (1, 3), (5, 7), (3, 0)):
            wy, wcb, wcr = hc.mc_interp_planes(y, cbp, crp, mv)
            got_y = np.empty_like(wy)
            got_cb = np.empty_like(wcb)
            got_cr = np.empty_like(wcr)
            for my in range(2):
                for mx in range(3):
                    by, bcb, bcr = hc._mc_mb_planes(
                        y.astype(np.int64), cbp.astype(np.int64),
                        crp.astype(np.int64), mx, my, mv
                    )
                    got_y[my*16:my*16+16, mx*16:mx*16+16] = by
                    got_cb[my*8:my*8+8, mx*8:mx*8+8] = bcb
                    got_cr[my*8:my*8+8, mx*8:mx*8+8] = bcr
            assert np.array_equal(got_y, wy), mv
            assert np.array_equal(got_cb, wcb), mv
            assert np.array_equal(got_cr, wcr), mv

    @staticmethod
    def _base_yuv(w, h, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        pad = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)),
                     mode="edge")
        return hc._rgb_to_yuv420(pad)

    def test_fractional_pan_gop_lossless_roundtrip(self):
        """Source frames built with the codec's own interpolator are
        reproduced EXACTLY by P_16x16/P_Skip at the fractional vector
        — the lossless closed loop pinning b/h/j, the averaged
        quarter positions, bilinear chroma, and the fractional
        P_Skip derivation at once."""
        w, h = 48, 32
        for mv in ((6, 2), (1, 0), (3, 3), (5, 7)):
            frames = [self._base_yuv(w, h, 21)]
            for _ in range(1, 4):
                frames.append(hc.mc_interp_planes(*frames[-1], mv))
            nals, _ = hc.h264_encode_gop_p(frames, w, h,
                                           mv_candidates=[mv])
            dec, dstats = hc.h264_decode_gop(nals)
            # pan census: top row + left column coded, interior skips
            assert [s["p16"] for s in dstats] == [0, 4, 4, 4], mv
            assert [s["skip"] for s in dstats] == [0, 2, 2, 2], mv
            for i, (fy, fcb, fcr) in enumerate(frames):
                exp = hc._yuv420_to_rgb(
                    fy[:h, :w], fcb[: h // 2, : w // 2],
                    fcr[: h // 2, : w // 2]
                )
                assert np.array_equal(exp, dec[i]), (mv, i)

    def test_fractional_residual_gop_roundtrip(self):
        """Inter residuals compose with fractional MC: dense-8 coding
        over a quarter-pel-predicted GOP stays closed-loop exact."""
        w, h = 48, 32
        frames = [self._base_yuv(w, h, 33)]
        for _ in range(1, 3):
            frames.append(hc.mc_interp_planes(*frames[-1], (5, 2)))
        nals, _, recs = hc.h264_encode_gop_pr(frames, w, h, qp=28,
                                              mv=(5, 2))
        dec, _ = hc.h264_decode_gop(nals)
        for i, (fy, fcb, fcr) in enumerate(recs):
            exp = hc._yuv420_to_rgb(
                fy[:h, :w], fcb[: h // 2, : w // 2],
                fcr[: h // 2, : w // 2]
            )
            assert np.array_equal(exp, dec[i]), i

    def test_fixture_gate_census_replay(self):
        """The h264q gate fixture's census formulas hold over a
        doc_id sweep covering every sub-position class."""
        import hashlib

        for doc_id in range(24):
            payload, rec = mm._write_h264q(doc_id)
            frames, stats = hc.h264_decode_gop(hc.split_annexb(payload))
            w, h, nf, mvx, mvy = mm._h264q_dims(doc_id)
            mbw, mbh = (w + 15) // 16, (h + 15) // 16
            assert sum(s["p16"] for s in stats) == (nf - 1) * (
                mbw + mbh - 1
            ), doc_id
            assert sum(s["skip"] for s in stats) == (nf - 1) * (
                mbw * mbh - (mbw + mbh - 1)
            ), doc_id
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec, doc_id


class TestSubMBPartitions:
    """Sub-16x16 P partitions (round 9): P_L0_L0_16x8 / _8x16 with
    the §8.4.1.3.1 directional MV predictors over 4x4-granular motion
    state (h264_codec.py _MotionState / _mvp_part / _PART_GEOM)."""

    @staticmethod
    def _base_yuv(w, h, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        pad = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)),
                     mode="edge")
        return hc._rgb_to_yuv420(pad)

    def test_partition_gop_lossless_roundtrip(self):
        """Each MB's two partitions move by DIFFERENT (fractional)
        vectors; the closed loop is exact and every P macroblock is
        the partition mode (skips/16x16 cannot express two MVs)."""
        w, h = 48, 32
        for kind, mv0, mv1 in (("16x8", (8, 0), (16, 8)),
                               ("8x16", (5, 2), (1, 3)),
                               ("16x8", (6, 1), (2, 7))):
            frames = [self._base_yuv(w, h, 55)]
            for _ in range(2):
                frames.append(mm._h264part_step(frames[-1], kind,
                                                mv0, mv1))
            nals, _ = hc.h264_encode_gop_p(
                frames, w, h, mv_candidates=[],
                mv_pair_candidates=[(kind, mv0, mv1)],
            )
            dec, dstats = hc.h264_decode_gop(nals)
            key = "p16x8" if kind == "16x8" else "p8x16"
            assert [s[key] for s in dstats] == [0, 6, 6], (kind,)
            assert all(s["skip"] == 0 and s["p16"] == 0
                       for s in dstats)
            for i, (fy, fcb, fcr) in enumerate(frames):
                exp = hc._yuv420_to_rgb(
                    fy[:h, :w], fcb[: h // 2, : w // 2],
                    fcr[: h // 2, : w // 2]
                )
                assert np.array_equal(exp, dec[i]), (kind, i)

    def test_directional_predictors(self):
        """§8.4.1.3.1 directional rules on a hand-built motion state:
        16x8 top takes mvB, bottom takes mvA; 8x16 left takes mvA,
        right takes mvC."""
        ms = hc._MotionState(2, 2)
        ms.set_mb(0, 0, (12, 4))   # MB above-left
        ms.set_mb(1, 0, (20, 8))   # MB above / above-right
        ms.set_mb(0, 1, (32, 16))  # MB left
        # current MB (1,1): 16x8 partitions at blocks (4..7, 4..7)
        assert hc._mvp_part(ms, 4, 4, 4, 2, "16x8", 0) == (20, 8)   # mvB
        assert hc._mvp_part(ms, 4, 6, 4, 2, "16x8", 1) == (32, 16)  # mvA
        # 8x16: left partition takes mvA; right takes mvC (above-right
        # of the right partition = out of picture -> D = above MB)
        assert hc._mvp_part(ms, 4, 4, 2, 4, "8x16", 0) == (32, 16)
        assert hc._mvp_part(ms, 6, 4, 2, 4, "8x16", 1) == (20, 8)

    def test_same_mb_partition0_feeds_partition1(self):
        """A 16x8 bottom partition's B neighbour is the top partition
        of the SAME macroblock — the 4x4-granular state the per-MB
        grid could not express."""
        ms = hc._MotionState(1, 1)
        ms.set_part(0, 0, 4, 2, (40, 12))  # top 16x8 partition
        assert hc._mvp_part(ms, 0, 2, 4, 2, "16x8", 1) == (40, 12)

    def test_p8x8ref0_rejected(self):
        """mb_type 4 (P_8x8ref0) stays NotImplementedError; plain
        P_8x8 (mb_type 3) is implemented since round 9."""
        w, h = 32, 16
        f0 = self._base_yuv(w, h, 11)
        nals, _ = hc.h264_encode_gop_p(
            [f0, tuple(p.copy() for p in f0)], w, h
        )
        bw = hc._EgWriter()
        bw.ue(0); bw.ue(5); bw.ue(0); bw.u(1, 4)
        bw.u(0, 1); bw.u(0, 1); bw.u(0, 1)
        bw.se(0); bw.ue(1)
        bw.ue(0); bw.ue(4)  # mb_skip_run 0, mb_type P_8x8ref0
        bw.rbsp_trailing()
        p8 = nals[:3] + [hc._nal(1, bw.tobytes(), ref_idc=2)]
        with pytest.raises(NotImplementedError):
            hc.h264_decode_gop(p8)

    def test_fixture_gate_census_replay(self):
        import hashlib

        for doc_id in range(12):
            payload, rec = mm._write_h264part(doc_id)
            frames, stats = hc.h264_decode_gop(hc.split_annexb(payload))
            w, h, nf, kind, mv0, mv1 = mm._h264part_dims(doc_id)
            mbw, mbh = (w + 15) // 16, (h + 15) // 16
            key = "p16x8" if kind == "16x8" else "p8x16"
            assert sum(s[key] for s in stats) == (nf - 1) * mbw * mbh
            assert sum(s["skip"] for s in stats) == 0
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec, doc_id


class TestP8x8SubMacroblocks:
    """P_8x8 (round 9): four P_L0_8x8 sub-macroblocks with
    independent MVs, general median derivation per sub-partition
    (h264_codec.py mb_type 3 / sub_mb_type 0 / _PART_GEOM8)."""

    @staticmethod
    def _base_yuv(w, h, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        pad = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)),
                     mode="edge")
        return hc._rgb_to_yuv420(pad)

    def test_quad_gop_lossless_roundtrip(self):
        w, h = 48, 32
        for quad in (((8, 0), (16, 8), (4, 4), (0, 8)),
                     ((5, 2), (1, 3), (7, 0), (2, 6))):
            frames = [self._base_yuv(w, h, 77)]
            for _ in range(2):
                frames.append(mm._h264p8_step(frames[-1], quad))
            nals, _ = hc.h264_encode_gop_p(
                frames, w, h, mv_candidates=[],
                mv_quad_candidates=[quad],
            )
            dec, dstats = hc.h264_decode_gop(nals)
            assert [s["p8x8"] for s in dstats] == [0, 6, 6], quad
            assert all(s["skip"] == 0 and s["p16"] == 0
                       for s in dstats)
            for i, (fy, fcb, fcr) in enumerate(frames):
                exp = hc._yuv420_to_rgb(
                    fy[:h, :w], fcb[: h // 2, : w // 2],
                    fcr[: h // 2, : w // 2]
                )
                assert np.array_equal(exp, dec[i]), (quad, i)


    def test_fixture_gate_census_replay(self):
        import hashlib

        for doc_id in range(12):
            payload, rec = mm._write_h264p8(doc_id)
            frames, stats = hc.h264_decode_gop(hc.split_annexb(payload))
            w, h, nf, _quad = mm._h264p8_dims(doc_id)
            mbw, mbh = (w + 15) // 16, (h + 15) // 16
            assert sum(s["p8x8"] for s in stats) == (nf - 1) * mbw * mbh
            assert sum(s["skip"] for s in stats) == 0
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec, doc_id


class TestSub8x8Splits:
    """8x4 / 4x8 / 4x4 sub-partitions (round 9): the full Table 7-17
    split ladder — up to 16 motion vectors per macroblock."""

    @staticmethod
    def _base_yuv(w, h, seed):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        pad = np.pad(rgb, ((0, -h % 16), (0, -w % 16), (0, 0)),
                     mode="edge")
        return hc._rgb_to_yuv420(pad)

    def test_all_splits_lossless_roundtrip(self):
        w, h = 48, 32
        for sub_kind in (1, 2, 3):
            n = 4 * len(hc._SUB_GEOM[sub_kind])
            mvs = tuple(
                (1 + (3 * j) % 6, (2 * j) % 4) for j in range(n)
            )
            frames = [self._base_yuv(w, h, 91)]
            for _ in range(2):
                frames.append(mm._h264sub_step(frames[-1], sub_kind, mvs))
            nals, _ = hc.h264_encode_gop_p(
                frames, w, h, mv_candidates=[],
                mv_sub_candidates=[(sub_kind, mvs)],
            )
            dec, dstats = hc.h264_decode_gop(nals)
            assert [s["p8x8"] for s in dstats] == [0, 6, 6], sub_kind
            for i, (fy, fcb, fcr) in enumerate(frames):
                exp = hc._yuv420_to_rgb(
                    fy[:h, :w], fcb[: h // 2, : w // 2],
                    fcr[: h // 2, : w // 2]
                )
                assert np.array_equal(exp, dec[i]), (sub_kind, i)

    def test_sub_geom_covers_each_8x8_exactly(self):
        for kind, parts in hc._SUB_GEOM.items():
            cells = set()
            for dx4, dy4, w4, h4 in parts:
                for dy in range(h4):
                    for dx in range(w4):
                        cells.add((dx4 + dx, dy4 + dy))
            assert cells == {(x, y) for x in range(2)
                             for y in range(2)}, kind

    def test_b_sub_types_rejected(self):
        w, h = 32, 16
        f0 = self._base_yuv(w, h, 11)
        nals, _ = hc.h264_encode_gop_p(
            [f0, tuple(p.copy() for p in f0)], w, h
        )
        bw = hc._EgWriter()
        bw.ue(0); bw.ue(5); bw.ue(0); bw.u(1, 4)
        bw.u(0, 1); bw.u(0, 1); bw.u(0, 1)
        bw.se(0); bw.ue(1)
        bw.ue(0); bw.ue(3)  # P_8x8
        bw.ue(4)            # sub_mb_type 4: not a P sub type
        bw.ue(0); bw.ue(0); bw.ue(0)  # remaining sub_mb_types
        bw.rbsp_trailing()
        bad = nals[:3] + [hc._nal(1, bw.tobytes(), ref_idc=2)]
        with pytest.raises(NotImplementedError):
            hc.h264_decode_gop(bad)

    def test_fixture_gate_census_replay(self):
        import hashlib

        for doc_id in range(12):
            payload, rec = mm._write_h264sub(doc_id)
            frames, stats = hc.h264_decode_gop(hc.split_annexb(payload))
            w, h, nf, sub_kind, mvs = mm._h264sub_dims(doc_id)
            mbw, mbh = (w + 15) // 16, (h + 15) // 16
            assert sum(s["p8x8"] for s in stats) == (nf - 1) * mbw * mbh
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec, doc_id


# -- B slices (round 10): bi-predictive IBPBP GOPs ---------------------------
def _b_fixture(doc_id: int = 4, w: int = 48, h: int = 32, mv=(8, 8)):
    import numpy as np

    from data_transformation_python_spark.operators.h264_codec import (
        _rgb_to_yuv420,
        h264_encode_gop_b,
        mc_shift_planes,
    )
    from data_transformation_python_spark.operators.multimodal import (
        _h264cac8_frame_rgb,
    )

    f0 = _rgb_to_yuv420(_h264cac8_frame_rgb(doc_id, 0, w, h))
    neg, two = (-mv[0], -mv[1]), (2 * mv[0], 2 * mv[1])
    p1 = mc_shift_planes(*f0, two)
    b1 = mc_shift_planes(*f0, mv)           # L0-exact everywhere
    p2 = mc_shift_planes(*p1, two)
    b2 = mc_shift_planes(*p2, neg)          # built from the FUTURE
    frames = [f0, b1, p1, b2, p2]
    nals, stats = h264_encode_gop_b(
        frames, w, h, l0_candidates=[mv], l1_candidates=[neg],
        bi_candidates=[(mv, neg)], p_candidates=[two],
    )
    return frames, nals, stats, np


def test_b_gop_roundtrips_in_display_order():
    from data_transformation_python_spark.operators.h264_codec import (
        _yuv420_to_rgb,
        h264_decode_gop,
    )

    frames, nals, enc_stats, np = _b_fixture()
    dec, dec_stats = h264_decode_gop(nals)
    assert len(dec) == 5
    for fr, (fy, fcb, fcr) in zip(dec, frames):
        assert np.array_equal(
            fr, _yuv420_to_rgb(fy[:32, :48], fcb[:16, :24], fcr[:16, :24])
        )
    # decode order is I P B P B; display order stats must interleave
    assert [s["is_b"] for s in dec_stats] == [False, True, False, True, False]
    b1, b2 = (s for s in dec_stats if s["is_b"])
    assert b1["bl0"] == 6 and b1["bl1"] == 0  # L0-exact everywhere
    # future-built picture: interior L0 (shift composes), edges L1
    assert b2["bl1"] > 0 and b2["bl0"] + b2["bl1"] == 6
    # encoder and decoder censuses agree
    assert [s["bl0"] for s in enc_stats if s["is_b"]] == [6, b2["bl0"]]


def test_b_direct_and_even_gop_rejected():
    import pytest

    from data_transformation_python_spark.operators.h264_codec import (
        h264_decode_gop,
        h264_encode_gop_b,
    )

    frames, nals, _stats, np = _b_fixture()
    with pytest.raises(ValueError, match="odd display-frame count"):
        h264_encode_gop_b(frames[:4], 48, 32, [], [], [])
    # rebuild the first B slice with a sub-16x16 B partition type:
    # out of scope and must fail loudly, never silently mis-decode
    from data_transformation_python_spark.operators.h264_codec import (
        _EgReader,
        _EgWriter,
        _nal,
        _unescape_ebsp,
    )

    b_nal = nals[4]  # SPS PPS IDR P B ...
    rbsp = bytearray(_unescape_ebsp(b_nal[1:]))
    br = _EgReader(bytes(rbsp))
    assert br.ue() == 0 and br.ue() == 6  # first_mb, slice_type B
    assert br.ue() == 0                   # pic_parameter_set_id
    frame_num = br.u(4)                   # log2_max_frame_num = 4
    poc_lsb = br.u(8)                     # log2_max_poc_lsb = 8

    bw = _EgWriter()
    bw.ue(0)                 # first_mb_in_slice
    bw.ue(6)                 # slice_type B
    bw.ue(0)                 # pic_parameter_set_id
    bw.u(frame_num, 4)       # frame_num
    bw.u(poc_lsb, 8)         # pic_order_cnt_lsb
    bw.u(1, 1)               # direct_spatial_mv_pred_flag
    bw.u(0, 1)               # num_ref_idx_active_override_flag
    bw.u(0, 1)               # ref_pic_list_modification_flag_l0
    bw.u(0, 1)               # ref_pic_list_modification_flag_l1
    bw.se(0)                 # slice_qp_delta (nal_ref_idc 0)
    bw.ue(1)                 # disable_deblocking_filter_idc
    bw.ue(0)                 # mb_skip_run 0
    bw.ue(4)                 # mb_type B_L0_L0_16x8: sub-16x16 B part
    bw.rbsp_trailing()
    bad = list(nals)
    bad[4] = _nal(1, bw.tobytes(), ref_idc=0)
    with pytest.raises(NotImplementedError, match="partitions below"):
        h264_decode_gop(bad)


class TestWeightedPrediction:
    """Explicit weighted prediction for P slices (§7.3.3.2
    pred_weight_table + §8.4.2.3.2 single-list scaling)."""

    @staticmethod
    def _texture(doc_id, w, h):
        import numpy as np

        ys, xs = np.mgrid[0:h, 0:w]
        y = (40 + (xs * 19 + ys * 23 + doc_id * 7) % 176).astype(np.uint8)
        cys, cxs = np.mgrid[0 : h // 2, 0 : w // 2]
        cb = (60 + (cxs * 13 + cys * 29) % 136).astype(np.uint8)
        cr = (60 + (cxs * 31 + cys * 11) % 136).astype(np.uint8)
        return y, cb, cr

    @staticmethod
    def _fade(planes, wp):
        ld, wy, oy, cd, wcb, ocb, wcr, ocr = wp
        return (
            hc._wp_plane(planes[0], wy, oy, ld),
            hc._wp_plane(planes[1], wcb, ocb, cd),
            hc._wp_plane(planes[2], wcr, ocr, cd),
        )

    def test_fade_pan_gop_roundtrip_and_census(self):
        """Fade+pan GOP: decode ≡ source bit-for-bit; the census is
        the pan geometry (edge strip P16, interior P_Skip with
        NONZERO derived motion — all under weighting); the parsed
        pred_weight_table echoes through the stats."""
        import numpy as np

        w, h, mv = 48, 32, (8, 8)
        wp = (5, 30, -2, 5, 31, 1, 33, -1)
        f0 = self._texture(3, w, h)
        frames, prev = [f0], f0
        for _t in range(3):
            cur = self._fade(hc.mc_shift_planes(*prev, mv), wp)
            frames.append(cur)
            prev = cur
        nals, enc_stats = hc.h264_encode_gop_pwp(
            frames, w, h, wp, mv_candidates=[mv]
        )
        dec, stats = hc.h264_decode_gop(nals)
        for fr, (fy, fcb, fcr) in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(fy, fcb, fcr))
        pst = [s for s in stats if s["is_p"]]
        mbw, mbh = w // 16, h // 16
        strip = mbw + mbh - 1
        assert [s["p16"] for s in pst] == [strip] * 3
        assert [s["skip"] for s in pst] == [mbw * mbh - strip] * 3
        assert all(s["ipcm"] == 0 for s in pst)
        for s in pst:
            assert (
                s["wp_log2_denom"], s["wp_luma_w"], s["wp_luma_off"],
                s["wp_cb_w"], s["wp_cb_off"],
                s["wp_cr_w"], s["wp_cr_off"],
            ) == (5, 30, -2, 31, 1, 33, -1)
        # encoder and decoder censuses agree
        assert [s["p16"] for s in enc_stats if s["is_p"]] == [strip] * 3

    def test_fractional_pel_fade(self):
        """WP applies AFTER §8.4.2.2 interpolation: a half-pel pan
        composed with a fade still codes losslessly as inter."""
        import numpy as np

        w, h, mv = 32, 32, (2, 0)  # half-pel luma, quarter-pel chroma
        wp = (5, 31, 1, 5, 32, -2, 30, 2)
        f0 = self._texture(7, w, h)
        f1 = self._fade(hc.mc_interp_planes(*f0, mv), wp)
        nals, _ = hc.h264_encode_gop_pwp([f0, f1], w, h, wp,
                                         mv_candidates=[mv])
        dec, stats = hc.h264_decode_gop(nals)
        assert np.array_equal(dec[1], hc._yuv420_to_rgb(*f1))
        p = next(s for s in stats if s["is_p"])
        assert p["ipcm"] == 0 and p["p16"] + p["skip"] == 4

    def test_default_weight_flags(self):
        """Identity weights are written as flag-0 table entries
        (§7.4.3.2 defaults: w = 2^logWD, o = 0) and parse back as the
        identity — a pure-pan GOP under an identity weighted PPS
        decodes identically to the unweighted encoder's."""
        import numpy as np

        w, h, mv = 48, 16, (8, 0)
        ident = (5, 32, 0, 6, 64, 0, 64, 0)  # both flags take the 0 path
        f0 = self._texture(11, w, h)
        f1 = hc.mc_shift_planes(*f0, mv)
        f2 = hc.mc_shift_planes(*f1, mv)
        nals_wp, _ = hc.h264_encode_gop_pwp([f0, f1, f2], w, h, ident,
                                            mv_candidates=[mv])
        nals_plain, _ = hc.h264_encode_gop_p([f0, f1, f2], w, h,
                                             mv_candidates=[mv])
        dec_wp, st_wp = hc.h264_decode_gop(nals_wp)
        dec_plain, st_plain = hc.h264_decode_gop(nals_plain)
        for a, b in zip(dec_wp, dec_plain):
            assert np.array_equal(a, b)
        pst = [s for s in st_wp if s["is_p"]]
        assert all(s["wp_luma_w"] == 32 and s["wp_luma_off"] == 0
                   and s["wp_cb_w"] == 64 and s["wp_cr_off"] == 0
                   for s in pst)
        assert (
            [(s["skip"], s["p16"]) for s in pst]
            == [(s["skip"], s["p16"]) for s in st_plain if s["is_p"]]
        )

    def test_clipping_stays_closed_loop(self):
        """Gains above 1 with large offsets saturate samples at 255;
        Clip1 is part of eq. 8-270 on BOTH sides, so the loop stays
        closed even through saturation."""
        import numpy as np

        w, h = 32, 16
        wp = (5, 40, 60, 5, 40, 60, 40, 60)  # ×1.25 + 60 → saturates
        f0 = self._texture(5, w, h)
        frames, prev = [f0], f0
        for _t in range(2):
            cur = self._fade(prev, wp)
            frames.append(cur)
            prev = cur
        assert frames[2][0].max() == 255  # saturation actually happened
        nals, _ = hc.h264_encode_gop_pwp(frames, w, h, wp)
        dec, stats = hc.h264_decode_gop(nals)
        for fr, (fy, fcb, fcr) in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(fy, fcb, fcr))
        assert all(s["skip"] == 2 for s in stats if s["is_p"])

    def test_wp_fixture_and_metadata_shape(self):
        """The Spark fixture's stream decodes to its own rec_md5 and
        the pure-geometry census the oracle recomputes."""
        import hashlib

        payload, rec_md5 = mm._write_h264wp(4)
        nals = hc.split_annexb(payload)
        assert len(nals) == 7
        frames, stats = hc.h264_decode_gop(nals)
        md5 = hashlib.md5()
        for fr in frames:
            md5.update(fr.tobytes())
        assert md5.hexdigest() == rec_md5
        # doc 4: mbw 3, mbh 1, flavors t=1..4 → 2,0,1,2
        pst = [s for s in stats if s["is_p"]]
        assert sum(s["ipcm"] for s in pst) == 2
        assert sum(s["p16"] for s in pst) == 3  # one pan frame, strip 3
        assert sum(s["skip"] for s in pst) == 4 * 3 - 2 - 3


class TestMultiSlice:
    """Multi-slice pictures: §7.4.3 first_mb_in_slice, §7.2
    more_rbsp_data slice-end detection, §6.4.9 cross-slice neighbour
    unavailability."""

    @staticmethod
    def _pan_gop(doc_id, w, h, mv, nf=5):
        import numpy as np

        ys, xs = np.mgrid[0:h, 0:w]
        y = (40 + (xs * 19 + ys * 23 + doc_id * 7) % 176).astype(np.uint8)
        cys, cxs = np.mgrid[0 : h // 2, 0 : w // 2]
        cb = (60 + (cxs * 13 + cys * 29) % 136).astype(np.uint8)
        cr = (60 + (cxs * 31 + cys * 11) % 136).astype(np.uint8)
        frames, prev = [(y, cb, cr)], (y, cb, cr)
        for _ in range(nf - 1):
            cur = hc.mc_shift_planes(*prev, mv)
            frames.append(cur)
            prev = cur
        return frames

    def test_roundtrip_and_slice_boundary_census(self):
        """Each slice's first row re-anchors the motion field (skip
        derivation returns 0 across the boundary), so a pan picture
        codes S*mbw + (mbh - S) P16 MBs; the decode is bit-exact."""
        import numpy as np

        w, h, mv, S = 48, 64, (8, 8), 3  # 3x4 MBs, 3 slices
        frames = self._pan_gop(1, w, h, mv)
        nals, enc_stats = hc.h264_encode_gop_p_ms(
            frames, w, h, S, mv_candidates=[mv]
        )
        dec, stats = hc.h264_decode_gop(nals)
        for fr, f in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f))
        mbw, mbh = w // 16, h // 16
        pst = [s for s in stats if s["is_p"]]
        assert all(s["n_slices"] == S for s in stats)
        assert [s["p16"] for s in pst] == [S * mbw + mbh - S] * 4
        assert [s["skip"] for s in pst] == [
            mbw * mbh - S * mbw - mbh + S
        ] * 4
        # single-slice control: SAME content, strip census instead
        nals1, _ = hc.h264_encode_gop_p_ms(frames, w, h, 1,
                                           mv_candidates=[mv])
        _, st1 = hc.h264_decode_gop(nals1)
        assert [s["p16"] for s in st1 if s["is_p"]] == [mbw + mbh - 1] * 4

    def test_single_slice_bitstream_unchanged(self):
        """n_slices=1 through the multi-slice encoder emits the exact
        bytes of the classic single-slice encoder — the refactor
        cannot have moved a bit."""
        w, h, mv = 48, 32, (8, 0)
        frames = self._pan_gop(2, w, h, mv)
        a, _ = hc.h264_encode_gop_p_ms(frames, w, h, 1, mv_candidates=[mv])
        b, _ = hc.h264_encode_gop_p(frames, w, h, mv_candidates=[mv])
        assert a == b

    def test_weighted_multislice_composes(self):
        """Per-slice pred_weight_tables: WP and multi-slice compose
        losslessly on fade+pan content."""
        import numpy as np

        w, h, mv, S = 32, 48, (8, 0), 2
        wp = (5, 30, 1, 5, 31, -1, 33, 0)
        frames = [None]
        base = self._pan_gop(3, w, h, mv, nf=1)[0]
        frames = [base]
        prev = base
        for _ in range(3):
            shifted = hc.mc_shift_planes(*prev, mv)
            cur = (
                hc._wp_plane(shifted[0], wp[1], wp[2], wp[0]),
                hc._wp_plane(shifted[1], wp[4], wp[5], wp[3]),
                hc._wp_plane(shifted[2], wp[6], wp[7], wp[3]),
            )
            frames.append(cur)
            prev = cur
        nals, _ = hc.h264_encode_gop_p_ms(frames, w, h, S,
                                          mv_candidates=[mv], wp=wp)
        dec, stats = hc.h264_decode_gop(nals)
        for fr, f in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f))
        pst = [s for s in stats if s["is_p"]]
        assert all(s["wp_luma_w"] == 30 and s["n_slices"] == S
                   for s in pst)

    def test_slice_gap_and_truncation_rejected(self):
        """A continuation slice that skips ahead, and a stream ending
        mid-picture, both fail loudly instead of mis-decoding."""
        import pytest

        w, h, mv, S = 32, 32, (8, 0), 2
        frames = self._pan_gop(4, w, h, mv, nf=2)
        nals, _ = hc.h264_encode_gop_p_ms(frames, w, h, S,
                                          mv_candidates=[mv])
        # nals: SPS PPS IDR0 IDR1 P0 P1 — drop a continuation slice:
        # the incomplete IDR never reaches the DPB, so the following
        # P slice fails loudly at reference lookup
        with pytest.raises(ValueError,
                           match="reference|incomplete|gap|open"):
            hc.h264_decode_gop([nals[0], nals[1], nals[2], nals[4],
                                nals[5]])
        # stream truncated inside the last picture
        with pytest.raises(ValueError, match="ended inside"):
            hc.h264_decode_gop(nals[:-1])
        # continuation without any open picture
        with pytest.raises(ValueError, match="without an open"):
            hc.h264_decode_gop([nals[0], nals[1], nals[3]])


class TestMultiSliceFuzz:
    """Property-based: ANY content (including pathological uniform /
    saturated planes), ANY row split, ANY weight table → the
    multi-slice encode→decode loop must stay closed bit-for-bit.
    The encoder only emits modes it verified lossless, so the
    invariant is decoder-side: slice stitching, more_rbsp_data
    termination, and §6.4.9 availability must reproduce the
    encoder's exact reconstruction."""

    def test_random_gops_roundtrip(self):
        import numpy as np

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            seed=st.integers(0, 2**31 - 1),
            mbw=st.integers(1, 4),
            mbh=st.integers(1, 4),
            n_frames=st.integers(2, 4),
            wp_on=st.booleans(),
        )
        def run(seed, mbw, mbh, n_frames, wp_on):
            rng = np.random.default_rng(seed)
            w, h = mbw * 16, mbh * 16
            n_slices = int(rng.integers(1, mbh + 1))
            wp = None
            if wp_on:
                ld = int(rng.integers(0, 7))
                cd = int(rng.integers(0, 7))
                wp = (
                    ld,
                    int(rng.integers(-32, 65)), int(rng.integers(-16, 17)),
                    cd,
                    int(rng.integers(-32, 65)), int(rng.integers(-16, 17)),
                    int(rng.integers(-32, 65)), int(rng.integers(-16, 17)),
                )
            mv = (int(rng.integers(-2, 3)) * 8, int(rng.integers(-2, 3)) * 8)

            def rnd_frame():
                return (
                    rng.integers(0, 256, (h, w), dtype=np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                )

            frames = [rnd_frame()]
            for t in range(1, n_frames):
                kind = int(rng.integers(0, 3))
                if kind == 0:
                    cur = rnd_frame()  # scene cut → I_PCM replenishment
                else:
                    cur = hc.mc_shift_planes(*frames[-1], mv)
                    if wp is not None:
                        cur = (
                            hc._wp_plane(cur[0], wp[1], wp[2], wp[0]),
                            hc._wp_plane(cur[1], wp[4], wp[5], wp[3]),
                            hc._wp_plane(cur[2], wp[6], wp[7], wp[3]),
                        )
                    if kind == 2:  # partial replenishment
                        cur = tuple(pl.copy() for pl in cur)
                        pmx = int(rng.integers(0, mbw))
                        pmy = int(rng.integers(0, mbh))
                        cur[0][pmy * 16 : pmy * 16 + 16,
                               pmx * 16 : pmx * 16 + 16] = rng.integers(
                            0, 256, (16, 16), dtype=np.uint8
                        )
                frames.append(cur)
            nals, _ = hc.h264_encode_gop_p_ms(
                frames, w, h, n_slices, mv_candidates=[mv], wp=wp
            )
            dec, stats = hc.h264_decode_gop(nals)
            assert len(dec) == n_frames
            for fr, f in zip(dec, frames):
                assert np.array_equal(fr, hc._yuv420_to_rgb(*f))
            assert all(s["n_slices"] == n_slices for s in stats)

        run()


class TestWeightedBiPrediction:
    """Explicit weighted bi-prediction (weighted_bipred_idc 1): the
    two-list §7.3.3.2 pred_weight_table and §8.4.2.3.2
    eq. 8-270/8-272."""

    @staticmethod
    def _fixture(doc_id=1):
        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        payload, rec = mm._write_h264wb(doc_id)
        return hc.split_annexb(payload), rec, mm._h264b_dims(doc_id)

    def test_roundtrip_and_sharpened_census(self):
        """Distinct per-list weights make the L1-built picture decode
        ENTIRELY B_L1 (the unweighted twin's interior went B_L0 via
        shift composition) — and the decode is bit-exact."""
        import hashlib

        nals, rec, (w, h, _mvx, _mvy) = self._fixture(1)
        frames, stats = hc.h264_decode_gop(nals)
        md5 = hashlib.md5()
        for fr in frames:
            md5.update(fr.tobytes())
        assert md5.hexdigest() == rec
        mbs = (w // 16) * (h // 16)
        bst = [s for s in stats if s["is_b"]]
        # doc 1 flavors: B0 = L1-built, B1 = bi-built
        assert [(s["bl0"], s["bl1"], s["bbi"]) for s in bst] == [
            (0, mbs, 0), (0, 0, mbs)
        ]
        assert all(s["wpb_l0_w"] == 28 and s["wpb_l1_w"] == 34
                   for s in bst)

    def test_eq8_272_formula(self):
        """The bi formula is the spec's, not a weighted mean rebuilt
        differently: hand-check one pixel."""
        import numpy as np

        p0 = np.array([[100]], np.uint8)
        p1 = np.array([[200]], np.uint8)
        # ((100*27 + 200*35 + 32) >> 6) + ((-8 + 8 + 1) >> 1)
        expect = ((100 * 27 + 200 * 35 + 32) >> 6) + 0
        got = hc._wpb_bi_plane(p0, p1, 27, 35, -8, 8, 5)
        assert int(got[0, 0]) == expect
        # offset rounding is the SHARED mean, floor-shifted
        got2 = hc._wpb_bi_plane(p0, p1, 27, 35, -8, 5, 5)
        assert int(got2[0, 0]) == ((100 * 27 + 200 * 35 + 32) >> 6) + (
            (-8 + 5 + 1) >> 1
        )

    def test_identity_tables_match_unweighted(self):
        """An all-identity two-list table (flag-0 entries both lists)
        decodes bit-identically to the unweighted B encoder."""
        import numpy as np

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        doc = 3
        w, h, mvx, mvy = mm._h264b_dims(doc)
        mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
        f0 = mm._h264wp_frame0(doc, w, h)
        pf1 = hc.mc_shift_planes(*f0, two)
        b1 = hc.mc_shift_planes(*f0, mv)  # L0-exact midpoint
        pf2 = hc.mc_shift_planes(*pf1, two)
        b2 = hc.mc_shift_planes(*pf1, mv)
        frames = [f0, b1, pf1, b2, pf2]
        ident = (4, 6, (16, 0, 64, 0, 64, 0), (16, 0, 64, 0, 64, 0))
        n_w, _ = hc.h264_encode_gop_b(frames, w, h, [mv], [neg],
                                      [(mv, neg)], [two], wpb=ident)
        n_p, _ = hc.h264_encode_gop_b(frames, w, h, [mv], [neg],
                                      [(mv, neg)], [two])
        d_w, st_w = hc.h264_decode_gop(n_w)
        d_p, st_p = hc.h264_decode_gop(n_p)
        for a, b in zip(d_w, d_p):
            assert np.array_equal(a, b)
        assert [s["bl0"] for s in st_w] == [s["bl0"] for s in st_p]

    def test_implicit_equidistant_equals_default_mean(self):
        """§8.4.2.3.1: an EQUIDISTANT B picture derives exactly
        (32, 32), so flipping an unweighted IBPBP stream's PPS to
        weighted_bipred_idc 2 decodes bit-identically — the implicit
        ladder (tb/td clip, tx, DistScaleFactor) lands on the default
        mean, not near it."""
        import numpy as np

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        payload, _rec = mm._write_h264b(4)  # unweighted IBPBP twin
        nals = hc.split_annexb(payload)
        imp = list(nals)
        imp[1] = hc._nal(8, hc._pps_rbsp(weighted_bipred_idc=2))
        d0, s0 = hc.h264_decode_gop(nals)
        d2, s2 = hc.h264_decode_gop(imp)
        for a, b in zip(d0, d2):
            assert np.array_equal(a, b)
        assert all(s.get("wbi_w0") == 32 and s.get("wbi_w1") == 32
                   for s in s2 if s["is_b"])
        assert hc._implicit_bi_weights(2, 0, 4) == (32, 32)


class TestImplicitBiPrediction:
    """Implicit weighted bi-prediction (weighted_bipred_idc 2): the
    §8.4.2.3.1 POC-distance ladder, nothing signalled."""

    def test_weight_ladder(self):
        # uneven I(BB)P span 0..6: early/late B
        assert hc._implicit_bi_weights(2, 0, 6) == (43, 21)
        assert hc._implicit_bi_weights(4, 0, 6) == (22, 42)
        # equidistant → exactly the default mean weights
        assert hc._implicit_bi_weights(2, 0, 4) == (32, 32)
        # degenerate: identical POCs → default
        assert hc._implicit_bi_weights(3, 5, 5) == (32, 32)

    def test_ibbp_gop_roundtrip_census_and_derived_weights(self):
        import hashlib

        import numpy as np

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        doc = 1
        w, h, _mvx, _mvy = mm._h264b_dims(doc)
        payload, rec = mm._write_h264wi(doc)
        nals = hc.split_annexb(payload)
        frames, stats = hc.h264_decode_gop(nals)
        md5 = hashlib.md5()
        for fr in frames:
            md5.update(fr.tobytes())
        assert md5.hexdigest() == rec
        mbs = (w // 16) * (h // 16)
        bst = [s for s in stats if s["is_b"]]
        # early Bs: all B_Bi under (43,21); late Bs: plain-copy L0 +
        # one I_PCM (implicit leaves one-list prediction unweighted)
        assert [(s["bbi"], s["bl0"], s["ipcm"]) for s in bst] == [
            (mbs, 0, 0), (0, mbs - 1, 1),
            (mbs, 0, 0), (0, mbs - 1, 1),
        ]
        assert [(s["wbi_w0"], s["wbi_w1"]) for s in bst] == [
            (43, 21), (22, 42), (43, 21), (22, 42),
        ]
        # display-order POC reordering held for the 7-frame GOP
        assert len(frames) == 7


class TestBDirectSpatial:
    """B_Skip / B_Direct_16x16 via §8.4.1.2.2 spatial direct: refIdx
    MinPositive, per-list medians, colZeroFlag on the colocated
    motion field reference pictures now carry into the DPB."""

    @staticmethod
    def _gop(doc=1, as_coded=False):
        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        import numpy as np

        w, h, mvx, mvy = mm._h264b_dims(doc)
        mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
        f0 = mm._h264wp_frame0(doc, w, h)
        pf1 = hc.mc_shift_planes(*f0, two)
        b1 = hc.mc_shift_planes(*f0, mv)           # L0-seedable pan
        pf2 = hc.mc_shift_planes(*pf1, two)
        b2 = hc.mc_shift_planes(*pf2, neg)         # future-built
        frames = [f0, b1, pf1, b2, pf2]
        nals, stats = hc.h264_encode_gop_b(
            frames, w, h, [mv], [neg], [(mv, neg)], [two],
            direct=True, direct_as_coded=as_coded,
        )
        return frames, nals, stats, (w, h), np

    def test_skip_field_propagates_seed_motion(self):
        frames, nals, _enc, (w, h), np = self._gop(1)
        dec, stats = hc.h264_decode_gop(nals)
        for fr, f in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f))
        mbs = (w // 16) * (h // 16)
        bst = [s for s in stats if s["is_b"]]
        # one coded seed per B picture, everything else B_Skip
        assert [(s["bl0"] + s["bl1"], s["bskip"]) for s in bst] == [
            (1, mbs - 1), (1, mbs - 1)
        ]
        # the L1-flavor picture seeds B_L1 and skips ONE-LIST L1
        # direct (use0 stays False through the median chain)
        assert bst[1]["bl1"] == 1 and bst[1]["bl0"] == 0

    def test_direct_coded_form_decodes_identically(self):
        """B_Direct_16x16 + cbp 0 macroblocks (mb_type 0) are the
        bit-different, decode-identical twin of the skip run."""
        frames, nals_s, _e1, _dims, np = self._gop(2)
        _f2, nals_c, _e2, _d2, _np = self._gop(2, as_coded=True)
        assert nals_s != nals_c
        dec_s, st_s = hc.h264_decode_gop(nals_s)
        dec_c, st_c = hc.h264_decode_gop(nals_c)
        for a, b in zip(dec_s, dec_c):
            assert np.array_equal(a, b)
        bs = [s for s in st_s if s["is_b"]]
        bc = [s for s in st_c if s["is_b"]]
        assert sum(s["bskip"] for s in bs) == sum(s["bdir"] for s in bc)
        assert all(s["bskip"] == 0 for s in bc)

    def test_col_zero_flag_zeroes_static_motion(self):
        """A STATIC GOP (refs identical): seeds code zero-motion, the
        colocated P is all-skip at derived mv 0 → colZeroFlag fires
        and the direct field zeroes — reconstruction stays exact."""
        import numpy as np

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        w, h = 48, 32
        f0 = mm._h264wp_frame0(7, w, h)
        frames = [f0, f0, f0, f0, f0]  # fully static IBPBP
        nals, _ = hc.h264_encode_gop_b(
            frames, w, h, [(0, 0)], [(0, 0)], [((0, 0), (0, 0))],
            [(0, 0)], direct=True,
        )
        dec, stats = hc.h264_decode_gop(nals)
        for fr in dec:
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f0))
        bst = [s for s in stats if s["is_b"]]
        mbs = (w // 16) * (h // 16)
        # static content: EVERY B macroblock skips (first MB hits
        # directZeroPrediction, which matches static content)
        assert [(s["bskip"], s["bl0"]) for s in bst] == [(mbs, 0)] * 2
        pst = [s for s in stats if s["is_p"]]
        assert all(s["skip"] == mbs for s in pst)  # colocated all-skip


def test_b_direct_fuzz_roundtrip():
    """Property-based: random GOP content (scene cuts, pans, partial
    replenishment, occasionally STATIC pictures that drive
    colZeroFlag and directZeroPrediction) through the direct-enabled
    B encoder must stay bit-exact — the encoder only emits what its
    shared derivation verified, so the invariant is that the
    decoder's derivation chain (refIdx MinPositive, medians,
    colocated lookups) lands on the same integers."""
    import numpy as np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        mbw=st.integers(1, 3),
        mbh=st.integers(1, 3),
        as_coded=st.booleans(),
    )
    def run(seed, mbw, mbh, as_coded):
        rng = np.random.default_rng(seed)
        w, h = mbw * 16, mbh * 16
        mv = (int(rng.integers(-1, 2)) * 8, int(rng.integers(-1, 2)) * 8)
        neg = (-mv[0], -mv[1])
        two = (2 * mv[0], 2 * mv[1])

        def rnd():
            return (
                rng.integers(0, 256, (h, w), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            )

        f0 = rnd()
        p1 = hc.mc_shift_planes(*f0, two)
        p2 = hc.mc_shift_planes(*p1, two)
        kind = int(rng.integers(0, 3))
        if kind == 0:
            b1 = hc.mc_shift_planes(*f0, mv)     # L0-matchable pan
        elif kind == 1:
            b1 = hc.mc_shift_planes(*p1, neg)    # L1-matchable
        else:
            b1 = rnd()                           # scene cut → I_PCM
        b2 = [pl.copy() for pl in hc.mc_shift_planes(*p1, mv)]
        pmx = int(rng.integers(0, mbw))
        b2[0][0:16, pmx * 16 : pmx * 16 + 16] = rng.integers(
            0, 256, (16, 16), dtype=np.uint8
        )
        frames = [f0, b1, p1, tuple(b2), p2]
        nals, _ = hc.h264_encode_gop_b(
            frames, w, h, [mv], [neg], [(mv, neg)], [two],
            direct=True, direct_as_coded=as_coded,
        )
        dec, stats = hc.h264_decode_gop(nals)
        for fr, f in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f))

    run()


class TestTemporalDirect:
    """Temporal direct mode (§8.4.1.2.3): colocated MV scaled by POC
    distance, no neighbour seeding."""

    def test_all_skip_roundtrip_and_scaling(self):
        import hashlib

        import numpy as np

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        doc = 3
        w, h, _mvx, _mvy = mm._h264b_dims(doc)
        payload, rec = mm._write_h264td(doc)
        nals = hc.split_annexb(payload)
        frames, stats = hc.h264_decode_gop(nals)
        md5 = hashlib.md5()
        for fr in frames:
            md5.update(fr.tobytes())
        assert md5.hexdigest() == rec
        mbs = (w // 16) * (h // 16)
        bst = [s for s in stats if s["is_b"]]
        # ZERO coded B macroblocks — temporal direct needs no seeds
        assert sum(s["bl0"] + s["bl1"] + s["bbi"] for s in bst) == 0
        assert sum(s["bskip"] for s in bst) == 2 * mbs - 1
        assert sum(s["ipcm"] for s in bst) == 1

    def test_scaling_formula(self):
        """Midpoint POC ratio → DistScaleFactor 128 → mvL0 is exactly
        half the colocated vector; asymmetric ratios scale
        accordingly; intra colocated derives zero motion."""
        import numpy as np

        col_mv = np.zeros((4, 4, 2), np.int64)
        col_mv[:, :] = (16, 8)
        col_inter = np.ones((4, 4), bool)
        blocks = hc._temporal_direct(0, 0, (col_mv, col_inter), 2, 0, 4)
        assert blocks == [((8, 4), (-8, -4))] * 4
        # early-B of a 0..6 span: DSF 85 → mvL0 = (85*16+128)>>8 = 5
        blocks = hc._temporal_direct(0, 0, (col_mv, col_inter), 2, 0, 6)
        assert blocks[0][0] == (5, 3) and blocks[0][1] == (-11, -5)
        # intra colocated → both derived vectors zero
        blocks = hc._temporal_direct(
            0, 0, (col_mv, np.zeros((4, 4), bool)), 2, 0, 4
        )
        assert blocks == [((0, 0), (0, 0))] * 4


class TestMultiSliceB:
    """Multi-slice B pictures (round 12): per-slice two-list
    pred_weight_tables, §6.4.9 spatial-direct re-anchoring at slice
    boundaries, and per-list medians across continuation slices."""

    @staticmethod
    def _fixture(doc_id):
        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        return mm._write_h264msb(doc_id), mm._h264ms_dims(doc_id)

    def test_roundtrip_and_reanchor_census(self):
        """Spatial direct re-anchors at every slice boundary: each
        slice opens with a coded B_L0 seed (directZeroPrediction
        never matches pan content), the rest rides B_Skip; the
        accumulated per-slice L0 luma weight sum pins every parsed
        table.  Decode is bit-exact under the per-slice weighting."""
        import hashlib

        for doc in (0, 4, 8, 17):  # n_slices 2, 3, 4, 4
            (payload, rec), (w, h, S, _x, _y) = self._fixture(doc)
            nals = hc.split_annexb(payload)
            assert len(nals) == 2 + 5 * S
            frames, stats = hc.h264_decode_gop(nals)
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec
            mbs = (w // 16) * (h // 16)
            bst = [s for s in stats if s["is_b"]]
            assert all(s["n_slices"] == S for s in stats)
            assert sum(s["bl0"] for s in bst) == 2 * S
            assert sum(s["bskip"] for s in bst) == 2 * (mbs - S)
            assert sum(s["bl1"] + s["bbi"] + s["bdir"] + s["ipcm"]
                       for s in bst) == 0
            assert sum(s["wpb_luma_w_sum"] for s in bst) == 2 * sum(
                30 + (doc + k) % 3 for k in range(S)
            )

    def test_single_slice_bitstream_unchanged(self):
        """n_slices=1 through the multi-slice B encoder emits the
        exact bytes of the classic gop_b encoder — the refactor
        cannot have moved a bit (so every prior B gate replays)."""
        import numpy as np

        w, h, mv = 48, 32, (8, 8)
        neg, two = (-8, -8), (16, 16)
        ys, xs = np.mgrid[0:h, 0:w]
        y = (40 + (xs * 19 + ys * 23) % 176).astype(np.uint8)
        cys, cxs = np.mgrid[0 : h // 2, 0 : w // 2]
        cbp = (60 + (cxs * 13 + cys * 29) % 136).astype(np.uint8)
        crp = (60 + (cxs * 31 + cys * 11) % 136).astype(np.uint8)
        f0 = (y, cbp, crp)
        frames, prev = [f0], f0
        for _ in range(2):
            pfr = hc.mc_shift_planes(*prev, two)
            frames.extend([hc.mc_shift_planes(*prev, mv), pfr])
            prev = pfr
        kw = dict(l0_candidates=[mv], l1_candidates=[neg],
                  bi_candidates=[(mv, neg)], p_candidates=[two],
                  direct=True)
        a, _ = hc.h264_encode_gop_b_ms(frames, w, h, 1, **kw)
        b, _ = hc.h264_encode_gop_b(frames, w, h, **kw)
        assert a == b
        wpb = (5, 5, (30, 1, 31, 0, 33, -1), (32, 0, 32, 0, 32, 0))
        fw = [f0]
        prev = f0
        for _ in range(2):
            pfr = hc.mc_shift_planes(*prev, two)
            base = hc.mc_shift_planes(*prev, mv)
            bf = (hc._wp_plane(base[0], 30, 1, 5),
                  hc._wp_plane(base[1], 31, 0, 5),
                  hc._wp_plane(base[2], 33, -1, 5))
            fw.extend([bf, pfr])
            prev = pfr
        kw.pop("direct")
        a, _ = hc.h264_encode_gop_b_ms(fw, w, h, 1, wpb_slices=[wpb],
                                       **kw)
        b, _ = hc.h264_encode_gop_b(fw, w, h, wpb=wpb, **kw)
        assert a == b

    def test_temporal_direct_needs_no_seeds_across_slices(self):
        """The contrast case: TEMPORAL direct derives from the
        colocated picture, not neighbours, so a multi-slice B picture
        with bi-mean content rides B_Skip EVERYWHERE — zero per-slice
        seeds — proving the re-anchoring census is a spatial-direct
        (neighbour-availability) effect, not a slice-header tax."""
        import numpy as np

        w, h, S, mv = 32, 48, 3, (8, 8)
        neg, two = (-8, -8), (16, 16)
        ys, xs = np.mgrid[0:h, 0:w]
        y = (40 + (xs * 19 + ys * 23) % 176).astype(np.uint8)
        cys, cxs = np.mgrid[0 : h // 2, 0 : w // 2]
        cbp = (60 + (cxs * 13 + cys * 29) % 136).astype(np.uint8)
        crp = (60 + (cxs * 31 + cys * 11) % 136).astype(np.uint8)
        f0 = (y, cbp, crp)
        frames, prev = [f0], f0
        for _ in range(2):
            pfr = hc.mc_shift_planes(*prev, two)
            a0 = hc.mc_shift_planes(*prev, mv)
            a1 = hc.mc_shift_planes(*pfr, neg)
            b = tuple(
                ((p.astype(np.int64) + q.astype(np.int64) + 1) >> 1)
                .astype(np.uint8)
                for p, q in zip(a0, a1)
            )
            frames.extend([b, pfr])
            prev = pfr
        nals, _ = hc.h264_encode_gop_b_ms(
            frames, w, h, S,
            l0_candidates=[mv], l1_candidates=[neg],
            bi_candidates=[(mv, neg)], p_candidates=[two],
            direct=True, direct_mode="temporal",
        )
        dec, stats = hc.h264_decode_gop(nals)
        for fr, f in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f))
        mbs = (w // 16) * (h // 16)
        bst = [s for s in stats if s["is_b"]]
        assert sum(s["bskip"] for s in bst) == 2 * mbs
        assert sum(s["bl0"] + s["bl1"] + s["bbi"] for s in bst) == 0

    def test_mixed_slice_types_rejected(self):
        """A P continuation slice inside an open B picture (and vice
        versa) fails loudly instead of mis-decoding."""
        import pytest

        (payload, _rec), (w, h, S, _x, _y) = self._fixture(4)
        nals = hc.split_annexb(payload)
        # layout: SPS PPS IDR*S P*S B*S P*S B*S; splice a P
        # continuation (first_mb > 0) where a B continuation belongs
        p_cont = nals[2 + S + 1]        # P picture, slice 1
        b_first = nals[2 + 2 * S]       # B picture, slice 0
        bad = nals[: 2 + 2 * S + 1] + [p_cont]
        with pytest.raises((NotImplementedError, ValueError),
                           match="mixed|gap"):
            hc.h264_decode_gop(bad)
        # and a B continuation inside an open P picture — rejected
        # loudly too (here at B reference validation, which runs
        # before the continuation-type check: the open P never
        # completed, so the DPB lacks the B's temporal sides)
        b_cont = nals[2 + 2 * S + 1]    # B picture, slice 1
        bad = nals[: 2 + S + 1] + [b_cont]
        with pytest.raises((NotImplementedError, ValueError),
                           match="mixed|gap|reference"):
            hc.h264_decode_gop(bad)


class TestB8x8SubMacroblocks:
    """B_8x8 (Table 7-14 mb_type 22 / Table 7-18 sub_mb_types 1-3,
    round 12): four independent per-list motion derivations per
    macroblock, §7.3.5.2 two-loop mvd order."""

    def test_roundtrip_and_mode_census(self):
        import hashlib

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        for doc in (0, 1, 2, 3, 7):  # all four pattern rotations
            payload, rec = mm._write_h264b8(doc)
            nals = hc.split_annexb(payload)
            frames, stats = hc.h264_decode_gop(nals)
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec, doc
            w, h, _x, _y = mm._h264b_dims(doc)
            mbs = (w // 16) * (h // 16)
            bst = [s for s in stats if s["is_b"]]
            assert sum(s["b8x8"] for s in bst) == 2 * mbs
            assert sum(s["b8_l0"] for s in bst) == 4 * mbs
            assert sum(s["b8_l1"] for s in bst) == 2 * mbs
            assert sum(s["b8_bi"] for s in bst) == 2 * mbs
            assert sum(s["bl0"] + s["bl1"] + s["bbi"] + s["ipcm"]
                       for s in bst) == 0

    def test_weighted_bi_composes_with_sub_partitions(self):
        """Explicit weighted bi-prediction applies per sub-macroblock
        through eq. 8-270/8-272: a quadrant mosaic whose parts are
        weighted one-list scalings / weighted bi means stays a
        lossless closed loop."""
        import numpy as np

        w, h, mv = 32, 32, (8, 8)
        neg, two = (-8, -8), (16, 16)
        wpb = (5, 5, (30, 1, 31, 0, 33, -1), (34, -1, 32, 0, 32, 0))
        ys, xs = np.mgrid[0:h, 0:w]
        y = (40 + (xs * 19 + ys * 23) % 176).astype(np.uint8)
        cys, cxs = np.mgrid[0 : h // 2, 0 : w // 2]
        cbp = (60 + (cxs * 13 + cys * 29) % 136).astype(np.uint8)
        crp = (60 + (cxs * 31 + cys * 11) % 136).astype(np.uint8)
        f0 = (y, cbp, crp)
        modes, mbw, mbh = (1, 2, 3, 1), w // 16, h // 16
        mvs = (mv, neg, (mv, neg), (16, 0))

        def wp1(planes, lst):
            ld, cd, l0, l1 = wpb
            t = l0 if lst == 0 else l1
            return (
                hc._wp_plane(planes[0], t[0], t[1], ld),
                hc._wp_plane(planes[1], t[2], t[3], cd),
                hc._wp_plane(planes[2], t[4], t[5], cd),
            )

        def mosaic(prev, pfr):
            A = wp1(hc.mc_shift_planes(*prev, mv), 0)
            B = wp1(hc.mc_shift_planes(*pfr, neg), 1)
            C = hc._wpb_bi(
                hc.mc_shift_planes(*prev, mv),
                hc.mc_shift_planes(*pfr, neg), wpb,
            )
            D = wp1(hc.mc_shift_planes(*prev, (16, 0)), 0)
            srcs = [A, B, C, D]
            out = [p.copy().astype(np.uint8) for p in A]
            for my in range(mbh):
                for mx in range(mbw):
                    for part, s in enumerate(srcs):
                        (lx, ly, lw, lh), (cx, cy, cw, ch) = (
                            hc._PART_GEOM8[part]
                        )
                        out[0][my * 16 + ly : my * 16 + ly + lh,
                               mx * 16 + lx : mx * 16 + lx + lw] = (
                            s[0][my * 16 + ly : my * 16 + ly + lh,
                                 mx * 16 + lx : mx * 16 + lx + lw]
                        )
                        for pi in (1, 2):
                            out[pi][my * 8 + cy : my * 8 + cy + ch,
                                    mx * 8 + cx : mx * 8 + cx + cw] = (
                                s[pi][my * 8 + cy : my * 8 + cy + ch,
                                      mx * 8 + cx : mx * 8 + cx + cw]
                            )
            return tuple(p.astype(np.uint8) for p in out)

        frames, prev = [f0], f0
        for _ in range(2):
            pfr = hc.mc_shift_planes(*prev, two)
            frames.extend([mosaic(prev, pfr), pfr])
            prev = pfr
        nals, _ = hc.h264_encode_gop_b(
            frames, w, h,
            l0_candidates=[mv], l1_candidates=[neg],
            bi_candidates=[(mv, neg)], p_candidates=[two],
            wpb=wpb, sub_candidates=[(modes, mvs)],
        )
        dec, stats = hc.h264_decode_gop(nals)
        for fr, f in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f))
        bst = [s for s in stats if s["is_b"]]
        assert sum(s["b8x8"] for s in bst) == 2 * mbw * mbh

    def test_encoder_stats_symmetric_with_decoder(self, monkeypatch):
        """r12 advice: the encoder's B_8x8 branch must census
        b8_l0/b8_l1/b8_bi exactly like the decoder (it used to
        increment only b8x8/b8_dir/b8_split/b8_parts, so any future
        encode-vs-decode stats comparison would read 0 L0/L1/Bi
        sub-blocks on the encoder side).  Pinned over both the
        non-split (b8) and sub-8x8-split (b8s) fixtures."""
        keys = ("b8x8", "b8_dir", "b8_l0", "b8_l1", "b8_bi",
                "b8_split", "b8_parts")
        captured: dict = {}
        real = hc.h264_encode_gop_b

        def spy(*a, **k):
            nals, stats = real(*a, **k)
            captured["stats"] = stats
            return nals, stats

        monkeypatch.setattr(hc, "h264_encode_gop_b", spy)
        for writer, doc in ((mm._write_h264b8, 3),
                            (mm._write_h264b8s, 2)):
            payload, _rec = writer(doc)
            _frames, dstats = hc.h264_decode_gop(
                hc.split_annexb(payload)
            )
            enc = {k: sum(s.get(k, 0) for s in captured["stats"])
                   for k in keys}
            dec = {k: sum(s.get(k, 0) for s in dstats)
                   for k in keys}
            assert enc == dec, (writer.__name__, enc, dec)
            assert enc["b8_l0"] > 0, writer.__name__

    def test_unsupported_sub_types_rejected(self):
        """A sub_mb_type beyond Table 7-18 (> 12) fails loudly in
        the decoder (patch the encoder to emit type 13 where a
        supported type belongs)."""
        import pytest

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        import data_transformation_python_spark.operators.h264_codec as hcm

        real_ue = hcm._EgWriter.ue
        state = {"armed": False, "n": 0}

        def patched(self, v):
            if v == 22:
                state["armed"] = True
                state["n"] = 0
                return real_ue(self, v)
            if state["armed"]:
                state["n"] += 1
                if state["n"] == 1:
                    state["armed"] = False
                    return real_ue(self, 13)  # past Table 7-18
            return real_ue(self, v)

        try:
            hcm._EgWriter.ue = patched
            payload_bad, _ = mm._write_h264b8(0)
        finally:
            hcm._EgWriter.ue = real_ue
        with pytest.raises(ValueError, match="beyond Table 7-18"):
            hc.h264_decode_gop(hc.split_annexb(payload_bad))

    def test_sub_8x8_splits_roundtrip_and_census(self):
        """The sub-8x8 rows (B_L0_8x4 / B_L1_4x8 / B_Bi_4x4 /
        B_L0_4x4): twelve motion partitions per macroblock, all four
        pattern rotations lossless with the 8-split/24-partition
        census."""
        import hashlib

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        for doc in (0, 1, 2, 3):
            payload, rec = mm._write_h264b8s(doc)
            frames, stats = hc.h264_decode_gop(hc.split_annexb(payload))
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec, doc
            w, h, _x, _y = mm._h264b_dims(doc)
            mbs = (w // 16) * (h // 16)
            bst = [s for s in stats if s["is_b"]]
            assert sum(s["b8x8"] for s in bst) == 2 * mbs
            assert sum(s["b8_split"] for s in bst) == 8 * mbs
            assert sum(s["b8_parts"] for s in bst) == 24 * mbs
            assert sum(s["b8_l0"] for s in bst) == 4 * mbs
            assert sum(s["b8_l1"] for s in bst) == 2 * mbs
            assert sum(s["b8_bi"] for s in bst) == 2 * mbs

    def test_direct_8x8_spatial_zero_prediction_in_isolated_mb(self):
        """B_Direct_8x8 under SPATIAL direct in a one-MB picture: no
        neighbours → directZeroPrediction → the direct sub-block is
        the zero-motion bi mean; the other three quadrants stay
        coded.  Lossless roundtrip + census."""
        import numpy as np

        w = h = 16
        mv, neg, two = (8, 8), (-8, -8), (16, 16)
        ys, xs = np.mgrid[0:h, 0:w]
        y = (40 + (xs * 19 + ys * 23) % 176).astype(np.uint8)
        cys, cxs = np.mgrid[0 : h // 2, 0 : w // 2]
        cbp = (60 + (cxs * 13 + cys * 29) % 136).astype(np.uint8)
        crp = (60 + (cxs * 31 + cys * 11) % 136).astype(np.uint8)
        f0 = (y, cbp, crp)
        modes = (0, 1, 2, 3)
        mvs = (None, mv, neg, (mv, neg))

        def bimean(a, b):
            return tuple(
                ((p.astype(np.int64) + q.astype(np.int64) + 1) >> 1)
                .astype(np.uint8)
                for p, q in zip(a, b)
            )

        frames, prev = [f0], f0
        for _ in range(2):
            pfr = hc.mc_shift_planes(*prev, two)
            srcs = [
                bimean(prev, pfr),                    # directZero
                hc.mc_shift_planes(*prev, mv),
                hc.mc_shift_planes(*pfr, neg),
                bimean(hc.mc_shift_planes(*prev, mv),
                       hc.mc_shift_planes(*pfr, neg)),
            ]
            out = [p.copy() for p in srcs[1]]
            for part, s in enumerate(srcs):
                (lx, ly, lw, lh), (cx, cy, cw, ch) = (
                    hc._PART_GEOM8[part]
                )
                out[0][ly : ly + lh, lx : lx + lw] = (
                    s[0][ly : ly + lh, lx : lx + lw]
                )
                for pi in (1, 2):
                    out[pi][cy : cy + ch, cx : cx + cw] = (
                        s[pi][cy : cy + ch, cx : cx + cw]
                    )
            frames.extend(
                [tuple(p.astype(np.uint8) for p in out), pfr]
            )
            prev = pfr
        nals, _ = hc.h264_encode_gop_b(
            frames, w, h,
            l0_candidates=[mv], l1_candidates=[neg],
            bi_candidates=[(mv, neg)], p_candidates=[two],
            sub_candidates=[(modes, mvs)],
        )
        dec, stats = hc.h264_decode_gop(nals)
        for fr, f in zip(dec, frames):
            assert np.array_equal(fr, hc._yuv420_to_rgb(*f))
        bst = [s for s in stats if s["is_b"]]
        assert sum(s["b8x8"] for s in bst) == 2
        assert sum(s["b8_dir"] for s in bst) == 2
        assert sum(s["b8_l0"] for s in bst) == 2
        assert sum(s["b8_l1"] for s in bst) == 2
        assert sum(s["b8_bi"] for s in bst) == 2

    def test_mixed_direct_fixture_census(self):
        """The b8d fixture: temporal-direct quadrant (parse-free,
        DSF 128 → bi mean) next to three coded quadrants; all four
        rotations roundtrip losslessly with the 1/1/1/1 census."""
        import hashlib

        from data_transformation_python_spark.operators import (
            multimodal as mm,
        )

        for doc in (0, 1, 2, 3):
            payload, rec = mm._write_h264b8d(doc)
            frames, stats = hc.h264_decode_gop(hc.split_annexb(payload))
            md5 = hashlib.md5()
            for fr in frames:
                md5.update(fr.tobytes())
            assert md5.hexdigest() == rec, doc
            w, h, _x, _y = mm._h264b_dims(doc)
            mbs = (w // 16) * (h // 16)
            bst = [s for s in stats if s["is_b"]]
            assert sum(s["b8x8"] for s in bst) == 2 * mbs
            for k in ("b8_dir", "b8_l0", "b8_l1", "b8_bi"):
                assert sum(s[k] for s in bst) == 2 * mbs, (doc, k)


class TestBatchedBlockKernels:
    """The round-15 per-MB batched forms must equal the scalar
    per-block forms element for element (the scalar forms stay as the
    executable spec)."""

    def test_inv_transform_batch_matches_scalar(self):
        rng = np.random.default_rng(7)
        d = rng.integers(-(1 << 20), 1 << 20, size=(64, 4, 4))
        got = hc._inv_transform4x4_batch(d)
        for i in range(d.shape[0]):
            assert np.array_equal(got[i], hc._inv_transform4x4(d[i])), i

    def test_ac_dequant_batch_matches_scalar(self):
        rng = np.random.default_rng(8)
        c = rng.integers(-512, 512, size=(32, 4, 4))
        for qp in (0, 5, 17, 28, 40, 51):
            got = hc._ac_dequant_batch(c, qp)
            for i in range(c.shape[0]):
                assert np.array_equal(got[i], hc._ac_dequant(c[i], qp)), (
                    qp, i,
                )

    def test_dense8_batch_matches_scalar(self):
        rng = np.random.default_rng(9)
        # adversarial rows: all-zero, exactly 8, tie-heavy, dense
        rows = [
            [0] * 15,
            [1] * 8 + [0] * 7,
            [2, -2, 2, -2, 2, -2, 2, -2, 2, -2, 2, 0, 0, 0, 0],
            list(rng.integers(-3, 4, size=15)),
            list(rng.integers(-100, 100, size=15)),
            [5] * 15,
            [0, 0, 1, 0, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ]
        rows += [list(rng.integers(-4, 5, size=15)) for _ in range(40)]
        a = np.array(rows, np.int64)
        got = hc._dense8_batch(a)
        for i, row in enumerate(rows):
            assert got[i].tolist() == hc._dense8([int(v) for v in row]), (
                i, row,
            )

    def test_mb_block_gather_scatter_roundtrip(self):
        rng = np.random.default_rng(10)
        pix = rng.integers(0, 256, size=(16, 16))
        blocks = hc._mb_blocks(pix)
        for bi, (bx, by) in enumerate(hc._BLK_SCAN):
            assert np.array_equal(
                blocks[bi], pix[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
            ), bi
        assert np.array_equal(hc._mb_from_blocks(blocks), pix)

    def test_vlc_int_reader_matches_tables(self):
        """_read_vlc over every (table, code) pair decodes to the
        table's entry and consumes exactly the code's length."""
        for table in (
            hc._CT_NC02_DEC, hc._CT_NCM1_DEC, hc._CT_NC8_DEC,
            *hc._TZ_DEC.values(), *hc._TZ_CDC_DEC.values(),
            *hc._RB_DEC.values(),
        ):
            for code, want in table.items():
                bw = hc._EgWriter()
                hc._put_bits(bw, code + "1010101")  # trailing noise
                bw.align_zero()
                br = hc._EgReader(bw.tobytes())
                assert hc._read_vlc(br, table) == want, code
                assert br.i == len(code), code
