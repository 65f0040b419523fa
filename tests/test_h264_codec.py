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
