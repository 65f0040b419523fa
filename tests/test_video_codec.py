"""IPV1 inter-frame-predicted video codec tests: round-trip fidelity,
bit-determinism, closed-loop (no drift), GOP census, stream errors."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_transformation_python_spark.operators import multimodal as mm
from data_transformation_python_spark.operators.video_codec import (
    ipv_decode,
    ipv_encode,
)


def _frames(doc_id: int, w: int, h: int, nf: int):
    return [
        np.stack(mm._ipv_frame_channels(doc_id, f, w, h), axis=-1)
        for f in range(nf)
    ]


def test_roundtrip_fidelity_and_gop_census():
    fr = _frames(7, 20, 15, 9)
    enc = ipv_encode(fr, fps=25, quality=95, gop=4)
    w, h, fps, dec, ftypes = ipv_decode(enc)
    assert (w, h, fps) == (20, 15, 25)
    assert ftypes == ["I", "P", "P", "P", "I", "P", "P", "P", "I"]
    for a, b in zip(fr, dec):
        mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
        assert 10 * np.log10(255**2 / mse) >= 30.0


def test_encode_is_bit_deterministic():
    fr = _frames(3, 17, 13, 5)
    assert ipv_encode(fr, fps=20, quality=95, gop=4) == ipv_encode(
        fr, fps=20, quality=95, gop=4
    )


def test_closed_loop_no_drift_over_long_gop():
    """With gop > n_frames every frame after the first is a
    P-picture; fidelity of the LAST frame must not degrade vs the
    first P — the closed prediction loop cannot drift."""
    fr = _frames(11, 24, 16, 12)
    enc = ipv_encode(fr, fps=25, quality=95, gop=100)
    _, _, _, dec, ftypes = ipv_decode(enc)
    assert ftypes == ["I"] + ["P"] * 11
    psnrs = []
    for a, b in zip(fr, dec):
        mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
        psnrs.append(10 * np.log10(255**2 / mse))
    assert psnrs[-1] >= 30.0
    assert psnrs[-1] >= psnrs[1] - 3.0  # no systematic drift collapse


def test_pframes_code_fewer_bits_than_iframes():
    fr = _frames(5, 32, 24, 8)
    enc = ipv_encode(fr, fps=25, quality=95, gop=8)
    sizes = {"I": [], "P": []}
    pos = 4 + struct.calcsize("<4H2B")
    while pos + 5 <= len(enc):
        ft, ln = struct.unpack_from("<BI", enc, pos)
        sizes["I" if ft == 0 else "P"].append(ln)
        pos += 5 + ln
    assert np.mean(sizes["P"]) < np.mean(sizes["I"])


def test_stream_error_paths():
    fr = _frames(1, 16, 12, 3)
    enc = ipv_encode(fr, fps=25, quality=95, gop=4)
    with pytest.raises(ValueError, match="magic"):
        ipv_decode(b"XXXX" + enc[4:])
    with pytest.raises(ValueError, match="truncated"):
        ipv_decode(enc[: len(enc) - 5])
    with pytest.raises(ValueError):
        ipv_encode([], fps=25)
    # P-picture before any I-picture: force ftype=1 on frame 0
    hdr = 4 + struct.calcsize("<4H2B")
    bad = bytearray(enc)
    bad[hdr] = 1
    with pytest.raises(ValueError, match="P-picture before"):
        ipv_decode(bytes(bad))


def test_decoder_reads_ragged_dims_and_quality_sweep():
    for q in (70, 85, 95):
        fr = _frames(9, 11, 9, 4)  # non-multiple-of-8 dims
        enc = ipv_encode(fr, fps=10, quality=q, gop=2)
        w, h, _, dec, _ = ipv_decode(enc)
        assert (w, h) == (11, 9)
        assert all(d.shape == (9, 11, 3) for d in dec)
