"""Profile the dense-8 I-frame codec entries' per-doc work.

Mimics exactly what multimodal_h264ac8_meta / _h264cac8_meta pay per
doc: the synth encode (_write_h264ac8 / _write_h264cac8) plus the
metadata decode + the two frame-0 comparison encodes.

Usage: python scripts/profile_i16.py [n_docs] [ac8|cac8]
"""
import cProfile
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from data_transformation_python_spark.operators import multimodal as M  # noqa: E402
from data_transformation_python_spark.operators.h264_codec import (  # noqa: E402
    annexb,
    h264_decode_frame,
    h264_encode_frame,
    h264_encode_frame_i16ac,
    split_annexb,
)


def one_doc(doc_id: int, kind: str) -> None:
    w, h, nf, qp = M._h264dc_dims(doc_id)
    if kind == "ac8":
        payload, rec_md5 = M._write_h264ac8(doc_id)
    else:
        payload, rec_md5 = M._write_h264cac8(doc_id)
    nals = split_annexb(payload)
    dec0 = None
    for f in range(nf):
        dec = h264_decode_frame(nals[3 * f : 3 * f + 3])
        if f == 0:
            dec0 = dec
    if kind == "ac8":
        src0 = np.stack([M._h264dc_probe_gray(doc_id, 0, w, h)] * 3, axis=-1)
        len(annexb(h264_encode_frame(dec0, idr_pic_id=0)))
        len(annexb(h264_encode_frame_i16ac(src0, qp=qp, idr_pic_id=0)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    kind = sys.argv[2] if len(sys.argv) > 2 else "ac8"
    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    for d in range(n):
        one_doc(d, kind)
    pr.disable()
    print(f"wall {time.time() - t0:.2f}s for {n} docs ({kind})")
    st = pstats.Stats(pr)
    st.sort_stats("tottime").print_stats(28)


if __name__ == "__main__":
    main()
