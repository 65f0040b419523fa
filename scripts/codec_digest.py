"""Bit-exactness digest harness for the codec stack.

Hashes every multimodal `_write_*` payload for doc_ids 0..N-1, and for
every h264 payload additionally hashes the FULL decoded frame stack
(pixels + per-frame stats repr) via h264_decode_gop.  Prints one md5
per builder plus a TOTAL digest.  Run before/after a codec change —
identical TOTAL == bit-exact encode AND decode.

Usage: python scripts/codec_digest.py [n_docs]
"""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from data_transformation_python_spark.operators import multimodal as M  # noqa: E402
from data_transformation_python_spark.operators.h264_codec import (  # noqa: E402
    h264_decode_gop,
    mp4_read,
    split_annexb,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    builders = sorted(
        name for name in dir(M) if name.startswith("_write_")
    )
    total = hashlib.md5()
    t0 = time.time()
    for name in builders:
        fn = getattr(M, name)
        h = hashlib.md5()
        for doc_id in range(n_docs):
            out = fn(doc_id)
            payload = out[0] if isinstance(out, tuple) else out
            rest = repr(out[1:]) if isinstance(out, tuple) else ""
            h.update(payload)
            h.update(rest.encode())
            if name.startswith("_write_h264") and not name.endswith("_probe"):
                nals = split_annexb(payload)
                frames, stats = h264_decode_gop(nals)
                for fr in frames:
                    h.update(np.ascontiguousarray(fr).tobytes())
                h.update(repr(stats).encode())
            elif name == "_write_mp4":
                h.update(repr(mp4_read(payload)).encode())
        print(f"{name}: {h.hexdigest()}")
        total.update(h.hexdigest().encode())
    print(f"TOTAL: {total.hexdigest()}  ({time.time() - t0:.1f}s, n={n_docs})")


if __name__ == "__main__":
    main()
