"""Solo-confirm harness for the r10 ``samp_dsir@50k`` slowdown.

Round-10 bench read samp_dsir@50k at 7.6/7.3 s vs 3.18 s in r9 (2.4x),
the one per-entry delta both r10 mirrors agreed on while everything
else swung.  Per bench discipline (confirm regressions solo, no
concurrent Spark), this runs on an otherwise-idle host:

  - both host-factor probes (arithmetic + task-scheduling regimes),
  - samp_dsir@50k   x5 repeats (the suspect),
  - samp_dsir       x5 repeats (fixture scale; got FASTER in r10),
  - dedup_minhash_lsh@50k and sketch_hdr_quantiles@50k x5 as
    shuffle-heavy / scan-light controls with stable r9-r10 history.

Prints one JSON line; the verdict (reproduced vs host noise) goes to
SCALING.md.  Run:  python scripts/solo_confirm_dsir.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    _median,
    _drop_checkpoints,
    build_scaled_corpus,
    jvm_calibration,
    load,
    sched_calibration,
)
from data_transformation_python_spark.session import get_spark  # noqa: E402


def time_entry(spark, make_df, repeats=5):
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 4))
        _drop_checkpoints(spark)
    return round(_median(samples), 4), samples


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dtps-solo-dsir")
    spark.range(1000).selectExpr("sum(id)").collect()

    from data_transformation_python_spark.operators import dedup as dd
    from data_transformation_python_spark.operators import sampling as sp
    from data_transformation_python_spark.operators import sketch as sk

    cal2 = jvm_calibration(spark, shots=7, n=20_000_000_000,
                           name="range_2e10_sum")
    cal3 = sched_calibration(spark)

    corpus = build_scaled_corpus(spark, 50_000)
    docs50 = spark.read.parquet(f"{corpus}/documents.parquet")
    docs50.count()  # warm footers
    docs = load(spark, sf_dir, "documents")
    docs.count()

    out = {"calibration2": cal2, "calibration3": cal3, "medians": {},
           "samples": {}}

    entries = [
        ("samp_dsir@50k", lambda: sp.dsir_importance_sample(
            docs50.filter("doc_id % 50 != 0"),
            docs50.filter("doc_id % 50 = 0"), k=100)),
        ("samp_dsir", lambda: sp.dsir_importance_sample(
            docs.filter("doc_id % 50 != 0"),
            docs.filter("doc_id % 50 = 0"), k=20)),
        ("dedup_minhash_lsh@50k", lambda: dd.minhash_lsh_candidates(
            docs50)),
        ("sketch_hdr_quantiles@50k", lambda: sk.hdr_quantiles(
            sk.hdr_build(docs50.selectExpr(
                "CAST(length(text) AS BIGINT) AS v"), "v"),
            (50, 90, 99))),
    ]
    for name, thunk in entries:
        try:
            out["medians"][name], out["samples"][name] = time_entry(
                spark, thunk)
        except Exception as e:
            out["medians"][name] = f"ERR: {str(e)[:200]}"
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SOLO_DSIR_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
