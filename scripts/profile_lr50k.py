"""Phase profiler for lr_train at corpus scale (@50k): feature build
+ m_rows vs the 12 mapInArrow gradient iterations.

Usage: python scripts/profile_lr50k.py [n_docs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from data_transformation_python_spark.operators import training as tr  # noqa: E402
from data_transformation_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="dtps-profile-lr50k")
    spark.range(1000).selectExpr("sum(id)").collect()
    cal = bench.jvm_calibration(spark, shots=3, n=20_000_000_000,
                                name="range_2e10_sum")
    print(f"cal2 median: {cal['median']:.3f}")
    corpus_dir = bench.build_scaled_corpus(spark, n)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    docs.count()

    # instrument the iteration loop by wrapping _grad-time attributes
    orig_lr_train = tr.lr_train

    for rep in range(2):
        t0 = time.perf_counter()
        it_times = []
        # monkeypatch mapInArrow collect timing via tracing the loop:
        # simplest: time the whole call and separately time a variant
        # with iters=0 is impossible (min 1); use iters=1 vs 12.
        w1 = orig_lr_train(docs, iters=1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        w12 = orig_lr_train(docs, iters=12)
        t12 = time.perf_counter() - t0
        per_iter = (t12 - t1) / 11
        print(
            f"rep {rep}: iters=1 {t1:.2f}s  iters=12 {t12:.2f}s"
            f"  -> per-iteration {per_iter:.3f}s,"
            f" build+m_rows+1it {t1:.2f}s"
        )


if __name__ == "__main__":
    main()
