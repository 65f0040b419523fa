"""Solo-entry bench: time specific entries in isolation with the
bench.py methodology (same session factory, warmup, noop sink,
cold-shot-excluded median) without the 40-minute full sweep.

Usage: python scripts/solo_bench.py ENTRY [ENTRY...] [--repeats N]
ENTRY is a registered query name, or corpus entry name like
dedup_minhash_lsh@50k.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from data_transformation_python_spark.queries import all_queries, load  # noqa: E402
from data_transformation_python_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dtps-solo-bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in bench.TABLES:
        try:
            load(spark, sf_dir, t).count()
        except Exception:
            pass
    cal = bench.jvm_calibration(spark, shots=3, n=20_000_000_000,
                                name="range_2e10_sum")
    print(f"cal2 median: {cal['median']}")

    qreg = all_queries()
    corpus_dir = None
    corpus_entries = {}

    def resolve(name):
        nonlocal corpus_dir, corpus_entries
        if "@" in name:
            base, tag = name.rsplit("@", 1)
            n_docs = int(tag.rstrip("k")) * 1000
            if corpus_dir is None:
                corpus_dir = bench.build_scaled_corpus(spark, n_docs)
                corpus_entries = dict(
                    bench.corpus_scale_entries(spark, corpus_dir)
                )
            return lambda: corpus_entries[base]()
        fn = qreg[name]
        return lambda: fn(spark, sf_dir)

    for name in names:
        thunk = resolve(name)

        def run():
            df = thunk()
            df.write.format("noop").mode("overwrite").save()

        t, samples = bench._time_entry(run, spark, repeats)
        print(f"{name}: {t}  samples={samples}")


if __name__ == "__main__":
    main()
