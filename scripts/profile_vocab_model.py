"""Isolate silver_vocab: materialize its prerequisites once, then
time the vocab model's SQL analysis vs execution vs CTAS, repeated.

Usage: python scripts/profile_vocab_model.py [unigram|bpe]
"""
import os
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, "/root/repo")

from data_transformation_python_spark.config import load_config  # noqa: E402
from data_transformation_python_spark.dependency import (  # noqa: E402
    ParallelExecutor,
    build_dependency_graph,
)
from data_transformation_python_spark.executor import (  # noqa: E402
    ModelExecutor,
    SparkExecutor,
)
from data_transformation_python_spark.parser import SQLParser  # noqa: E402
from data_transformation_python_spark.session import get_spark  # noqa: E402


def main():
    fam = sys.argv[1] if len(sys.argv) > 1 else "bpe"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dtps-vocab-prof")
    spark.range(1000).selectExpr("sum(id)").collect()
    import bench

    cal = bench.jvm_calibration(spark, shots=3, n=20_000_000_000,
                                name="range_2e10_sum")
    print(f"cal2 median: {cal['median']:.3f}")

    src = Path("/root/repo/example_pipeline")
    tmp = tempfile.mkdtemp(prefix="dtps_vocab_prof_")
    proj = Path(tmp) / "example_pipeline"
    shutil.copytree(src, proj)
    db = f"vocab_prof_{uuid.uuid4().hex[:8]}"
    os.environ["TESTDATA_DIR"] = sf_dir
    try:
        config = load_config(proj)
        config.database = db
        if fam == "bpe":
            config.variables.update({"tokenizer": "bpe"})
        parser = SQLParser(config.models_dir)
        mx = ModelExecutor(SparkExecutor(spark, database=db), parser, config)
        levels = build_dependency_graph(
            parser.parse_directory()
        ).topological_sort()
        # run everything up to (excluding) silver_vocab
        pre = []
        for lv in levels:
            if "silver_vocab" in lv:
                break
            pre.extend(lv)
        for name in pre:
            r = mx.execute_model(name)
            assert r.get("success"), r
        print("prereqs done:", pre)

        parsed, final_sql, target = mx.compile_model("silver_vocab")
        print("sql bytes:", len(final_sql))
        for i in range(4):
            t0 = time.perf_counter()
            df = spark.sql(final_sql)
            t_an = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_ex = time.perf_counter() - t0
            t0 = time.perf_counter()
            spark.sql(f"DROP TABLE IF EXISTS {db}.__vp_tmp")
            df.write.mode("overwrite").format("parquet").saveAsTable(
                f"{db}.__vp_tmp"
            )
            t_ctas = time.perf_counter() - t0
            print(
                f"  run {i}: analyze {t_an:.3f}  exec(noop) {t_ex:.3f}"
                f"  ctas {t_ctas:.3f}"
            )
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
