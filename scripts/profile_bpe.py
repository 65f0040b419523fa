"""Per-phase profiler for the BPE trainer at corpus scale
(optimization round 15, guide §1: measure first).

Times the word-histogram build, then each of the k merge steps
(pair-count job + argmax collect), then the final segmentation
materialization and the doc-side join of bpe_tokenize_stats.

Usage: python scripts/profile_bpe.py [n_docs] [k]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from data_transformation_python_spark.operators import text as tx  # noqa: E402
from data_transformation_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="dtps-profile-bpe")
    spark.range(1000).selectExpr("sum(id)").collect()
    corpus_dir = bench.build_scaled_corpus(spark, n_docs)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    docs.count()

    t0 = time.perf_counter()
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cur = words.select(
        "word",
        "cnt",
        F.concat(
            F.lit(" "),
            F.array_join(F.expr(tx.bpe_charsplit_expr("word", "spark")), " "),
            F.lit(" "),
        ).alias("symstr"),
    )
    view = "__bpe_prof"
    merges = []
    prev = None
    for step in range(k):
        ts = time.perf_counter()
        cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
        cur.selectExpr(
            "word", "cnt", f"{tx._BPE_SYMS_FROM_STR} AS syms"
        ).createOrReplaceTempView(view)
        best = spark.sql(
            tx.bpe_pair_count_sql(f"SELECT * FROM {view}", "spark")
        ).collect()
        if prev is not None:
            prev.unpersist()
        x, y, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((step, x, y, x + y, c))
        pattern, replacement = tx._bpe_merge_regex(x, y)
        prev = cur
        cur = cur.select(
            "word", "cnt",
            F.regexp_replace("symstr", pattern, replacement).alias("symstr"),
        )
        print(f"step {step}: {time.perf_counter() - ts:.2f}s  merge=({x},{y},{c})")
    ts = time.perf_counter()
    cur = cur.selectExpr(
        "word", "cnt", f"{tx._BPE_SYMS_FROM_STR} AS syms"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    if prev is not None:
        prev.unpersist()
    print(f"final seg materialize: {time.perf_counter() - ts:.2f}s")
    ts = time.perf_counter()
    word_pieces = cur.select("word", F.size("syms").cast("bigint").alias("__np"))
    docwords = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    out = (
        docwords.join(word_pieces, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__np").cast("bigint").alias("n_pieces"),
        )
    )
    out.write.format("noop").mode("overwrite").save()
    print(f"doc join+agg: {time.perf_counter() - ts:.2f}s")
    print(f"TOTAL: {time.perf_counter() - t0:.2f}s")
    spark.catalog.dropTempView(view)


if __name__ == "__main__":
    main()
