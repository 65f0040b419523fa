"""Per-phase profiler for the unigram-LM trainer at corpus scale
(optimization round 15, guide §1: measure first).

Times each phase of _ulm_fit / unigram_tokenize separately at the
bench's 50k-doc corpus: word-histogram build, seed occurrence pass,
E-step 1, E-step 2, serve E-step (frame), doc join.  Pure
instrumentation — no behavior change anywhere.

Usage: python scripts/profile_ulm.py [n_docs]
"""
import os
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
    spark = get_spark(app_name="dtps-profile-ulm")
    spark.range(1000).selectExpr("sum(id)").collect()
    corpus_dir = bench.build_scaled_corpus(spark, n_docs)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    docs.count()

    max_word, max_piece, seed_multi, keep_multi = 12, 4, 48, 24
    scale = 1 << 13

    t0 = time.perf_counter()
    target = spark.sparkContext.defaultParallelism
    d = docs if docs.rdd.getNumPartitions() >= target else docs.repartition(target)
    words = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= max_word))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("n", F.length("word").cast("int"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nw = words.count()
    t1 = time.perf_counter()
    print(f"hist+persist: {t1 - t0:.2f}s  ({nw} distinct words)")

    occ = (
        words.select(
            "cnt",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, n), j -> "
                    f"transform(sequence(1, least({max_piece}, n - j + 1)),"
                    " L -> substr(word, j, L))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    seed_rows = (
        occ.withColumn(
            "rk",
            F.expr(
                "CASE WHEN length(piece) > 1 THEN ROW_NUMBER() OVER"
                " (PARTITION BY (length(piece) = 1)"
                "  ORDER BY c DESC, piece) ELSE 0 END"
            ),
        )
        .filter(f"length(piece) = 1 OR rk <= {seed_multi}")
        .collect()
    )
    t2 = time.perf_counter()
    print(f"seed occ pass: {t2 - t1:.2f}s  ({len(seed_rows)} seed pieces)")

    counts = {r["piece"]: int(r["c"]) for r in seed_rows}
    c1 = tx._ulm_estep(words, tx._ulm_scores(counts), scale, max_piece)
    t3 = time.perf_counter()
    print(f"E-step 1 (counts): {t3 - t2:.2f}s  ({len(c1)} pieces)")

    c1 = {p: c1.get(p, 0) for p in counts}
    kept = sorted((p for p in c1 if len(p) > 1), key=lambda p: (-c1[p], p))[:keep_multi]
    v1 = {p: c1[p] for p in c1 if len(p) == 1 or p in set(kept)}
    c2 = tx._ulm_estep(words, tx._ulm_scores(v1), scale, max_piece)
    t4 = time.perf_counter()
    print(f"E-step 2 (counts): {t4 - t3:.2f}s")

    c2 = {p: c2.get(p, 0) for p in v1}
    neg2 = tx._ulm_scores(c2)
    seg = tx._ulm_estep(words, neg2, scale, max_piece, return_frame=True)
    t5 = time.perf_counter()
    print(f"E-step 3 (frame+checkpoint): {t5 - t4:.2f}s")

    doc_words = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= max_word))
    )
    out = (
        doc_words.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.expr("CAST(sum(size(pieces)) AS BIGINT)").alias("n_pieces"),
            F.expr(
                "CAST(size(array_distinct(flatten(collect_list(pieces))))"
                " AS BIGINT)"
            ).alias("n_distinct_pieces"),
        )
    )
    out.write.format("noop").mode("overwrite").save()
    t6 = time.perf_counter()
    print(f"doc join+agg: {t6 - t5:.2f}s")
    print(f"TOTAL: {t6 - t0:.2f}s")
    words.unpersist()


if __name__ == "__main__":
    main()
