"""A/B the per-iteration Arrow transfer cost of lr_train's feature
frame under different physical encodings (same logical content):

  A. counts array<struct<b:bigint, c:bigint>>   (current)
  B. counts array<struct<b:int,    c:int>>      (narrowed)
  C. bs array<int> + cs array<int>              (primitive lists)

Each timed as 12 mapInArrow passes with the real numpy extraction +
gradient arithmetic on zero weights.

Usage: python scripts/profile_lr_encoding.py [n_docs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

import bench  # noqa: E402
from data_transformation_python_spark.operators.training import (  # noqa: E402
    _bucket_expr,
    _teacher_expr,
)
from data_transformation_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="dtps-lr-encoding")
    spark.range(1000).selectExpr("sum(id)").collect()
    cal = bench.jvm_calibration(spark, shots=3, n=20_000_000_000,
                                name="range_2e10_sum")
    print(f"cal2 median: {cal['median']:.3f}")
    corpus_dir = bench.build_scaled_corpus(spark, n)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    docs.count()

    b_expr = _bucket_expr("t", 1024)
    tw_expr = _teacher_expr("t")
    tok = docs.select(
        F.col("doc_id"),
        F.expr(
            f"transform(split(text, ' '),"
            f" t -> named_struct('b', {b_expr}, 'tw', {tw_expr}))"
        ).alias("bt"),
    )
    lab = tok.select(
        "doc_id",
        F.expr(
            "CASE WHEN aggregate(bt, CAST(0 AS BIGINT),"
            " (a, x) -> a + x.tw) > 0"
            " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("y"),
        F.explode(F.col("bt.b")).alias("b"),
    )
    base = (
        lab.groupBy("doc_id", "y", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy("doc_id", "y")
        .agg(F.collect_list(F.struct("b", "c")).alias("counts"))
        .select(
            "doc_id", "y",
            F.expr(
                "array_append(counts, named_struct('b',"
                " CAST(-1 AS BIGINT), 'c', CAST(1 AS BIGINT)))"
            ).alias("counts"),
        )
    )

    variants = {
        "A_struct_i64": base.select("y", "counts"),
        "B_struct_i32": base.select(
            "y",
            F.expr(
                "transform(counts, x -> named_struct('b',"
                " CAST(x.b AS INT), 'c', CAST(x.c AS INT)))"
            ).alias("counts"),
        ),
        "C_prim_lists": base.select(
            "y",
            F.expr("transform(counts, x -> CAST(x.b AS INT))").alias("bs"),
            F.expr("transform(counts, x -> CAST(x.c AS INT))").alias("cs"),
        ),
    }

    w_np = np.zeros(1025, dtype=np.int64)

    def fn_struct(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        acc = np.zeros(1025, dtype=np.int64)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            y = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            la = batch.column(1)
            lens = pc.list_value_length(la).to_numpy(
                zero_copy_only=False).astype(np.int64)
            flat = la.flatten()
            b = flat.field("b").to_numpy(zero_copy_only=False)
            c = flat.field("c").to_numpy(zero_copy_only=False)
            idx = (b + 1).astype(np.intp)
            starts = np.zeros(len(lens), dtype=np.intp)
            np.cumsum(lens[:-1], out=starts[1:])
            z = np.add.reduceat(c * w_np[idx], starts)
            rr = (np.clip(z + 131072, 0, 262144) - 262144 * y)
            np.add.at(acc, idx, np.repeat(rr, lens) * c)
        yield __import__("pyarrow").record_batch(
            [__import__("pyarrow").array(acc)], names=["g"]
        )

    def fn_prim(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        acc = np.zeros(1025, dtype=np.int64)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            y = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            bl = batch.column(1)
            cl = batch.column(2)
            lens = pc.list_value_length(bl).to_numpy(
                zero_copy_only=False).astype(np.int64)
            b = bl.flatten().to_numpy(zero_copy_only=False)
            c = cl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            idx = (b + 1).astype(np.intp)
            starts = np.zeros(len(lens), dtype=np.intp)
            np.cumsum(lens[:-1], out=starts[1:])
            z = np.add.reduceat(c * w_np[idx], starts)
            rr = (np.clip(z + 131072, 0, 262144) - 262144 * y)
            np.add.at(acc, idx, np.repeat(rr, lens) * c)
        yield pa.record_batch([pa.array(acc)], names=["g"])

    for name, df in variants.items():
        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.count()
        fn = fn_prim if name.startswith("C") else fn_struct
        ts = []
        for _ in range(12):
            t0 = time.perf_counter()
            cached.mapInArrow(fn, "g bigint").groupBy().agg(
                F.sum("g")).collect()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name}: median {ts[6]:.3f}s  min {ts[0]:.3f}s")
        cached.unpersist()


if __name__ == "__main__":
    main()
