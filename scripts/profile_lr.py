"""Phase profiler for lr_train at FIXTURE scale (text_lr_train reads
10.9 s at sf0.1 for ~500 docs — that cost is per-iteration overhead,
not data).  Times the feature build, the m_rows job, and each GD
iteration's gradient job separately.

Usage: python scripts/profile_lr.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from data_transformation_python_spark.operators.training import (  # noqa: E402
    _bucket_expr,
    _sdiv,
    _teacher_expr,
)
from data_transformation_python_spark.operators.transform import (  # noqa: E402
    lit_long_array,
)
from data_transformation_python_spark.queries import load  # noqa: E402
from data_transformation_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="dtps-profile-lr")
    spark.range(1000).selectExpr("sum(id)").collect()
    df = load(spark, sf_dir, "documents")
    df.count()

    n_buckets, scale_log2, step_mult, iters = 1024, 16, 16, 12
    S = 1 << scale_log2
    S2, S4 = 2 * S, 4 * S
    E = step_mult * S
    b_expr = _bucket_expr("t", n_buckets)
    tw_expr = _teacher_expr("t")

    t0 = time.perf_counter()
    tok = df.select(
        F.col("doc_id").alias("doc_id"),
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
    feats = (
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
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m_rows = (
        feats.select(
            "y",
            F.expr(
                "aggregate(counts, CAST(0 AS BIGINT), (a, x) -> a + x.c)"
            ).alias("dl"),
            F.explode("counts").alias("x"),
        )
        .groupBy(F.col("x.b").alias("b"))
        .agg(
            F.sum("x.c").cast("bigint").alias("m"),
            F.sum(
                F.when(F.col("x.b") == -1, F.col("y")).otherwise(F.lit(0))
            ).cast("bigint").alias("p"),
            F.max("dl").cast("bigint").alias("dlmax"),
        )
        .collect()
    )
    t1 = time.perf_counter()
    print(f"feature build + m_rows: {t1 - t0:.2f}s ({len(m_rows)} buckets)")

    m = {r["b"]: r["m"] for r in m_rows}
    N = m[-1]
    P = next(r["p"] for r in m_rows if r["b"] == -1)
    kkp = max(1, (N - P) // max(P, 1))
    kkn = max(1, P // max(N - P, 1))
    z = (
        "aggregate(counts, CAST(0 AS BIGINT), (acc, x) ->"
        " acc + x.c * element_at(__w, CAST(x.b + 2 AS INT)))"
    )
    r = (
        f"(least(greatest({z} + {S2}, CAST(0 AS BIGINT)),"
        f" CAST({S4} AS BIGINT)) - {S4} * y)"
        f" * ({kkn} + {kkp - kkn} * y)"
    )
    W = {b: 0 for b in m}
    for k in range(1, iters + 1):
        ts = time.perf_counter()
        arr = [W[-1]] + [W.get(b, 0) for b in range(n_buckets)]
        grad = (
            feats.withColumn("__w", lit_long_array(arr))
            .select(F.expr(r).alias("r"), F.explode("counts").alias("x"))
            .groupBy(F.col("x.b").alias("b"))
            .agg(F.expr("try_sum(r * x.c)").alias("g"))
            .collect()
        )
        for row in grad:
            W[row["b"]] = W[row["b"]] - _sdiv(
                E * row["g"], S4 * m[row["b"]] * k
            )
        print(f"iter {k}: {time.perf_counter() - ts:.2f}s")
    print(f"TOTAL: {time.perf_counter() - t0:.2f}s")
    feats.unpersist()


if __name__ == "__main__":
    main()
