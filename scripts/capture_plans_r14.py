#!/usr/bin/env python
"""Capture .explain('formatted') for round-14-touched queries into
plans/r14/.  Run from EITHER the optimized checkout (suffix 'after')
or a pre-optimization worktree (suffix 'before'):

    python scripts/capture_plans_r14.py after  [OUT_DIR]

Queries whose declared frame is a memory-sink table or a driver-built
LocalRelation (trainers, streaming gates) get the plan of the
meaningful INTERNAL dataframe instead, with a header saying which.
"""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from data_transformation_python_spark.session import get_spark  # noqa: E402
from data_transformation_python_spark.queries import all_queries, load  # noqa: E402


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        HERE, "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan-capture-r14")
    docs = load(spark, sf_dir, "documents")
    qreg = all_queries()

    def put(name, text, header=""):
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            if header:
                fh.write("-- " + header + "\n")
            fh.write(text)
        print("wrote", p)

    # 1. real batch queries touched this round — full declared plan
    # (text_unigram_tokenize itself returns an eager localCheckpoint,
    # so its declared plan is an opaque RDD scan; the serve join+agg
    # is captured separately below, pre-checkpoint)
    for q in ("text_tokenizer_compare",):
        try:
            put(q, fmt(qreg[q](spark, sf_dir)),
                header=f"declared query {q}, sf_dir={sf_dir}")
        except Exception as e:  # noqa: BLE001
            print(q, "FAILED:", e)

    # 2. unigram E-step counts-path internal plan (the trainer's per-
    # iteration job; the declared trainer query returns a driver-built
    # LocalRelation so the E-step plan is the meaningful artifact)
    from data_transformation_python_spark.operators import text as tx

    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= 12))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("n", F.length("word").cast("int"))
    )
    vocab = {c: 100 for c in "0123456789abcdef"}
    vocab.update({"ab": 90, "cd": 90, "ef": 80})
    scale = 1 << 13
    # replicate the counts-path frame exactly as _ulm_estep builds it,
    # on BOTH code versions, by calling through the private API
    try:
        import inspect
        src = inspect.getsource(tx._ulm_estep)
        is_old = ".persist(StorageLevel.MEMORY_AND_DISK)" in src
        if is_old:  # old two-pass shape
            pairs = []
            for p_, neg in sorted(vocab.items()):
                pairs.extend([F.lit(p_), F.lit(int(neg)).cast("long")])
            with_dp = (
                words.withColumn("vmap", F.create_map(*pairs))
                .withColumn("dp", F.expr(tx._ulm_dp_expr(scale, 4, True)))
                .withColumn("sp", F.expr(tx._ulm_dp_expr(scale, 4, False)))
            )
            chosen = (
                with_dp.select(
                    "word", "cnt", "n", "dp", "sp", "vmap",
                    F.explode(F.expr("sequence(0, n - 1)")).alias("j"),
                )
                .select("*", F.explode(
                    F.expr("sequence(1, 4)")).alias("L"))
                .filter(F.expr("j + L <= n"))
                .select(
                    "word", "cnt",
                    F.expr("substr(word, j + 1, L)").alias("piece"),
                    F.expr(
                        "element_at(dp, j + 1) + try_element_at(vmap, "
                        f"substr(word, j + 1, L)) * {scale}"
                        " + shiftleft(1, j + L)"
                        " + element_at(sp, j + L + 1)"
                    ).alias("path_cost"),
                    F.expr("element_at(dp, n + 1)").alias("total"),
                )
                .filter(F.col("path_cost").isNotNull()
                        & (F.col("path_cost") == F.col("total")))
            )
            counts = chosen.groupBy("piece").agg(
                F.sum("cnt").cast("bigint").alias("c"))
            put("ulm_estep_counts", fmt(counts),
                header="OLD two-pass E-step: this aggregation plus a "
                "separate consistency count() job over a persisted "
                "(word, dp, sp, vmap) cache")
        else:  # new fused shape
            onpath = (
                "element_at(dp, j + 1) + try_element_at(vmap, "
                f"substr(word, j + 1, L)) * {scale}"
                " + shiftleft(1, j + L) + element_at(sp, j + L + 1)"
                " = element_at(dp, n + 1)"
            )
            cands = (
                "CASE WHEN element_at(dp, n + 1) <> element_at(sp, 1)"
                " THEN array(CAST(NULL AS STRING))"
                " ELSE filter(flatten(transform(sequence(0, n - 1), j ->"
                " transform(sequence(1, least(4, n - j)), L ->"
                f" IF({onpath}, substr(word, j + 1, L),"
                " CAST(NULL AS STRING))))), x -> x IS NOT NULL) END"
            )
            pairs = []
            for p_, neg in sorted(vocab.items()):
                pairs.extend([F.lit(p_), F.lit(int(neg)).cast("long")])
            base = (
                words.withColumn("vmap", F.create_map(*pairs))
                .withColumn("dp", F.expr(tx._ulm_dp_expr(scale, 4, True)))
                .withColumn("sp", F.expr(tx._ulm_dp_expr(scale, 4, False)))
            )
            chosen = base.select(
                "cnt", F.explode(F.expr(cands)).alias("piece"))
            counts = chosen.groupBy("piece").agg(
                F.sum("cnt").cast("bigint").alias("c"))
            put("ulm_estep_counts", fmt(counts),
                header="NEW fused one-pass E-step: the ONLY job "
                "(sentinel NULL piece carries the consistency check); "
                "no persist, no second pass")
    except Exception as e:  # noqa: BLE001
        print("ulm_estep FAILED:", e)

    # 3. unigram_tokenize serve join + doc aggregation, pre-checkpoint
    # (the declared query eagerly checkpoints its result, hiding the
    # plan).  Uses a real trained seg table at this sf.
    try:
        words2, _c2, neg2 = tx._ulm_fit(docs, "text", 12, 4, 48, 24)
        try:
            seg = tx._ulm_estep(words2, neg2, scale, 4,
                                return_frame=True)
            doc_words = (
                docs.select(
                    "doc_id",
                    F.explode(F.split(F.col("text"), " ")).alias("word"),
                )
                .filter((F.col("word") != "") & (F.length("word") <= 12))
            )
            if is_old:
                nw = doc_words.groupBy("doc_id").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_words"))
                pieces = (
                    doc_words.join(seg, "word").groupBy("doc_id")
                    .agg(F.count(F.lit(1)).cast("bigint").alias(
                             "n_pieces"),
                         F.countDistinct("piece").cast("bigint").alias(
                             "n_distinct_pieces"))
                )
                out = nw.join(pieces, "doc_id").select(
                    "doc_id", "n_words", "n_pieces", "n_distinct_pieces")
                put("unigram_tokenize_serve_join", fmt(out),
                    header="OLD serve: two doc-key aggregations + a "
                    "doc-key join; seg = exploded (word, piece) rows")
            else:
                out = (
                    doc_words.join(seg, "word").groupBy("doc_id")
                    .agg(F.count(F.lit(1)).cast("bigint").alias(
                             "n_words"),
                         F.expr("CAST(sum(size(pieces)) AS BIGINT)"
                                ).alias("n_pieces"),
                         F.expr("CAST(size(array_distinct(flatten("
                                "collect_list(pieces)))) AS BIGINT)"
                                ).alias("n_distinct_pieces"))
                    .select("doc_id", "n_words", "n_pieces",
                            "n_distinct_pieces")
                )
                put("unigram_tokenize_serve_join", fmt(out),
                    header="NEW serve: ONE doc-key aggregation over "
                    "the word join; seg = vocab-sized (word, pieces "
                    "ARRAY) rows")
        finally:
            words2.unpersist()
    except Exception as e:  # noqa: BLE001
        print("serve join FAILED:", e)

    spark.stop()


if __name__ == "__main__":
    main()
