#!/usr/bin/env python
"""Capture .explain('formatted') for round-15-touched queries into
plans/r15/.  Run from EITHER the optimized checkout (suffix 'after')
or a pre-optimization worktree (suffix 'before'):

    python scripts/capture_plans_r15.py after [OUT_DIR]

Round-15 touched surfaces and what is captured for each:

- text_tokenizer_compare / text_unigram_tokenize / q_stream entries
  whose declared frame is an eager localCheckpoint or a driver-built
  LocalRelation get the plan of the meaningful INTERNAL dataframe
  (the E-step / gradient job), with a header saying which — the
  declared plan would be an opaque RDD scan either way.
- text_lr_train*: the per-iteration gradient plan (JVM explode+agg on
  the before side; on the after side the fixture-scale path is a
  driver-local numpy loop, so the captured artifact is the feature-
  build plan plus a header documenting the loop's plan-free shape).
- text_bpe_learn: the per-step pair-count plan (before) vs the
  driver-local loop note + the final segmentation frame (after).
- multimodal_h264sub_meta: the declared mapInPandas chain (unchanged
  plan shape across the round — the codec change is inside the Python
  workers; committed to show exactly that).
"""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from data_transformation_python_spark.queries import (  # noqa: E402
    all_queries,
    load,
)
from data_transformation_python_spark.session import get_spark  # noqa: E402


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        HERE, "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan-capture-r15")
    docs = load(spark, sf_dir, "documents")
    qreg = all_queries()

    def put(name, text, header=""):
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            if header:
                fh.write("-- " + header + "\n")
            fh.write(text)
        print("wrote", p)

    # 1. declared queries whose full plan is meaningful
    for q in ("text_tokenizer_compare", "multimodal_h264sub_meta"):
        try:
            put(q, fmt(qreg[q](spark, sf_dir)),
                header=f"declared query {q}, sf_dir={sf_dir}")
        except Exception as e:  # noqa: BLE001
            print(q, "FAILED:", e)

    from pyspark import StorageLevel  # noqa: E402

    from data_transformation_python_spark.operators import (  # noqa: E402
        text as tx,
    )

    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= 12))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("n", F.length("word").cast("int"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    words.count()
    vocab = {c: 100 for c in "0123456789abcdef"}
    vocab.update({"ab": 90, "cd": 90, "ef": 80})
    scale = 1 << 13

    # 2. the unigram E-step counts job (the trainer's inner loop)
    tables = (
        tx._ulm_vocab_tables(vocab, 4, 12)
        if hasattr(tx, "_ulm_vocab_tables") else None
    )
    if tables is not None and hasattr(tx, "_ulm_estep_np"):
        counts = tx._ulm_estep_np(words, vocab, scale, 4, False,
                                  tables, 12)
        put("ulm_estep_counts", fmt(counts),
            header="NEW vectorized E-step: mapInArrow numpy double-"
            "Viterbi emitting per-task (piece, c) partials into a "
            "vocab-sized groupBy — the interpreted HOF aggregate() "
            "projection is gone from the plan")
    else:
        pairs = []
        for p_, neg in sorted(vocab.items()):
            pairs.extend([F.lit(p_), F.lit(int(neg)).cast("long")])
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
        base = (
            words.withColumn("vmap", F.create_map(*pairs))
            .withColumn("dp", F.expr(tx._ulm_dp_expr(scale, 4, True)))
            .withColumn("sp", F.expr(tx._ulm_dp_expr(scale, 4, False)))
        )
        chosen = base.select("cnt", F.explode(F.expr(cands)).alias("piece"))
        counts = chosen.groupBy("piece").agg(
            F.sum("cnt").cast("bigint").alias("c"))
        put("ulm_estep_counts", fmt(counts),
            header="OLD E-step: the per-word double-Viterbi as "
            "interpreted aggregate() HOF expressions inside one "
            "projection + vocab-sized groupBy")

    # 3. the seed-inventory pass
    if hasattr(tx, "_ulm_seed_occ_np"):
        occ = tx._ulm_seed_occ_np(words, 4, 12)
        put("ulm_seed_occ", fmt(occ),
            header="NEW vectorized seed pass: mapInArrow uint64-packed "
            "substring partials -> groupBy(piece)")
    else:
        occ = (
            words.select(
                "cnt",
                F.explode(F.expr(
                    "flatten(transform(sequence(1, n), j -> "
                    "transform(sequence(1, least(4, n - j + 1)),"
                    " L -> substr(word, j, L))))"
                )).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        put("ulm_seed_occ", fmt(occ),
            header="OLD seed pass: HOF transform+flatten explode of "
            "~42 substrings per word -> groupBy(piece)")

    # 4. the LR gradient: before = the per-iteration JVM job; after =
    # the same JVM plan is captured (it remains the bounds-unprovable
    # fallback) with a header noting the fixture-scale default is now
    # a plan-free driver loop over one toArrow collect.
    from data_transformation_python_spark.operators import (  # noqa: E402
        training as tr,
    )
    from data_transformation_python_spark.operators.transform import (  # noqa: E402
        lit_long_array,
    )

    b_expr = tr._bucket_expr("t", 1024)
    tw_expr = tr._teacher_expr("t")
    S = 1 << 16
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
            " (a, x) -> a + x.tw) > 0 THEN CAST(1 AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
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
    )
    z = (
        "aggregate(counts, CAST(0 AS BIGINT), (acc, x) ->"
        " acc + x.c * element_at(__w, CAST(x.b + 2 AS INT)))"
    )
    r = (
        f"(least(greatest({z} + {2 * S}, CAST(0 AS BIGINT)),"
        f" CAST({4 * S} AS BIGINT)) - {4 * S} * y) * 1"
    )
    grad = (
        feats.withColumn("__w", lit_long_array([0] * 1025))
        .select(F.expr(r).alias("r"), F.explode("counts").alias("x"))
        .groupBy(F.col("x.b").alias("b"))
        .agg(F.expr("try_sum(r * x.c)").alias("g"))
    )
    is_new = hasattr(tr, "_LR_DRIVER_MAX")
    put("lr_gradient_iteration", fmt(grad),
        header=(
            "AFTER: this JVM plan remains ONLY the bounds-unprovable "
            "fallback; below _LR_DRIVER_MAX=500k feature rows the 12 "
            "iterations run driver-local on one toArrow collect (no "
            "per-iteration plan at all), above it as mapInArrow "
            "partials" if is_new else
            "BEFORE: executed once per GD iteration (12x per train) — "
            "each iteration re-plans and re-schedules this job"
        ))

    # 5. the BPE per-step pair count (before) / driver-local note (after)
    cur = words.select(
        "word", "cnt",
        F.concat(
            F.lit(" "),
            F.array_join(F.expr(tx.bpe_charsplit_expr("word", "spark")),
                         " "),
            F.lit(" "),
        ).alias("symstr"),
    )
    cur.selectExpr(
        "word", "cnt", f"{tx._BPE_SYMS_FROM_STR} AS syms"
    ).createOrReplaceTempView("__plan_bpe")
    best = spark.sql(tx.bpe_pair_count_sql("SELECT * FROM __plan_bpe",
                                           "spark"))
    is_new = hasattr(tx, "_BPE_DRIVER_MAX")
    put("bpe_pair_count_step", fmt(best),
        header=(
            "AFTER: this per-step plan now runs ONLY above "
            "_BPE_DRIVER_MAX=100k distinct words; below it the k merge "
            "steps run driver-local on one collected histogram"
            if is_new else
            "BEFORE: executed once per merge step (k=8x per train) "
            "against the re-persisted symbol state"
        ))
    spark.catalog.dropTempView("__plan_bpe")
    words.unpersist()


if __name__ == "__main__":
    main()
