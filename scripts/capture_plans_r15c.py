#!/usr/bin/env python
"""Capture .explain('formatted') for the surfaces touched by the
THIRD session of optimization round 15 into plans/r15/ (suffix
r15c_*).

- silver_vocab_bpe: BEFORE, the k per-step ``LIMIT 1`` output arms
  each re-reference s{i}, so CTE inlining re-instantiates the whole
  chain up to step i (144 Window / 64 Exchange / 16 scans, none
  reused).  AFTER, each step appends its chosen merge to a carried
  ``merges`` array and ONE posexplode of the final CTE emits the
  merge table — the executed plan is the linear chain alone.

Usage: python scripts/capture_plans_r15c.py [BEFORE_REF]
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from data_transformation_python_spark.queries import load  # noqa: E402
from data_transformation_python_spark.session import get_spark  # noqa: E402


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _render_vocab(sql_text):
    body = sql_text.split("\n{% if", 1)[1]
    body = body.split("%}", 1)[1].split("{% else %}", 1)[0]
    return body.replace("{{ ref('silver_words') }}", "__plan_words")


def main() -> None:
    before_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    out_dir = os.path.join(HERE, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan-capture-r15c")
    docs = load(spark, sf_dir, "documents")

    def put(name, text, header=""):
        p = os.path.join(out_dir, name + ".txt")
        with open(p, "w") as fh:
            if header:
                fh.write("-- " + header + "\n")
            fh.write(text)
        print("wrote", p)

    head_sql = subprocess.run(
        ["git", "show",
         f"{before_ref}:example_pipeline/models/silver/silver_vocab.sql"],
        capture_output=True, text=True, cwd=HERE,
    ).stdout
    cur_sql = open(os.path.join(
        HERE, "example_pipeline/models/silver/silver_vocab.sql"
    )).read()
    wtbl = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.length(F.first("word")).cast("bigint").alias("n"),
        )
    )
    wtbl.createOrReplaceTempView("__plan_words")
    put(
        "silver_vocab_bpe_r15c_before",
        fmt(spark.sql(_render_vocab(head_sql))),
        header=(
            "BEFORE (r15c): k LIMIT-1 output arms re-reference each "
            "s{i}; CTE inlining re-instantiates the chain per arm"
        ),
    )
    put(
        "silver_vocab_bpe_r15c_after",
        fmt(spark.sql(_render_vocab(cur_sql))),
        header=(
            "AFTER (r15c): per-step bests accumulate in a carried "
            "merges array; one posexplode of the final CTE emits the "
            "merge table — single linear chain"
        ),
    )


if __name__ == "__main__":
    main()
