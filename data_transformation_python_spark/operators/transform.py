"""Small DataFrame transformation utilities mirroring the reference's
Polars helper surface (SURVEY §2.2 P5, §2.4 A3, §2.1 S11) — thin
wrappers over native Spark operations so callers of the reference's
utility API have direct equivalents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate spec name → Spark function (reference: polars_utils.py:56-97
#: supports sum/mean/count/min/max/std/n_unique)
_AGG_FNS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "std": F.stddev,
    "n_unique": F.countDistinct,
}


def grouped_aggregate(
    df: DataFrame, group_cols: Sequence[str], aggs: dict[str, Sequence[str] | str]
) -> DataFrame:
    """GroupBy + multi-aggregate with ``{col}_{fn}`` aliases
    (reference: polars_utils.py:56-97 — A3).  ``aggs`` maps column →
    fn name(s).  All partial-aggregated map-side by Catalyst."""
    exprs = []
    for col, fns in aggs.items():
        if isinstance(fns, str):
            fns = [fns]
        for fn in fns:
            if fn not in _AGG_FNS:
                raise ValueError(f"unknown aggregate {fn!r}; expected {sorted(_AGG_FNS)}")
            exprs.append(_AGG_FNS[fn](col).alias(f"{col}_{fn}"))
    if not exprs:
        raise ValueError("aggs must not be empty")
    return df.groupBy(*group_cols).agg(*exprs)


def apply_filters(df: DataFrame, filters: Sequence[str]) -> DataFrame:
    """Apply SQL filter expressions (reference: polars_utils.py:172-212
    — P5; that version hand-parses `col op value`, Spark's full
    expression parser replaces it)."""
    for f in filters:
        df = df.filter(F.expr(f))
    return df


def apply_aliases(df: DataFrame, aliases: dict[str, str]) -> DataFrame:
    """Rename columns {old: new} (P5's transform half)."""
    for old, new in aliases.items():
        df = df.withColumnRenamed(old, new)
    return df


#: session conf controlling how ``materialize`` cuts lineage:
#:   "auto"  — reliable ``checkpoint()`` when a checkpoint dir is set,
#:             else ``localCheckpoint()`` (right for local[.])
#:   "true"  — always reliable (raises if no checkpoint dir)
#:   "false" — always local
RELIABLE_CHECKPOINT_CONF = "spark.data_transformation.reliableCheckpoint"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage by checkpointing — reliably when the session is set
    up for it, locally otherwise.

    Local checkpoints live in executor block storage and die with an
    executor; on a multi-executor cluster a long pipeline must use
    reliable ``checkpoint()`` (HDFS/object-store backed) instead.  The
    default resolves per-session: ``sparkContext.setCheckpointDir(...)``
    (or ``RELIABLE_CHECKPOINT_CONF=true``) flips every materialization
    point in the engine to the reliable path — no per-call-site wiring.
    """
    spark = df.sparkSession
    mode = spark.conf.get(RELIABLE_CHECKPOINT_CONF, "auto").lower()
    if mode == "true":
        return df.checkpoint(eager=eager)
    if mode == "auto":
        try:
            has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
        except Exception:
            has_dir = False
        if has_dir:
            return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def clone_schema(spark, source_table: str, target_table: str) -> None:
    """Create an empty table with the source's schema (reference:
    cdc_polars.py:157-168, 541-544 — S11: CTAS ... LIMIT 0)."""
    spark.table(source_table).limit(0).write.mode("errorifexists").format(
        "parquet"
    ).saveAsTable(target_table)


def profile_columns(
    df: DataFrame, columns: Sequence[str], approx: bool = False
) -> DataFrame:
    """Single-pass column profile — the data-quality report a pipeline
    runs before trusting a new source: per column, null count, (near-)
    distinct count, and lexicographic min/max (values cast to string
    so one long-form schema covers every column type).

    ONE aggregation job for all columns: the wide one-row aggregate is
    unpivoted with ``stack`` into (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value).  With ``approx=True`` the
    distinct counts use HLL (approx_count_distinct) — at 100 TB the
    exact multi-column COUNT DISTINCT expands the aggregate per
    column, so wide profiles should pass approx unless a verifier
    needs exact numbers.
    """
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__null_{c}"),
            distinct(c).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_value, max_value)",
        "__n AS n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def zorder_column(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Append a Z-order (Morton) key over ``cols``: each column is
    min/max-scaled into 2^bits buckets (one tiny probe job), and the
    bucket bits are interleaved into one BIGINT — sorting by it gives
    every output file locality in EVERY listed dimension, so parquet
    min/max stats prune scans on any of them (the multi-column case
    single-key clustering cannot serve).

    The interleave is pure integer expressions inside codegen; NULLs
    and constant columns land in bucket 0.  Linear bucketing is the
    deterministic choice (rank-based Z-ordering needs a full sort per
    dimension); heavy skew concentrates buckets — pre-transform the
    column (e.g. log) if that matters.  Returns (df_with_key,
    key_column_name).
    """
    probe = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{i}") for i, c in enumerate(cols)],
    ).first()
    n = len(cols)
    max_bucket = (1 << bits) - 1
    bucket_exprs = []
    for i, c in enumerate(cols):
        lo, hi = probe[f"__lo_{i}"], probe[f"__hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            bucket_exprs.append("CAST(0 AS BIGINT)")
            continue
        scale = max_bucket / (hi - lo)
        bucket_exprs.append(
            f"CAST(least({max_bucket}, greatest(0, "
            f"floor((coalesce(CAST({c} AS DOUBLE), {lo}) - {lo}) * {scale!r})"
            f")) AS BIGINT)"
        )
    terms = []
    for i in range(n):
        for b in range(bits):
            shift = b * n + i
            terms.append(f"shiftleft(shiftright(__zb{i}, {b}) & 1, {shift})")
    key = "__zorder_key"
    staged = df.select(
        "*", *[F.expr(e).alias(f"__zb{i}") for i, e in enumerate(bucket_exprs)]
    )
    out = staged.select(
        *df.columns, F.expr(" + ".join(terms)).cast("bigint").alias(key)
    )
    return out, key


def lit_long_array(values) -> "F.Column":
    """A BIGINT-array literal Column built in O(1) driver time.

    ``F.lit(list)`` converts the list element-by-element over py4j
    (~0.5-0.7 s measured for 1024 ints — per call), and splicing an
    ``array(..L, ..)`` string into SQL costs ~0.5-1 s of parse/
    analysis per plan.  ``from_json`` of a literal string crosses
    py4j once and Catalyst constant-folds it into the SAME array
    Literal the other forms produce (verified in the optimized plan),
    so evaluation is identical — this is purely a plan-construction
    fast path.  int64 values round-trip JSON exactly."""
    import json as _json

    vals = [int(v) for v in values]
    return F.from_json(F.lit(_json.dumps(vals)), "array<bigint>")
