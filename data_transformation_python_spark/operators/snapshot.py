"""dbt-style snapshots: SCD2 history over a MUTABLE source with no
CDC feed (reference has CDC-driven retirement only; snapshots detect
changes themselves by comparing the source to the open versions —
the dbt `snapshot` block's check/timestamp strategies).

Row lifecycle columns: ``valid_from`` / ``valid_to`` (NULL = open) /
``is_current``.  Change detection:

- ``check``: md5 over the configured check columns (null-safe,
  separator-framed) differs from the open version's.
- ``timestamp``: the source's ``updated_at`` is newer than the open
  version's ``valid_from``.

Scale posture: one pass — the open slice joins the source batch on
the key (both sides are "current" cardinality, not history), closed
history is untouched and unioned back by reference.  With the
table partitioned by ``is_current`` the history read is
partition-pruned to the open slice only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
NULL_TOKEN = "\x00"


def row_fingerprint(cols: list[str]) -> Column:
    """Null-safe md5 over the check columns (cast to string, framed
    so ("a", NULL) never collides with ("aNULL",))."""
    framed = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_TOKEN)) for c in cols
    ]
    return F.md5(F.concat_ws(SEP, *framed))


def initial_snapshot(src: DataFrame, ts) -> DataFrame:
    return src.select(
        "*",
        F.lit(ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def snapshot_merge(
    target: DataFrame,
    src: DataFrame,
    keys: list[str],
    check_cols: list[str],
    ts,
    strategy: str = "check",
    updated_at: str | None = None,
    invalidate_hard_deletes: bool = False,
) -> DataFrame:
    """One-pass SCD2 merge of a source batch into a snapshot table.

    Returns the FULL new table content (closed history + closed-now
    rows + surviving opens + fresh opens) for a staging swap.
    """
    data_cols = [c for c in src.columns]
    history = target.filter(~F.col("is_current"))
    open_rows = target.filter(F.col("is_current"))

    if strategy == "check":
        changed_pred = row_fingerprint(
            [f"s.{c}" for c in check_cols]
        ) != row_fingerprint([f"t.{c}" for c in check_cols])
    elif strategy == "timestamp":
        if not updated_at:
            raise ValueError("timestamp strategy requires updated_at")
        # null-safe: a NULL updated_at makes `>` evaluate to NULL,
        # which would fail the closed, kept, AND fresh filters below
        # and silently drop the key's open row — treat NULL as
        # "unchanged" so the open version survives.
        changed_pred = F.coalesce(
            F.col(f"s.{updated_at}") > F.col("t.valid_from"), F.lit(False)
        )
    else:
        raise ValueError(f"unknown snapshot strategy {strategy!r}")

    # presence markers survive NULL key values (isNotNull on a key
    # column would misread a legitimately-NULL key as "absent")
    s = src.withColumn("__sp", F.lit(True)).alias("s")
    t = open_rows.withColumn("__tp", F.lit(True)).alias("t")
    cond = [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer").select(
        *[F.col(f"t.{c}").alias(f"t_{c}") for c in target.columns],
        *[F.col(f"s.{c}").alias(f"s_{c}") for c in data_cols],
        F.coalesce(F.col("s.__sp"), F.lit(False)).alias("__in_src"),
        F.coalesce(F.col("t.__tp"), F.lit(False)).alias("__in_tgt"),
        changed_pred.alias("__changed"),
    )

    def t_side():
        return [F.col(f"t_{c}").alias(c) for c in data_cols]

    def s_side():
        return [F.col(f"s_{c}").alias(c) for c in data_cols]

    ts_lit = F.lit(ts).cast("timestamp")
    # open version closed: source changed it, or (optionally) dropped it
    close_pred = F.col("__in_tgt") & (
        (F.col("__in_src") & F.col("__changed"))
        | (~F.col("__in_src") if invalidate_hard_deletes else F.lit(False))
    )
    closed = joined.filter(close_pred).select(
        *t_side(),
        F.col("t_valid_from").alias("valid_from"),
        ts_lit.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    kept = joined.filter(
        F.col("__in_tgt")
        & F.col("__in_src")
        & ~F.col("__changed")
    ).select(
        *t_side(),
        F.col("t_valid_from").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    kept_dropped = (
        joined.filter(F.col("__in_tgt") & ~F.col("__in_src")).select(
            *t_side(),
            F.col("t_valid_from").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        if not invalidate_hard_deletes
        else None
    )
    fresh = joined.filter(
        F.col("__in_src") & (~F.col("__in_tgt") | F.col("__changed"))
    ).select(
        *s_side(),
        ts_lit.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out = history.unionByName(closed).unionByName(kept).unionByName(fresh)
    if kept_dropped is not None:
        out = out.unionByName(kept_dropped)
    return out
