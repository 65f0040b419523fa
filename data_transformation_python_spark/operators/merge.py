"""Upsert / CDC-merge as distributed DataFrame plans.

The reference emits Snowflake ``MERGE INTO`` statements:
- keyed upsert (reference: src/framework/materialization.py:358-366)
- CDC I/U/D merge with ``COALESCE(op,'U')`` defaulting
  (reference: src/framework/materialization.py:576-593, macros.py:38-53)

Vanilla Spark cannot mutate parquet in place, so MERGE is re-expressed
as a *full-outer-join rewrite*: one shuffle on the merge key, then a
row-level resolution — semantically identical to the reference's MERGE
clauses, and embarrassingly parallel at cluster scale.  When the
change set is small relative to the target, Catalyst/AQE broadcasts
it, so the rewrite degrades to a broadcast join + overwrite of
affected partitions.

Scale note: at 100 TB the winning strategy is to partition the target
table by a stable bucket of the merge key and rewrite only partitions
containing changed keys (see ``affected_partitions``); a Delta/Iceberg
catalog would give the same via MERGE INTO + file-level skipping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: CDC operation codes (reference: docs/CDC_RETIREMENT_PATTERN.md)
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
OP_EXPIRE = "E"

_T_PRESENT = "__t_present"
_S_PRESENT = "__s_present"


def dedup_keep_latest(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep exactly one row per key — the last by ``order_by``.

    The reference's keep-last dedup (reference: src/framework/
    cdc_polars.py:443) sorts by the key itself, which is not
    deterministic for duplicate keys; we require an explicit ordering
    (normally the CDC timestamp) and document that improvement
    (SURVEY.md §7 hard parts).  Implemented as the W1 window pattern:
    ROW_NUMBER over (PARTITION BY key ORDER BY order_by DESC) = 1 —
    one shuffle on the key, no driver involvement.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Keyed upsert: MATCHED → UPDATE all columns, NOT MATCHED → INSERT.

    Equivalent to the reference's unique-key incremental MERGE
    (reference: src/framework/materialization.py:358-366).  Source
    rows win on key collision; one shuffle (or broadcast) on ``keys``.
    """
    keys = list(keys)
    value_cols = [c for c in target.columns if c not in keys]
    t = target.withColumn(_T_PRESENT, F.lit(True))
    s = source.select(*keys, *value_cols).withColumn(_S_PRESENT, F.lit(True))
    joined = t.alias("t").join(s.alias("s"), on=keys, how="full_outer")
    resolved = [
        F.when(F.col(f"s.{_S_PRESENT}").isNotNull(), F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in value_cols
    ]
    return joined.select(*[F.col(k) for k in keys], *resolved)


def apply_cdc_merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    op_col: str = "__CDC_OPERATION",
    ts_col: str | None = "__CDC_TIMESTAMP",
) -> DataFrame:
    """CDC merge with I/U/D semantics (reference: src/framework/
    materialization.py:576-593):

    - MATCHED  AND op = 'D'          → DELETE
    - MATCHED  AND op IN ('U','I')   → UPDATE all columns
    - NOT MATCHED AND op != 'D'      → INSERT
    - op defaults to 'U' via COALESCE (materialization.py:581)

    If the batch carries multiple rows per key, the latest by
    ``ts_col`` wins (keep-last O1 semantics).  Returns the merged
    table (business columns only).
    """
    keys = list(keys)
    value_cols = [c for c in target.columns if c not in keys]
    src = source
    if ts_col and ts_col in src.columns:
        src = dedup_keep_latest(src, keys, [ts_col])
    src = src.withColumn(op_col, F.coalesce(F.col(op_col), F.lit(OP_UPDATE)))
    s = src.select(*keys, F.col(op_col).alias("__op"), *value_cols).withColumn(
        _S_PRESENT, F.lit(True)
    )
    t = target.withColumn(_T_PRESENT, F.lit(True))
    joined = t.alias("t").join(s.alias("s"), on=keys, how="full_outer")

    s_present = F.col(f"s.{_S_PRESENT}").isNotNull()
    t_present = F.col(f"t.{_T_PRESENT}").isNotNull()
    is_delete = s_present & (F.col("s.__op") == OP_DELETE)
    updates = s_present & F.col("s.__op").isin(OP_UPDATE, OP_INSERT)
    # A row survives unless its change row is a DELETE: target-only rows
    # pass (no change), source DELETEs drop matched rows and are no-ops
    # for never-seen keys (both filtered here).  Matched rows take the
    # source image only for op IN ('U','I') — mirroring the reference's
    # MERGE clause list exactly (materialization.py:582-588): a matched
    # row with any other op keeps its target values; unmatched non-'D'
    # rows insert regardless of op (clause at :589-592).
    resolved = [
        F.when(updates, F.col(f"s.{c}"))
        .when(t_present, F.col(f"t.{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
        for c in value_cols
    ]
    return joined.filter(~is_delete).select(*[F.col(k) for k in keys], *resolved)
