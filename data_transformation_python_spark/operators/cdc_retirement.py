"""CDC *retirement* pattern (SCD2-style soft deletes) as one
distributed DataFrame job per batch.

Reference semantics (reference: src/framework/cdc_polars.py:87-423,
docs/CDC_RETIREMENT_PATTERN.md:9-66):

- Table = business columns + ``__CDC_OPERATION`` + ``__CDC_TIMESTAMP``
  + ``obsolete_date`` (NULL = active row).
- INSERT ('I')        → new active row.
- UPDATE ('U')        → retire the current active row (set
  ``obsolete_date``), insert the new version as active.
- DELETE ('D') / EXPIRE ('E') → retire the current active row; history
  is preserved, nothing is physically deleted.
- A 'D' for a never-seen key is a no-op.
- Multiple changes for one key in a batch: latest by
  ``__CDC_TIMESTAMP`` wins (keep-last; the reference's key-ordered
  dedup at cdc_polars.py:443 is nondeterministic — we order by the CDC
  timestamp instead, per SURVEY.md §7).
- Missing/NULL op defaults to 'U' (cdc_polars.py:234).

The reference processes this with driver-side chunking and 1000-key
IN-list UPDATE batches (cdc_polars.py:358-379, 447-516); on Spark the
whole batch is one plan: a single shuffle on the key for the
retire-join, map-side unions for the rest.  At 100 TB: partition the
stored table by ``is_active`` + key bucket so the active slice (the
only side ever joined) stays small and partition-pruned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge import OP_DELETE, OP_EXPIRE, OP_INSERT, OP_UPDATE, dedup_keep_latest

OP_COL = "__CDC_OPERATION"
TS_COL = "__CDC_TIMESTAMP"
OBSOLETE_COL = "obsolete_date"


def initial_cdc_load(
    batch: DataFrame,
    keys: Sequence[str],
    op_col: str = OP_COL,
    ts_col: str = TS_COL,
) -> DataFrame:
    """First load: dedup keep-last per key, mark everything active 'I'
    (reference: cdc_polars.py:425-445)."""
    business = [c for c in batch.columns if c not in (op_col, ts_col)]
    deduped = (
        dedup_keep_latest(batch, list(keys), [ts_col])
        if ts_col in batch.columns
        else batch
    )
    return deduped.select(
        *business,
        F.lit(OP_INSERT).alias(op_col),
        (F.col(ts_col) if ts_col in batch.columns else F.current_timestamp()).alias(
            ts_col
        ),
        F.lit(None).cast("timestamp").alias(OBSOLETE_COL),
    )


def apply_cdc_retirement(
    target: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    as_of=None,
    op_col: str = OP_COL,
    ts_col: str = TS_COL,
) -> DataFrame:
    """Apply one CDC batch to a retirement table; returns the new full
    table (retired history ∪ still-active ∪ newly-retired ∪ new rows).

    ``as_of``: retirement timestamp Column/literal (default
    ``current_timestamp()``; pass a literal for reproducible tests —
    the reference uses wall-clock ``CURRENT_TIMESTAMP()``,
    cdc_polars.py:372).
    """
    keys = list(keys)
    as_of_col = F.current_timestamp() if as_of is None else F.lit(as_of).cast("timestamp")
    business = [c for c in target.columns if c not in (op_col, ts_col, OBSOLETE_COL)]

    changes = dedup_keep_latest(batch, keys, [ts_col]).withColumn(
        op_col, F.coalesce(F.col(op_col), F.lit(OP_UPDATE))
    )

    active = target.filter(F.col(OBSOLETE_COL).isNull())
    retired_history = target.filter(F.col(OBSOLETE_COL).isNotNull())

    # Keys whose active row must be retired: any U/D/E change.
    retire_keys = (
        changes.filter(F.col(op_col).isin(OP_UPDATE, OP_DELETE, OP_EXPIRE))
        .select(*keys)
        .distinct()
        .withColumn("__retire", F.lit(True))
    )
    marked = active.join(retire_keys, on=keys, how="left")
    newly_retired = (
        marked.filter(F.col("__retire").isNotNull())
        .drop("__retire")
        .withColumn(OBSOLETE_COL, as_of_col)
    )
    still_active = marked.filter(F.col("__retire").isNull()).drop("__retire")

    # New active versions: every I, and the new image of every U.
    new_rows = changes.filter(F.col(op_col).isin(OP_INSERT, OP_UPDATE)).select(
        *business,
        F.col(op_col),
        F.col(ts_col),
        F.lit(None).cast("timestamp").alias(OBSOLETE_COL),
    )
    # 'U' for a never-seen key behaves as insert (MERGE NOT MATCHED →
    # INSERT, reference materialization.py:589-592) — that is exactly
    # what the union produces, since there was no active row to retire.
    cols = [*business, op_col, ts_col, OBSOLETE_COL]
    return (
        retired_history.select(*cols)
        .unionByName(newly_retired.select(*cols))
        .unionByName(still_active.select(*cols))
        .unionByName(new_rows.select(*cols))
    )


def batch_stats(batch: DataFrame, op_col: str = OP_COL) -> dict:
    """Per-op counts for a CDC batch — the stats dict shape the
    reference returns (cdc_polars.py:286-296).  One small aggregate
    job; no driver-side row iteration."""
    rows = (
        batch.withColumn(op_col, F.coalesce(F.col(op_col), F.lit(OP_UPDATE)))
        .groupBy(op_col)
        .count()
        .collect()
    )
    counts = {r[op_col]: r["count"] for r in rows}
    return {
        "inserted": counts.get(OP_INSERT, 0),
        "updated": counts.get(OP_UPDATE, 0),
        "deleted": counts.get(OP_DELETE, 0),
        "expired": counts.get(OP_EXPIRE, 0),
        "total": sum(counts.values()),
    }
