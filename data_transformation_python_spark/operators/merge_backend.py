"""Pluggable MERGE backend seam.

The reference emits Snowflake ``MERGE INTO`` statements and lets the
warehouse execute them (reference: src/framework/
materialization.py:358-366 keyed upsert, :576-593 CDC I/U/D).  On
vanilla Spark + parquet there is no in-place MERGE, so this repo
re-expresses merge as join-rewrites (operators/merge.py) with an
optional bucket-pruned variant (operators/bucketed_merge.py).  On a
MERGE-capable catalog (Delta Lake, Apache Iceberg) the SAME strategies
collapse to a single ``MERGE INTO`` with file-level skipping — the
documented 100 TB upgrade path (SCALING.md "Known trade-offs" #1).

This module is that seam: a named-backend registry the
materialization layer resolves per model via the ``merge_backend``
config/meta key.  Backends:

- ``rewrite``  (default): full-outer-join rewrite + atomic staging
  swap — works on any Spark catalog, rewrites the whole table.
- ``bucketed``: partition-pruned rewrite of affected key-buckets only
  (requires a ``write_bucketed`` initial load; auto-selected by the
  legacy ``merge_buckets`` opt-in).
- ``merge_into``: emits one ANSI ``MERGE INTO`` statement (the same
  clause structure the reference emits) and hands it to the catalog —
  for Delta/Iceberg tables; raises a clear error on catalogs that
  cannot execute MERGE so misconfiguration fails loudly, not wrongly.

External backends register via :func:`register_merge_backend`.

The contract: every backend, given the same target table + change
batch, leaves the table in an identical logical state (asserted by
tests/test_property_merge.py::TestMergeBackendContract).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..errors import MaterializationError
from .merge import OP_DELETE, OP_INSERT, OP_UPDATE, apply_cdc_merge, merge_upsert


@dataclass
class MergeContext:
    """What a backend may use from the materialization layer: the
    session plus the atomic table-swap primitive (staging write +
    rename) with its layout knobs."""

    spark: SparkSession
    swap_in: Callable[..., None]  # (table, df, partition_by, cluster_by)
    partition_by: list | None = None
    cluster_by: list | None = None


class MergeBackend:
    """Strategy interface: implement both operations and register."""

    name = "abstract"

    def upsert(
        self,
        ctx: MergeContext,
        target_table: str,
        source: DataFrame,
        keys: Sequence[str],
    ) -> dict:
        raise NotImplementedError

    def cdc_merge(
        self,
        ctx: MergeContext,
        target_table: str,
        batch: DataFrame,
        keys: Sequence[str],
        op_col: str,
        ts_col: str | None,
    ) -> dict:
        raise NotImplementedError


class RewriteBackend(MergeBackend):
    """Default: distributed join-rewrite + staging swap (the current,
    catalog-agnostic behavior — byte-identical to the pre-seam code
    path)."""

    name = "rewrite"

    def upsert(self, ctx, target_table, source, keys):
        target = ctx.spark.table(target_table)
        merged = merge_upsert(target, source, keys)
        ctx.swap_in(target_table, merged, ctx.partition_by, ctx.cluster_by)
        return {}

    def cdc_merge(self, ctx, target_table, batch, keys, op_col, ts_col):
        target = ctx.spark.table(target_table)
        merged = apply_cdc_merge(
            target, batch, keys, op_col=op_col, ts_col=ts_col
        )
        ctx.swap_in(target_table, merged, ctx.partition_by, None)
        return {}


class BucketedRewriteBackend(MergeBackend):
    """Partition-pruned rewrite: only buckets containing changed keys
    are rewritten (operators/bucketed_merge.py)."""

    name = "bucketed"

    def upsert(self, ctx, target_table, source, keys):
        from .bucketed_merge import merge_upsert_bucketed

        return merge_upsert_bucketed(ctx.spark, target_table, source, keys)

    def cdc_merge(self, ctx, target_table, batch, keys, op_col, ts_col):
        from .bucketed_merge import cdc_merge_bucketed

        return cdc_merge_bucketed(
            ctx.spark, target_table, batch, keys, op_col=op_col, ts_col=ts_col
        )


class SqlMergeBackend(MergeBackend):
    """Emit one ``MERGE INTO`` statement — the reference's own
    execution model (it compiles merges to SQL and ships them to
    Snowflake, reference materialization.py:358-366, 576-593) — for
    catalogs whose table format supports row-level MERGE
    (Delta/Iceberg).  Statement structure mirrors the reference's
    clause list exactly; Spark's parser accepts it for any v2 table
    with row-level-operation support."""

    name = "merge_into"

    @staticmethod
    def _source_view_name(target_table: str) -> str:
        """Per-invocation unique source-view name.  DAG levels run in
        parallel threads sharing one SparkSession (dependency.py
        ThreadPoolExecutor), so a fixed name would let one model's
        createOrReplaceTempView clobber another's source batch before
        its MERGE executes."""
        import uuid

        safe = "".join(c if c.isalnum() else "_" for c in target_table)
        return f"__merge_source_{safe}_{uuid.uuid4().hex[:12]}"

    @staticmethod
    def upsert_sql(
        target_table: str,
        keys: Sequence[str],
        cols: Sequence[str],
        source_view: str = "__merge_source",
    ) -> str:
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in keys)
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {target_table} t USING {source_view} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    @staticmethod
    def cdc_sql(
        target_table: str,
        keys: Sequence[str],
        cols: Sequence[str],
        op_col: str,
        source_view: str = "__merge_source",
    ) -> str:
        # COALESCE(op,'U') defaulting exactly as the reference emits
        # (reference materialization.py:581); clause order matters:
        # DELETE, then UPDATE, then filtered INSERT.
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        op = f"COALESCE(s.{op_col}, '{OP_UPDATE}')"
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in keys)
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {target_table} t USING {source_view} s ON {on} "
            f"WHEN MATCHED AND {op} = '{OP_DELETE}' THEN DELETE "
            f"WHEN MATCHED AND {op} IN ('{OP_UPDATE}', '{OP_INSERT}') "
            f"THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND {op} != '{OP_DELETE}' "
            f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    def _run(
        self, ctx: MergeContext, sql: str, source: DataFrame, view: str
    ) -> dict:
        source.createOrReplaceTempView(view)
        try:
            ctx.spark.sql(sql)
        except Exception as e:  # parquet tables cannot MERGE — say so
            raise MaterializationError(
                "merge_backend 'merge_into' requires a MERGE-capable "
                "table format (Delta Lake / Apache Iceberg); the "
                f"catalog rejected the statement: {str(e).splitlines()[0]}"
            ) from e
        finally:
            ctx.spark.catalog.dropTempView(view)
        return {"backend_sql": sql}

    def upsert(self, ctx, target_table, source, keys):
        cols = ctx.spark.table(target_table).columns
        view = self._source_view_name(target_table)
        return self._run(
            ctx, self.upsert_sql(target_table, keys, cols, view), source, view
        )

    def cdc_merge(self, ctx, target_table, batch, keys, op_col, ts_col):
        from .merge import dedup_keep_latest

        cols = ctx.spark.table(target_table).columns
        src = batch
        if ts_col and ts_col in src.columns:
            src = dedup_keep_latest(src, keys, [ts_col])
        view = self._source_view_name(target_table)
        return self._run(
            ctx, self.cdc_sql(target_table, keys, cols, op_col, view), src, view
        )


MERGE_BACKENDS: dict[str, MergeBackend] = {}


def register_merge_backend(backend: MergeBackend) -> None:
    MERGE_BACKENDS[backend.name] = backend


for _b in (RewriteBackend(), BucketedRewriteBackend(), SqlMergeBackend()):
    register_merge_backend(_b)


def resolve_merge_backend(name: str) -> MergeBackend:
    try:
        return MERGE_BACKENDS[name]
    except KeyError:
        raise MaterializationError(
            f"unknown merge_backend {name!r}; registered: "
            f"{sorted(MERGE_BACKENDS)}"
        ) from None
