"""Golden-string tests for the ``merge_into`` backend's emitted SQL.

The Delta/Iceberg execution path (merge_backend.SqlMergeBackend._run)
cannot run in this environment — no MERGE-capable catalog is baked in
— so the emitted ``MERGE INTO`` text is the only verifiable surface.
These tests pin it exactly: clause order (DELETE → UPDATE → filtered
INSERT), the COALESCE(op, 'U') default, and the multi-key ON chain,
mirroring the reference's Snowflake emission (reference
src/framework/materialization.py:358-366 keyed upsert, :576-593 CDC
merge — which uses ``UPDATE SET *`` / ``INSERT *``; Spark's v2 MERGE
accepts star forms only on some catalogs, so this repo expands
explicit column lists with identical semantics).
"""

from data_transformation_python_spark.operators.merge_backend import (
    MERGE_BACKENDS,
    SqlMergeBackend,
    resolve_merge_backend,
)


class TestUpsertSqlGolden:
    def test_single_key(self):
        sql = SqlMergeBackend.upsert_sql(
            "analytics.dim_customer",
            ["customer_id"],
            ["customer_id", "name", "segment"],
        )
        assert sql == (
            "MERGE INTO analytics.dim_customer t "
            "USING __merge_source s "
            "ON t.customer_id = s.customer_id "
            "WHEN MATCHED THEN UPDATE SET t.name = s.name, "
            "t.segment = s.segment "
            "WHEN NOT MATCHED THEN INSERT "
            "(customer_id, name, segment) "
            "VALUES (s.customer_id, s.name, s.segment)"
        )

    def test_composite_key_and_view_name(self):
        sql = SqlMergeBackend.upsert_sql(
            "t1", ["k1", "k2"], ["k1", "k2", "v"], source_view="src_v"
        )
        assert sql == (
            "MERGE INTO t1 t USING src_v s "
            "ON t.k1 = s.k1 AND t.k2 = s.k2 "
            "WHEN MATCHED THEN UPDATE SET t.v = s.v "
            "WHEN NOT MATCHED THEN INSERT (k1, k2, v) "
            "VALUES (s.k1, s.k2, s.v)"
        )

    def test_keys_never_updated(self):
        # UPDATE SET must not touch join keys (Spark rejects it and the
        # reference's SET * on Snowflake overwrites equal values only)
        sql = SqlMergeBackend.upsert_sql("t", ["id"], ["id", "a", "b"])
        update = sql.split("UPDATE SET ")[1].split(" WHEN NOT")[0]
        assert "t.id" not in update
        assert update == "t.a = s.a, t.b = s.b"


class TestCdcSqlGolden:
    def test_full_statement(self):
        sql = SqlMergeBackend.cdc_sql(
            "analytics.orders_current",
            ["order_id"],
            ["order_id", "status", "amount"],
            op_col="_op",
        )
        assert sql == (
            "MERGE INTO analytics.orders_current t "
            "USING __merge_source s "
            "ON t.order_id = s.order_id "
            "WHEN MATCHED AND COALESCE(s._op, 'U') = 'D' THEN DELETE "
            "WHEN MATCHED AND COALESCE(s._op, 'U') IN ('U', 'I') "
            "THEN UPDATE SET t.status = s.status, t.amount = s.amount "
            "WHEN NOT MATCHED AND COALESCE(s._op, 'U') != 'D' "
            "THEN INSERT (order_id, status, amount) "
            "VALUES (s.order_id, s.status, s.amount)"
        )

    def test_clause_order_delete_update_insert(self):
        # reference materialization.py:586-591 — DELETE must precede
        # UPDATE (first-matching-clause wins in ANSI MERGE), and the
        # INSERT branch must filter out op='D' rows
        sql = SqlMergeBackend.cdc_sql("t", ["id"], ["id", "v"], op_col="op")
        i_del = sql.index("THEN DELETE")
        i_upd = sql.index("THEN UPDATE")
        i_ins = sql.index("THEN INSERT")
        assert i_del < i_upd < i_ins
        assert "WHEN NOT MATCHED AND COALESCE(s.op, 'U') != 'D'" in sql

    def test_coalesce_default_is_update(self):
        # COALESCE(op, 'U'): rows with NULL op are updates, exactly as
        # the reference emits (materialization.py:581)
        sql = SqlMergeBackend.cdc_sql("t", ["id"], ["id", "v"], op_col="op")
        assert sql.count("COALESCE(s.op, 'U')") == 3

    def test_composite_key(self):
        sql = SqlMergeBackend.cdc_sql(
            "t", ["a", "b"], ["a", "b", "v"], op_col="op"
        )
        assert "ON t.a = s.a AND t.b = s.b " in sql


class TestViewNameAndRegistry:
    def test_source_view_unique_per_invocation(self):
        n1 = SqlMergeBackend._source_view_name("db.tbl")
        n2 = SqlMergeBackend._source_view_name("db.tbl")
        assert n1 != n2  # parallel DAG levels must not clobber batches
        assert n1.startswith("__merge_source_db_tbl_")
        assert n1.replace("_", "").isalnum()

    def test_registry_has_all_three(self):
        assert {"rewrite", "bucketed", "merge_into"} <= set(MERGE_BACKENDS)
        assert resolve_merge_backend("merge_into").name == "merge_into"
