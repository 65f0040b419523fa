"""Connector layer + dialect shim tests."""

from __future__ import annotations

import uuid

import pytest

from data_transformation_python_spark.functions import transpile_snowflake
from data_transformation_python_spark.functions.scalars import (
    UnsupportedDialectFeature,
    rewrite_qualify,
)
from data_transformation_python_spark.sources import read_source, write_sink


def test_roundtrip_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    for fmt in ("parquet", "json", "csv", "orc"):
        p = str(tmp_path / fmt)
        write_sink(df, p, fmt=fmt, as_table=False)
        back = read_source(spark, p, fmt=fmt)
        assert back.count() == 2
        assert {r.v for r in back.collect()} == {"a", "b"}


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", "2024-01-01"), (2, "y", "2024-01-02")],
        "id bigint, v string, day string",
    )
    p = str(tmp_path / "part")
    write_sink(df, p, partition_by=["day"], as_table=False)
    back = read_source(spark, p).filter("day = '2024-01-01'")
    plan = back.queryExecution if hasattr(back, "queryExecution") else None
    assert back.count() == 1
    # partition dirs exist on disk
    assert (tmp_path / "part" / "day=2024-01-01").exists()


def test_bucketed_table_join_without_shuffle(spark, tmp_path):
    db = f"buck_{uuid.uuid4().hex[:6]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        df = spark.range(1000).withColumnRenamed("id", "k")
        write_sink(df, f"{db}.left_t", bucket_by=(4, ["k"]), mode="overwrite")
        write_sink(df, f"{db}.right_t", bucket_by=(4, ["k"]), mode="overwrite")
        # force a non-broadcast join so bucketing is the co-location
        # mechanism under test
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(f"{db}.left_t").join(spark.table(f"{db}.right_t"), "k")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert j.count() == 1000
            assert "Bucketed: true" in plan, plan
            # co-located bucketed join: no shuffle exchange in the plan
            assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_transpile_snowflake_functions():
    assert transpile_snowflake("SELECT IFF(a > 1, 'x', 'y')") == "SELECT IF(a > 1, 'x', 'y')"
    assert transpile_snowflake("SELECT NVL(a, 0)") == "SELECT COALESCE(a, 0)"
    assert (
        transpile_snowflake("SELECT TO_VARCHAR(a) FROM t")
        == "SELECT CAST(a AS STRING) FROM t"
    )
    assert (
        transpile_snowflake("SELECT LISTAGG(name, ',') FROM t")
        == "SELECT ARRAY_JOIN(COLLECT_LIST(name), ',') FROM t"
    )
    assert "CURRENT_TIMESTAMP" in transpile_snowflake("SELECT SYSDATE")


def test_qualify_rewrite_is_valid_spark(spark):
    sql = (
        "SELECT id, v FROM t "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY ts DESC) = 1"
    )
    rewritten = rewrite_qualify(sql)
    assert "QUALIFY" not in rewritten.upper().replace("__QUALIFY_RN", "")
    assert "WHERE __qualify_rn = 1" in rewritten
    # must parse as Spark SQL
    from data_transformation_python_spark.parser import SQLParser

    ok, err = SQLParser.validate_sql(rewritten, spark)
    assert ok, (err, rewritten)


def test_transpile_unsupported_raises():
    with pytest.raises(UnsupportedDialectFeature):
        transpile_snowflake("SELECT * FROM t, LATERAL FLATTEN(input => x)")


# -- profile auth surface parity (reference: config.py:244-266,
#    connection.py:100-166) --------------------------------------------
def test_profile_auth_validation_and_passthrough(tmp_path):
    import pytest as _pytest

    from data_transformation_python_spark.config import load_config
    from data_transformation_python_spark.errors import ConfigError

    def _write(profyaml):
        (tmp_path / "profiles.yml").write_text(profyaml)
        return load_config(tmp_path)

    # local Spark profile: no connection keys → no auth validation
    cfg = _write("environments:\n  dev:\n    database: local\n")
    assert cfg.connection == {}

    # password auth requires password
    with _pytest.raises(ConfigError):
        _write(
            "environments:\n  dev:\n    account: acme\n    user: bob\n"
        )
    # oauth requires token
    with _pytest.raises(ConfigError):
        _write(
            "environments:\n  dev:\n    account: acme\n"
            "    authenticator: oauth\n"
        )
    # private key requires private_key
    with _pytest.raises(ConfigError):
        _write(
            "environments:\n  dev:\n    account: acme\n"
            "    authenticator: snowflake\n"
        )
    # externalbrowser needs nothing further; identity keys become
    # spark conf tags (the QUERY_TAG analogue)
    cfg = _write(
        "environments:\n"
        "  dev:\n"
        "    account: acme\n"
        "    user: bob\n"
        "    role: ANALYST\n"
        "    warehouse: COMPUTE_M\n"
        "    authenticator: externalbrowser\n"
        "    session_parameters:\n"
        "      QUERY_TAG: nightly\n"
        "      spark.sql.shuffle.partitions: '16'\n"
    )
    assert cfg.connection["role"] == "ANALYST"
    assert cfg.spark_conf["spark.dtps.profile.warehouse"] == "COMPUTE_M"
    assert cfg.spark_conf["spark.dtps.session.QUERY_TAG"] == "nightly"
    assert cfg.spark_conf["spark.sql.shuffle.partitions"] == "16"


def test_transpile_snowflake_datetime_and_numeric(spark):
    """New dialect rewrites must not just produce the expected text —
    Spark must actually execute the rewritten SQL."""
    cases = {
        "SELECT DATEADD(day, 3, TIMESTAMP '2024-01-01 00:00:00') AS d":
            "TIMESTAMPADD(",
        "SELECT DATEDIFF(hour, TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-02 00:00:00') AS h": "TIMESTAMPDIFF(",
        "SELECT ZEROIFNULL(CAST(NULL AS INT)) AS z": "COALESCE(",
        "SELECT NULLIFZERO(0) AS n": "NULLIF(",
        "SELECT REGEXP_SUBSTR('ab12cd', '[0-9]+') AS r": "REGEXP_EXTRACT(",
        "SELECT TO_NUMBER('42') AS v": "DECIMAL(38,0)",
    }
    for sql, marker in cases.items():
        rewritten = transpile_snowflake(sql)
        assert marker in rewritten, (sql, rewritten)
        row = spark.sql(rewritten).first()
        assert row is not None
    # spot-check values
    assert spark.sql(transpile_snowflake("SELECT TO_NUMBER('42') AS v")).first()["v"] == 42
    assert (
        spark.sql(
            transpile_snowflake("SELECT REGEXP_SUBSTR('ab12cd', '[0-9]+') AS r")
        ).first()["r"]
        == "12"
    )
    assert (
        spark.sql(
            transpile_snowflake(
                "SELECT DATEDIFF(hour, TIMESTAMP '2024-01-01 00:00:00',"
                " TIMESTAMP '2024-01-02 00:00:00') AS h"
            )
        ).first()["h"]
        == 24
    )
    # Spark's native 2-arg DATEDIFF is untouched
    assert "TIMESTAMPDIFF" not in transpile_snowflake(
        "SELECT DATEDIFF(DATE '2024-01-02', DATE '2024-01-01')"
    )


def test_load_respects_user_shuffle_width(spark):
    """A deliberately-set spark.sql.shuffle.partitions — even the
    value that equals the default — must survive load(); only the
    untouched default is resized."""
    from data_transformation_python_spark.queries import load

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "200")  # explicit user choice
        load(spark, "/root/testdata/sf0.001", "nation").count()
        assert spark.conf.get(key) == "200"
    finally:
        spark.conf.set(key, prev)


def test_transpile_quoted_units_and_paren_args(spark):
    """Snowflake accepts quoted dateparts and nested expressions the
    earlier patterns missed; both must rewrite AND execute."""
    # quoted unit in DATEADD (valid Snowflake; Spark needs it bare)
    sql = transpile_snowflake(
        "SELECT DATEADD('day', 3, TIMESTAMP '2024-01-01 00:00:00') AS d"
    )
    assert "TIMESTAMPADD(day," in sql.replace(" ", "").replace(
        "TIMESTAMPADD(day,", "TIMESTAMPADD(day,"
    ) or "'day'" not in sql
    assert str(spark.sql(sql).first()["d"]).startswith("2024-01-04")
    # quoted unit + one paren level per arg in 3-arg DATEDIFF
    sql = transpile_snowflake(
        "SELECT DATEDIFF('day', CAST('2024-01-01' AS DATE),"
        " CAST('2024-01-05' AS DATE)) AS nd"
    )
    assert "TIMESTAMPDIFF" in sql and "'day'" not in sql
    assert spark.sql(sql).first()["nd"] == 4


def test_transpile_tier2_object_try_timezone(spark):
    """OBJECT_CONSTRUCT / TRY_TO_NUMBER / 2-arg CONVERT_TIMEZONE —
    rewritten and executed on Spark."""
    sql = transpile_snowflake(
        "SELECT OBJECT_CONSTRUCT('a', 1, 'b', UPPER('x')) AS obj"
    )
    assert "TO_JSON(NAMED_STRUCT(" in sql
    assert spark.sql(sql).first()["obj"] == '{"a":1,"b":"X"}'

    sql = transpile_snowflake("SELECT TRY_TO_NUMBER('42') AS v")
    assert "TRY_CAST" in sql
    assert spark.sql(sql).first()["v"] == 42
    assert (
        spark.sql(transpile_snowflake("SELECT TRY_TO_NUMBER('oops') AS v")).first()["v"]
        is None
    )
    sql = transpile_snowflake("SELECT TO_NUMBER('3.25', 10, 2) AS v")
    assert "DECIMAL(10,2)" in sql
    assert float(spark.sql(sql).first()["v"]) == 3.25

    # 2-arg CONVERT_TIMEZONE fills in the session zone as source; the
    # 3-arg form matches Spark's signature and passes through
    sql = transpile_snowflake(
        "SELECT CONVERT_TIMEZONE('UTC',"
        " TIMESTAMP '2024-01-01 00:00:00') AS t"
    )
    assert "current_timezone()" in sql
    assert spark.sql(sql).first()["t"] is not None
    sql3 = transpile_snowflake(
        "SELECT CONVERT_TIMEZONE('UTC', 'America/New_York',"
        " TIMESTAMP '2024-01-01 00:00:00') AS t"
    )
    assert "current_timezone()" not in sql3
    assert str(spark.sql(sql3).first()["t"]).startswith("2023-12-31 19:00")


def test_write_sink_target_rows_per_file(spark, tmp_path):
    """target_rows_per_file must bound every physical file
    (maxRecordsPerFile rolls to a new file at the cap) — the shard
    sizing control for training dataloaders."""
    from data_transformation_python_spark.sources.io import write_sink

    out = str(tmp_path / "sharded")
    write_sink(
        spark.range(1000).coalesce(2),
        out,
        num_files=None,
        target_rows_per_file=100,
        as_table=False,
    )
    back = spark.read.parquet(out)
    assert back.count() == 1000
    from pyspark.sql import functions as F

    per_file = (
        back.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .count()
        .collect()
    )
    assert len(per_file) >= 10
    assert max(r["count"] for r in per_file) <= 100


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The write_sink bucketing knob must actually buy the co-located
    join: two tables bucketed+sorted on the key join with NO Exchange
    on either side (broadcast disabled to force the sort-merge path)."""
    import uuid as _uuid

    from data_transformation_python_spark.sources.io import write_sink

    db = f"bkt_{_uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        left = spark.range(1000).selectExpr("id AS k", "id * 2 AS a")
        right = spark.range(1000).selectExpr("id AS k", "id * 3 AS b")
        write_sink(left, f"{db}.bkt_left", bucket_by=(8, ["k"]))
        write_sink(right, f"{db}.bkt_right", bucket_by=(8, ["k"]))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(f"{db}.bkt_left").join(
            spark.table(f"{db}.bkt_right"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_volume_anomaly_seeds_then_flags_explosion(spark, tmp_path):
    import uuid

    from data_transformation_python_spark.state import create_state_manager
    from data_transformation_python_spark.testing import AnomalyTests

    state = create_state_manager(tmp_path / "state", "dev")
    at = AnomalyTests(spark, state)
    name = f"vol_{uuid.uuid4().hex[:8]}"
    spark.range(100).createOrReplaceTempView(name)
    r1 = at.volume_anomaly("m", name)
    assert r1.passed  # no history yet: vacuous pass, seeds history
    r2 = at.volume_anomaly("m", name)
    assert r2.passed  # same volume
    spark.range(1000).createOrReplaceTempView(name)
    spark.catalog.dropTempView(name)
    spark.range(1000).createOrReplaceTempView(name)
    r3 = at.volume_anomaly("m", name)
    assert not r3.passed  # 10x explosion vs trailing mean
    assert r3.rows_failed > 0


def test_freshness_with_injected_clock(spark, tmp_path):
    from data_transformation_python_spark.state import create_state_manager
    from data_transformation_python_spark.testing import AnomalyTests

    at = AnomalyTests(spark, create_state_manager(tmp_path / "state", "dev"))
    spark.sql(
        "SELECT TIMESTAMP '2024-01-10 00:00:00' AS ts"
    ).createOrReplaceTempView("fresh_t")
    ok = at.freshness("m", "fresh_t", "ts", 48, as_of="2024-01-11 00:00:00")
    assert ok.passed
    stale = at.freshness("m", "fresh_t", "ts", 12, as_of="2024-01-11 00:00:00")
    assert not stale.passed and stale.rows_failed == 1


def test_declarative_volume_anomaly_and_freshness_via_runner(spark, tmp_path):
    import uuid

    from data_transformation_python_spark.state import create_state_manager
    from data_transformation_python_spark.testing import TestRunner

    class _Ex:  # minimal executor facade
        def __init__(self, s):
            self.spark = s

    state = create_state_manager(tmp_path / "state", "dev")
    runner = TestRunner(_Ex(spark), state=state)
    name = f"decl_{uuid.uuid4().hex[:8]}"
    spark.sql(
        "SELECT TIMESTAMP '2024-01-10 00:00:00' AS ts"
    ).createOrReplaceTempView(name)
    r = runner._run_one("m", name, None, "volume_anomaly")
    assert r.passed
    r2 = runner._run_one(
        "m", name, "ts",
        {"freshness": {"max_lag_hours": 12, "as_of": "2024-01-11 00:00:00"}},
    )
    assert not r2.passed
    # missing state -> clear declarative error, not a crash
    r3 = TestRunner(_Ex(spark))._run_one("m", name, None, "volume_anomaly")
    assert not r3.passed and "state manager" in (r3.error or "")
