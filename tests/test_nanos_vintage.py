"""Legacy TIMESTAMP(NANOS) parquet vintage coverage.

Older testdata vintages stored ``events.ts`` as parquet
TIMESTAMP(NANOS), which Spark cannot read natively: a vanilla session
throws PARQUET_TYPE_ILLEGAL unless
``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case the
column surfaces as epoch-nanos BIGINT.  Every events read path in the
engine claims to handle that vintage — these tests synthesize a real
nanos-vintage file and prove each branch is reachable from a session
where the conf was never set (the driver's vanilla session)."""

from __future__ import annotations

import datetime
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

_TS = [
    datetime.datetime(2024, 1, 14, 23, 0, 0),
    datetime.datetime(2024, 1, 15, 12, 0, 0),
    datetime.datetime(2024, 1, 16, 1, 30, 0),
]


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("nanos_vintage")
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp("ns")),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.5, 2.25, 3.0], pa.float64()),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    pq.write_table(table, d / "events.parquet", store_schema=False)
    schema = pq.read_schema(d / "events.parquet")
    assert schema.field("ts").type == pa.timestamp("ns"), "fixture must be nanos"
    return str(d)


@pytest.fixture()
def vanilla_conf(spark):
    """Simulate the driver's vanilla session: the nanos conf unset
    before the test, restored after (the shared session sets it)."""
    had = spark.conf.get(NANOS_CONF, None)
    spark.conf.unset(NANOS_CONF)
    yield spark
    if had is not None:
        spark.conf.set(NANOS_CONF, had)


def test_load_normalizes_nanos_to_ntz(vanilla_conf, nanos_dir):
    from data_transformation_python_spark.queries import load

    df = load(vanilla_conf, nanos_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == _TS


def test_incremental_watermark_bigint_branch(vanilla_conf, nanos_dir):
    """q_incremental_watermark's epoch-nanos branch must be reachable
    without the session conf pre-set (ADVICE r3 item a)."""
    from data_transformation_python_spark.queries import all_queries

    df = all_queries()["q_incremental_watermark"](vanilla_conf, nanos_dir)
    rows = {r["event_id"]: r["ts"] for r in df.collect()}
    # watermark 2024-01-15 00:00:00 keeps events 2 and 3 only
    assert rows == {2: _TS[1], 3: _TS[2]}


def test_events_stream_probe_bigint_branch(vanilla_conf, nanos_dir):
    """_events_stream's schema probe must not throw on the nanos
    vintage, and its LongType branch must yield a TIMESTAMP column
    (ADVICE r3 item b)."""
    from data_transformation_python_spark.queries.streaming_gate import (
        _events_stream,
    )

    stream = _events_stream(vanilla_conf, nanos_dir)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_source_layer_normalizes_nanos(vanilla_conf, nanos_dir):
    """A parquet source with TIMESTAMP(NANOS) columns registers a
    normalizing view, so model SQL like ``CAST(ts AS TIMESTAMP_NTZ)``
    (example_project events_hourly) works on either vintage
    (ADVICE r3 item c)."""
    from types import SimpleNamespace

    from data_transformation_python_spark.config import SourceRegistry
    from data_transformation_python_spark.executor import (
        ModelExecutor,
        SparkExecutor,
    )

    spark = vanilla_conf
    db = f"nanos_{uuid.uuid4().hex[:8]}"
    registry = SourceRegistry(
        {
            "sources": {
                "raw": {
                    "tables": {
                        "events": {
                            "path": f"{nanos_dir}/events.parquet",
                            "format": "parquet",
                        }
                    }
                }
            }
        }
    )
    ex = SparkExecutor(spark, database=db)
    mx = ModelExecutor(ex, None, SimpleNamespace(sources=registry))
    try:
        rel = mx._source_relation("raw", "events")
        out = spark.sql(
            f"SELECT event_id, CAST(ts AS TIMESTAMP_NTZ) AS event_ts FROM {rel}"
        )
        assert dict(out.dtypes)["event_ts"] == "timestamp_ntz"
        got = {r["event_id"]: r["event_ts"] for r in out.collect()}
        assert got == {1: _TS[0], 2: _TS[1], 3: _TS[2]}
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_source_vintage_flip_micros_to_nanos(vanilla_conf, tmp_path):
    """Vintage transition on a REGISTERED source: first registration
    sees TIMESTAMP(MICROS) (plain external table), then the files are
    re-written as TIMESTAMP(NANOS).  The footer fingerprint must
    detect the type-only drift, drop the old object, and re-register
    the nanos layout (raw table + normalizing view) — previously this
    crashed on CREATE VIEW over the leftover table."""
    from types import SimpleNamespace

    from data_transformation_python_spark.config import SourceRegistry
    from data_transformation_python_spark.executor import (
        ModelExecutor,
        SparkExecutor,
    )

    spark = vanilla_conf
    d = tmp_path / "flip"
    d.mkdir()
    micros = pa.table({"event_id": pa.array([1], pa.int64()),
                       "ts": pa.array([_TS[0]], pa.timestamp("us"))})
    pq.write_table(micros, d / "events.parquet")
    registry = SourceRegistry(
        {"sources": {"raw": {"tables": {"events": {
            "path": str(d / "events.parquet"), "format": "parquet"}}}}}
    )
    db = f"flip_{uuid.uuid4().hex[:8]}"
    ex = SparkExecutor(spark, database=db)
    try:
        mx1 = ModelExecutor(ex, None, SimpleNamespace(sources=registry))
        rel = mx1._source_relation("raw", "events")
        assert dict(spark.table(rel).dtypes)["ts"].startswith("timestamp")
        # rewrite the SAME path as nanos vintage
        nanos = pa.table({"event_id": pa.array([1], pa.int64()),
                          "ts": pa.array([_TS[0]], pa.timestamp("ns"))})
        pq.write_table(nanos, d / "events.parquet", store_schema=False)
        mx2 = ModelExecutor(ex, None, SimpleNamespace(sources=registry))
        rel2 = mx2._source_relation("raw", "events")
        out = spark.sql(f"SELECT event_id, ts FROM {rel2}")
        assert dict(out.dtypes)["ts"] == "timestamp_ntz"
        assert out.first()["ts"] == _TS[0]
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_source_path_drift_reregisters(vanilla_conf, tmp_path):
    """PATH drift on a registered source: ${ENV}-substituted source
    paths legitimately move between runs (staged/batched ingest — the
    pipeline_funnel_incremental shape).  The registration fingerprint
    must cover the resolved path, not just the footer schema: with a
    schema-only signature the CREATE TABLE IF NOT EXISTS kept the
    catalog object pointing at the FIRST batch's files and run 2
    silently re-read batch 1."""
    from types import SimpleNamespace

    from data_transformation_python_spark.config import SourceRegistry
    from data_transformation_python_spark.executor import (
        ModelExecutor,
        SparkExecutor,
    )

    spark = vanilla_conf
    d1, d2 = tmp_path / "b1", tmp_path / "b2"
    d1.mkdir(); d2.mkdir()
    for d, ids in ((d1, [1, 2]), (d2, [3])):
        t = pa.table({"doc_id": pa.array(ids, pa.int64())})
        pq.write_table(t, d / "documents.parquet")

    def reg(d):
        return SourceRegistry(
            {"sources": {"raw": {"tables": {"documents": {
                "path": str(d / "documents.parquet"),
                "format": "parquet"}}}}}
        )

    db = f"pathdrift_{uuid.uuid4().hex[:8]}"
    ex = SparkExecutor(spark, database=db)
    try:
        mx1 = ModelExecutor(ex, None, SimpleNamespace(sources=reg(d1)))
        rel1 = mx1._source_relation("raw", "documents")
        assert spark.table(rel1).count() == 2
        # same schema, NEW path (a fresh executor, as a scheduler
        # builds per run) — must re-register, not silently keep batch 1
        mx2 = ModelExecutor(ex, None, SimpleNamespace(sources=reg(d2)))
        rel2 = mx2._source_relation("raw", "documents")
        assert {r["doc_id"] for r in spark.table(rel2).collect()} == {3}
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
