"""SparkSession factory.

The reference keeps a lazy connection *pool* to Snowflake
(reference: src/framework/connection.py:28-318).  In Spark a single
SparkSession is thread-safe and shared, so the pool collapses to this
factory: one session, configured for adaptive execution, Arrow
transfer, and a local warehouse directory.

Scale posture: AQE on (runtime shuffle-partition coalescing + skew-join
splitting), explicit shuffle partitions sized for the target data,
UTC session timezone for reproducible timestamp semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet TIMESTAMP(NANOS) (events.ts) is illegal in vanilla Spark;
    # read as epoch-nanos long and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic decimal semantics for oracle-comparable results.
    "spark.sql.ansi.enabled": "false",
    "spark.ui.enabled": "false",
    # In local mode the driver JVM IS every executor, and Spark's
    # ContextCleaner only reclaims shuffle files / broadcasts /
    # accumulated block metadata when the JVM garbage-collects the
    # owning references — with the default 30min periodic GC, a
    # several-hundred-job session (the bench, the parity sweep)
    # accumulates state until allocation pressure forces collections
    # at the worst time (observed: entries late in the full bench
    # run spiking 10-75x their steady state).  5 minutes bounds the
    # accumulation; on a real cluster executors GC independently and
    # this setting stays harmless.
    "spark.cleaner.periodicGC.interval": "5min",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Embedded Derby metastores throw from getPartitionsByFilter;
    # fall back to client-side partition pruning (real metastores
    # still take the fast server-side path first).
    "spark.sql.hive.metastorePartitionPruningFallbackOnException": "true",
}


def get_spark(
    app_name: str = "data_transformation_python_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict | None = None,
    enable_hive: bool = True,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to the core count —
    on a real cluster set it to ~2-3× total executor cores instead.

    Hive support (Derby metastore next to the warehouse dir) is
    enabled by default so catalog tables persist across CLI
    invocations — the framework equivalent of a warehouse's persistent
    catalog; falls back to the in-memory catalog when Hive classes are
    unavailable.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    def _build(with_hive: bool) -> SparkSession:
        builder = SparkSession.builder.appName(app_name).master(master)
        for k, v in _DEFAULTS.items():
            builder = builder.config(k, v)
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
        # PySpark's 1g default driver heap is wrong for a local[N]
        # "cluster" where the driver JVM IS every executor: a long
        # session accumulates shuffle + block-storage (checkpoint)
        # state across hundreds of jobs and OOMs (observed: the full
        # bench run at N=32 died at stage ~1255 with Java heap space).
        # Effective only at JVM launch — an already-running session
        # keeps its heap (Spark ignores the conf then).
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        if warehouse_dir:
            builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
            derby_home = os.path.dirname(os.path.abspath(warehouse_dir)) or "."
            builder = builder.config(
                "spark.driver.extraJavaOptions",
                f"-Dderby.system.home={derby_home}",
            )
        for k, v in (extra_conf or {}).items():
            builder = builder.config(k, str(v))
        if with_hive:
            builder = builder.enableHiveSupport()
        return builder.getOrCreate()

    try:
        spark = _build(enable_hive)
    except Exception:
        spark = _build(False)
    spark.sparkContext.setLogLevel("WARN")
    # PySpark 4 attaches stderr StreamHandlers to these Python loggers
    # and emits a structured-JSON ERROR line for EVERY captured
    # AnalysisException — including ones this framework raises and
    # catches on purpose (table-exists probes, analyzer lineage on
    # unbuilt tables, validation).  Silence them; real failures still
    # propagate as exceptions.
    import logging

    for _name in ("SQLQueryContextLogger", "DataFrameQueryContextLogger"):
        logging.getLogger(_name).setLevel(logging.CRITICAL + 1)
    return spark
