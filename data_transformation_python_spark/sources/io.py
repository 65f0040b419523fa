"""Format-agnostic read/write connectors.

The reference's only connector is the Snowflake Python driver
(reference: src/framework/connection.py:13-15); here the connector
surface is the Spark DataSource API: parquet / csv / json / orc /
text / jdbc, batch or streaming, with layout controls (partitioning,
bucketing, compaction target file size) that stand in for warehouse
clustering (reference CLUSTER BY — SURVEY §2.7/§4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_READ_DEFAULTS: dict[str, dict] = {
    "csv": {"header": "true", "inferSchema": "true"},
    "json": {},
    "parquet": {},
    "orc": {},
    "text": {},
}


def read_source(
    spark: SparkSession,
    path_or_table: str,
    fmt: str = "parquet",
    schema=None,
    options: dict | None = None,
    streaming: bool = False,
) -> DataFrame:
    """Read a table name (catalog) or a path (file source)."""
    if fmt == "table":
        return spark.table(path_or_table)
    opts = {**_READ_DEFAULTS.get(fmt, {}), **(options or {})}
    if streaming:
        reader = spark.readStream.format(fmt)
        if schema is None:
            raise ValueError("streaming file sources require an explicit schema")
    else:
        reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load(path_or_table)


def write_sink(
    df: DataFrame,
    path_or_table: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    num_files: int | None = None,
    target_rows_per_file: int | None = None,
    options: dict | None = None,
    as_table: bool | None = None,
) -> None:
    """Write a DataFrame to a path or catalog table.

    Scale knobs:
    - ``partition_by``: directory partitioning → partition pruning on
      read (the Spark answer to warehouse clustering keys).
    - ``bucket_by``: (num_buckets, cols) hash bucketing → co-located,
      shuffle-free joins on the bucket key (catalog tables only).
    - ``num_files``: explicit output-file count so files are neither
      tiny (metadata pressure) nor huge (skewed tasks); with AQE on,
      omitting it lets coalescePartitions pick sensible sizes.
    - ``target_rows_per_file``: cap rows per physical file
      (``maxRecordsPerFile``) — the shard-size control for training
      dataloaders; unlike ``num_files`` it bounds each file even when
      partitions are skewed, rolling to a new file at the cap.
    """
    if num_files:
        df = df.repartition(num_files, *partition_by) if partition_by else df.coalesce(num_files)
    writer = df.write.format(fmt).mode(mode)
    if target_rows_per_file:
        writer = writer.option("maxRecordsPerFile", str(target_rows_per_file))
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if as_table is None:
        as_table = "/" not in path_or_table
    if bucket_by:
        n, cols = bucket_by
        if not as_table:
            raise ValueError("bucketBy requires a catalog table sink")
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    if as_table:
        writer.saveAsTable(path_or_table)
    else:
        writer.save(path_or_table)
