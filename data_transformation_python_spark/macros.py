"""Jinja SQL macros — CDC + layer codegen, emitted in Spark SQL
dialect.

Same macro surface as the reference (reference: src/framework/
macros.py:12-216): ``cdc_merge``, ``cdc_columns``, ``cdc_filter``,
``bronze_load``, ``silver_clean``, ``gold_aggregate`` — with two
dialect adaptations:

- ``silver_clean``'s dedup uses the subquery + ``WHERE __rn = 1``
  rewrite because open-source Spark SQL has no ``QUALIFY``
  (SURVEY.md §4: the QUALIFY rewrite is a framework-layer transform).
- ``cdc_columns`` emits Spark types (STRING / TIMESTAMP_NTZ) instead
  of VARCHAR(1) / Snowflake TIMESTAMP_NTZ defaults.
"""

from __future__ import annotations

from jinja2 import Environment


def cdc_merge(
    target_table: str,
    source_table: str,
    unique_key: str,
    change_type_column: str = "__CDC_OPERATION",
    timestamp_column: str = "__CDC_TIMESTAMP",
) -> str:
    """MERGE with I/U/D semantics (reference: macros.py:18-53).  The
    emitted statement runs on MERGE-capable catalogs (Delta/Iceberg);
    the parquet-warehouse path uses operators.merge.apply_cdc_merge
    with identical clause semantics."""
    return f"""
MERGE INTO {target_table} target
USING (
    SELECT *,
           COALESCE({change_type_column}, 'U') AS __op,
           CURRENT_TIMESTAMP() AS {timestamp_column}
    FROM {source_table}
) source
ON target.{unique_key} = source.{unique_key}
WHEN MATCHED AND source.__op = 'D' THEN DELETE
WHEN MATCHED AND source.__op IN ('U', 'I') THEN UPDATE SET *
WHEN NOT MATCHED AND source.__op != 'D' THEN INSERT *
"""


def cdc_columns(
    change_type_column: str = "__CDC_OPERATION",
    timestamp_column: str = "__CDC_TIMESTAMP",
) -> str:
    """CDC metadata column DDL fragment (reference: macros.py:56-73)."""
    return f"""
{change_type_column} STRING,
{timestamp_column} TIMESTAMP_NTZ
"""


def cdc_filter(
    change_type_column: str = "__CDC_OPERATION", operations: list | None = None
) -> str:
    """WHERE fragment selecting CDC operations (reference:
    macros.py:76-94)."""
    ops = operations if operations is not None else ["I", "U", "D"]
    ops_str = "', '".join(ops)
    return f"{change_type_column} IN ('{ops_str}')"


def bronze_load(
    source_table: str,
    filter_condition: str | None = None,
    columns: list | None = None,
) -> str:
    """Bronze-layer load SELECT with load metadata (reference:
    macros.py:101-129)."""
    cols = "*" if not columns else ", ".join(columns)
    where = f"WHERE {filter_condition}" if filter_condition else ""
    return f"""
SELECT
    {cols},
    CURRENT_TIMESTAMP() AS load_timestamp,
    'bronze' AS layer
FROM {source_table}
{where}
"""


def silver_clean(
    source_table: str,
    dedupe_key: str | None = None,
    filter_condition: str | None = None,
    order_column: str = "load_timestamp",
) -> str:
    """Silver-layer cleaning SELECT with keep-latest dedup (reference:
    macros.py:132-164).  Spark rewrite of QUALIFY: window in a
    subquery, outer WHERE __rn = 1."""
    where = f"WHERE {filter_condition}" if filter_condition else ""
    if not dedupe_key:
        return f"""
SELECT * FROM {source_table}
{where}
"""
    return f"""
SELECT * EXCEPT (__rn) FROM (
    SELECT *,
           ROW_NUMBER() OVER (
               PARTITION BY {dedupe_key}
               ORDER BY {order_column} DESC
           ) AS __rn
    FROM {source_table}
    {where}
) WHERE __rn = 1
"""


def gold_aggregate(
    source_table: str,
    group_by_columns: list,
    aggregate_columns: dict,
) -> str:
    """Gold-layer aggregation codegen from {alias: expression}
    (reference: macros.py:167-196)."""
    group_by = ", ".join(group_by_columns)
    aggregates = ", ".join(
        f"{expr} AS {alias}" for alias, expr in aggregate_columns.items()
    )
    return f"""
SELECT
    {group_by},
    {aggregates}
FROM {source_table}
GROUP BY {group_by}
"""


def exact_dedup(
    source_table: str,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> str:
    """Exact-dedup codegen (beyond the reference — bridges the
    LLM-pipeline dedup family into model SQL): keep the minimum-id
    row per content hash.  Emitted as an aggregate + self-join on the
    keeper ids (no ``SELECT * EXCEPT`` dependence, no window over the
    full row set); Catalyst turns the keeper side into a
    broadcast/shuffled semi-structure sized by DISTINCT contents."""
    return f"""
SELECT s.*
FROM {source_table} s
JOIN (
    SELECT MIN({id_column}) AS __keep_id
    FROM {source_table}
    GROUP BY md5({text_column})
) k ON s.{id_column} = k.__keep_id
"""


def simhash_signatures(
    source_table: str,
    id_column: str = "doc_id",
    text_column: str = "text",
    bits: int = 16,
) -> str:
    """SimHash signature codegen over a model/source table — the SQL
    twin of operators/dedup.simhash_sql, usable directly inside a
    model body for near-dup candidate tables."""
    from .operators.dedup import simhash_sql

    return simhash_sql(
        f"SELECT {id_column} AS doc_id, {text_column} AS text"
        f" FROM {source_table}",
        bits=bits,
        dialect="spark",
    )


def register_macros(jinja_env: Environment) -> None:
    """Install macros as Jinja globals (reference: macros.py:199-216;
    ``exact_dedup``/``simhash_signatures`` are beyond-reference)."""
    jinja_env.globals.update(
        cdc_merge=cdc_merge,
        cdc_columns=cdc_columns,
        cdc_filter=cdc_filter,
        bronze_load=bronze_load,
        silver_clean=silver_clean,
        gold_aggregate=gold_aggregate,
        exact_dedup=exact_dedup,
        simhash_signatures=simhash_signatures,
    )
