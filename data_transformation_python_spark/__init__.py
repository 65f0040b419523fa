"""data_transformation_python_spark — a PySpark-native data
transformation engine.

A ground-up PySpark re-expression of the capabilities of the reference
framework ``s685/data-transformation-python`` (a dbt/SQLMesh-style SQL
transformation orchestrator for Snowflake): SQL model files with Jinja
templating, dependency DAG, materialization strategies (view / table /
temp / incremental / CDC merge / CDC retirement), state + plan diffing,
data-quality tests, column lineage and CLI — with Spark SQL + the Spark
catalog as the execution engine instead of a remote warehouse, plus
first-class large-scale data-pipeline operators (deduplication,
similarity search, text analysis, multimodal columns) designed for
100 TB-scale clusters.

Everything here is built on the public Apache Spark / PySpark API.
"""

__version__ = "0.1.0"
