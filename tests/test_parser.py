"""Parser unit tests — ports of the reference's test intent
(reference: tests/test_parser.py) plus the fixed gaps (two-pass
is_incremental, this() resolution)."""

from __future__ import annotations

import textwrap

from data_transformation_python_spark.parser import SQLParser
from data_transformation_python_spark.sqlvars import extract_variables

SAMPLE = textwrap.dedent(
    """\
    -- config: materialized=incremental, incremental_strategy=time, time_column=ts
    -- depends_on: upstream_a, upstream_b
    -- meta:
    --   owner: data-team
    --   cdc:
    --     change_type_column: op
    SELECT *
    FROM {{ ref('stg_orders') }}
    JOIN {{ source('raw', 'customers') }} USING (customer_id)
    WHERE ts > $start_date AND region = $region
    {% if is_incremental() %}
      AND ts > (SELECT MAX(ts) FROM {{ this() }})
    {% endif %}
    """
)


def _write(tmp_path, name, content):
    p = tmp_path / f"{name}.sql"
    p.write_text(content)
    return p


def test_config_extraction(tmp_path):
    parsed = SQLParser(tmp_path).parse_file(_write(tmp_path, "m1", SAMPLE))
    assert parsed.config == {
        "materialized": "incremental",
        "incremental_strategy": "time",
        "time_column": "ts",
    }


def test_meta_yaml_extraction(tmp_path):
    parsed = SQLParser(tmp_path).parse_file(_write(tmp_path, "m1", SAMPLE))
    assert parsed.meta["owner"] == "data-team"
    assert parsed.meta["cdc"]["change_type_column"] == "op"


def test_dependencies_from_comments_and_refs(tmp_path):
    parsed = SQLParser(tmp_path).parse_file(_write(tmp_path, "m1", SAMPLE))
    assert parsed.dependencies == {"upstream_a", "upstream_b", "stg_orders"}
    assert parsed.source_deps == {"raw.customers"}


def test_variable_extraction(tmp_path):
    parsed = SQLParser(tmp_path).parse_file(_write(tmp_path, "m1", SAMPLE))
    assert parsed.variables == {"start_date", "region"}
    assert extract_variables("a $x b $x c $y") == {"x", "y"}


def test_placeholders_rendered(tmp_path):
    parsed = SQLParser(tmp_path).parse_file(_write(tmp_path, "m1", SAMPLE))
    assert "__REF_stg_orders__" in parsed.rendered_sql
    assert "__SOURCE_raw_customers__" in parsed.rendered_sql
    # parse pass renders is_incremental() == False → no __THIS__ branch
    assert "__THIS__" not in parsed.rendered_sql


def test_two_pass_is_incremental(tmp_path):
    parser = SQLParser(tmp_path)
    parsed = parser.parse_file(_write(tmp_path, "m1", SAMPLE))
    assert parsed.uses_is_incremental
    second = parser.render(parsed.raw_sql, is_incremental=True)
    assert "__THIS__" in second  # incremental branch now included


VAR_SAMPLE = textwrap.dedent(
    """\
    -- config: materialized=table
    {% if var('tokenizer', 'unigram') == 'bpe' %}
    SELECT 'bpe' AS family FROM {{ ref('up') }}
    {% else %}
    SELECT 'unigram' AS family FROM {{ ref('up') }}
    {% endif %}
    """
)


def test_var_conditional_body(tmp_path):
    """Config-driven model bodies (round 14): ``var()`` resolves the
    declared default at parse time and the real profile/CLI value at
    render time, so one model file can carry both tokenizer-family
    branches."""
    parser = SQLParser(tmp_path)
    parsed = parser.parse_file(_write(tmp_path, "m2", VAR_SAMPLE))
    assert parsed.uses_var
    # parse pass: the declared default picks the branch; deps come
    # from RAW text, so both branches' refs register either way
    assert "'unigram'" in parsed.rendered_sql
    assert "'bpe'" not in parsed.rendered_sql
    assert parsed.dependencies == {"up"}
    # execution pass with real vars flips the branch
    flipped = parser.render(parsed.raw_sql, variables={"tokenizer": "bpe"})
    assert "'bpe'" in flipped and "'unigram'" not in flipped
    # absent key falls back to the declared default
    same = parser.render(parsed.raw_sql, variables={"other": 1})
    assert "'unigram'" in same


def test_var_detection_ignores_sql_var_functions(tmp_path):
    """``var_samp()`` in plain SQL must not flag the model as
    var-driven (the flag triggers a per-execution re-render)."""
    parsed = SQLParser(tmp_path).parse_file(
        _write(tmp_path, "m3", "SELECT var_samp(x) FROM {{ ref('a') }}")
    )
    assert not parsed.uses_var


def test_parse_directory_and_cache(tmp_path):
    _write(tmp_path, "a", "SELECT 1 AS x")
    sub = tmp_path / "gold"
    sub.mkdir()
    _write(sub, "b", "-- depends_on: a\nSELECT * FROM {{ ref('a') }}")
    parser = SQLParser(tmp_path)
    models = parser.parse_directory()
    assert set(models) == {"a", "b"}
    assert models["b"].dependencies == {"a"}
    # cache: same hash object identity
    again = parser.parse_file(sub / "b.sql")
    assert again is models["b"]


def test_macros_render(tmp_path):
    sql = "{{ silver_clean('t', dedupe_key='id') }}"
    parsed = SQLParser(tmp_path).parse_file(_write(tmp_path, "m", sql))
    assert "ROW_NUMBER()" in parsed.rendered_sql
    assert "__rn = 1" in parsed.rendered_sql
    sql2 = "{{ gold_aggregate('t', ['a'], {'total': 'SUM(x)'}) }}"
    parsed2 = SQLParser(tmp_path).parse_file(_write(tmp_path, "m2", sql2))
    assert "SUM(x) AS total" in parsed2.rendered_sql
    assert "GROUP BY a" in parsed2.rendered_sql


def test_validate_sql_with_spark(tmp_path, spark):
    parser = SQLParser(tmp_path)
    ok, err = parser.validate_sql("SELECT 1 AS x", spark)
    assert ok and err is None
    ok, err = parser.validate_sql("SELEC 1", spark)
    assert not ok and err
    # the silver_clean macro output must be valid Spark SQL
    from data_transformation_python_spark.macros import silver_clean

    ok, err = parser.validate_sql(silver_clean("t", dedupe_key="id"), spark)
    assert ok, err
