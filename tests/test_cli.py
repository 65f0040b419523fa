"""CLI verb tests over a tmp copy of the example project (read-only
verbs + dry-run; execution verbs are covered by the e2e suite)."""

from __future__ import annotations

import json
import shutil

import pytest
from click.testing import CliRunner

from data_transformation_python_spark.cli import _parse_vars, cli

EXAMPLE = "/root/repo/example_project"


@pytest.fixture()
def proj(tmp_path):
    dst = tmp_path / "proj"
    shutil.copytree(EXAMPLE, dst)
    return str(dst)


def test_parse_vars():
    assert _parse_vars("a=1,b=2.5,c=x,d=-3") == {"a": 1, "b": 2.5, "c": "x", "d": -3}
    assert _parse_vars(None) == {}


def test_cli_list(proj):
    r = CliRunner().invoke(cli, ["--project-dir", proj, "list"])
    assert r.exit_code == 0, r.output
    assert "silver_orders" in r.output
    assert "materialized=incremental" in r.output


def test_cli_deps(proj):
    r = CliRunner().invoke(cli, ["--project-dir", proj, "deps", "gold_daily_revenue"])
    assert r.exit_code == 0, r.output
    out = json.loads(r.output)
    assert set(out["dependencies"]) == {"silver_orders", "bronze_orders"}


def test_cli_deps_topo(proj):
    r = CliRunner().invoke(cli, ["--project-dir", proj, "deps"])
    levels = json.loads(r.output)
    flat = [m for lv in levels for m in lv]
    assert flat.index("bronze_orders") < flat.index("silver_orders") < flat.index(
        "gold_daily_revenue"
    )


def test_cli_plan_fresh_project_creates_all(proj):
    r = CliRunner().invoke(cli, ["--project-dir", proj, "plan"])
    assert r.exit_code == 0, r.output
    out = json.loads(r.output)
    assert out["summary"]["create"] == 7
    assert out["summary"]["no_change"] == 0


def test_cli_lineage(proj):
    r = CliRunner().invoke(cli, ["--project-dir", proj, "lineage", "silver_orders"])
    assert r.exit_code == 0, r.output
    out = json.loads(r.output)
    cols = {c["column"] for c in out["silver_orders"]}
    assert "amount" in cols and "status" in cols


def test_cli_explain_shows_physical_plan(proj):
    r = CliRunner().invoke(
        cli, ["--project-dir", proj, "explain", "bronze_orders"]
    )
    assert r.exit_code == 0, r.output
    assert "Physical Plan" in r.output or "Scan" in r.output


@pytest.mark.parametrize("mode", ["simple", "extended", "formatted", "cost"])
def test_cli_explain_every_mode_parses(proj, mode):
    # 'simple' is not an EXPLAIN keyword in Spark SQL — it must map to
    # bare EXPLAIN, and all four advertised choices must succeed.
    r = CliRunner().invoke(
        cli, ["--project-dir", proj, "explain", "bronze_orders", "--mode", mode]
    )
    assert r.exit_code == 0, r.output
    assert "Plan" in r.output or "Scan" in r.output


def test_cli_run_all_downstream_selector(proj):
    # build everything once; the downstream selector then models the
    # real usage — rebuild the consumers of a changed model (dbt
    # semantics: other parents are assumed already built)
    r0 = CliRunner().invoke(cli, ["--project-dir", proj, "run-all"])
    assert r0.exit_code == 0, r0.output
    r = CliRunner().invoke(
        cli,
        ["--project-dir", proj, "run-all", "--select", "silver_orders+"],
    )
    assert r.exit_code == 0, r.output
    out = json.loads(r.output)
    ran = {x["model"] for x in out["results"]}
    # downstream closure of silver_orders — not bronze, not events
    assert "silver_orders" in ran
    assert "gold_daily_revenue" in ran and "gold_customer_totals" in ran
    assert "gold_orders_clustered" in ran
    assert "bronze_orders" not in ran and "events_hourly" not in ran


def test_cli_compact_reclusters_table(proj):
    r0 = CliRunner().invoke(cli, ["--project-dir", proj, "run-all"])
    assert r0.exit_code == 0, r0.output
    r = CliRunner().invoke(
        cli,
        ["--project-dir", proj, "compact", "gold_orders_clustered",
         "--cluster-by", "order_date", "--cluster-files", "2"],
    )
    assert r.exit_code == 0, r.output
    out = json.loads(r.output.strip().splitlines()[-1])
    assert out["files_after"] == 2
    assert out["files_before"] >= out["files_after"]


def test_cli_compact_sized_mode_registered():
    r = CliRunner().invoke(cli, ["compact", "--help"])
    assert r.exit_code == 0
    assert "--target-file-mb" in r.output and "--cluster-by" in r.output
