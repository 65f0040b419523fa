"""State manager + plan generation tests (reference:
tests/test_state.py intent + plan.py:94-226 classification matrix)."""

from __future__ import annotations

from data_transformation_python_spark.dependency import DependencyGraph
from data_transformation_python_spark.parser import ParsedSQL
from data_transformation_python_spark.plans import ChangeType, PlanGenerator
from data_transformation_python_spark.plans.plan import config_hash
from data_transformation_python_spark.state import StateManager


def _parsed(name, file_hash="h1", config=None, deps=None):
    return ParsedSQL(
        name=name,
        path=None,
        raw_sql="",
        rendered_sql="",
        config=config or {},
        dependencies=deps or set(),
        file_hash=file_hash,
    )


def test_state_roundtrip(tmp_path):
    sm = StateManager(tmp_path, "dev")
    sm.update_model_state("m1", file_hash="abc", config_hash="c1", dependencies=["a"])
    sm.save()

    sm2 = StateManager(tmp_path, "dev")
    st = sm2.get("m1")
    assert st.file_hash == "abc"
    assert st.run_count == 1
    assert st.success_count == 1
    assert st.dependencies == ["a"]


def test_state_has_changed(tmp_path):
    sm = StateManager(tmp_path, "dev")
    assert sm.has_changed("new_model", "h")  # unknown model → changed
    sm.update_model_state("m", file_hash="h", config_hash="c")
    assert not sm.has_changed("m", "h", "c")
    assert sm.has_changed("m", "h2", "c")
    assert sm.has_changed("m", "h", "c2")
    assert sm.has_changed("m", "h", "c", dependencies=["x"])


def test_state_failure_counter(tmp_path):
    sm = StateManager(tmp_path, "dev")
    sm.update_model_state("m", file_hash="h", success=False)
    assert sm.get("m").failure_count == 1
    assert sm.get("m").last_status == "failed"


def test_incremental_watermark_state(tmp_path):
    sm = StateManager(tmp_path, "dev")
    assert sm.get_incremental_state("m", "last_processed_time") is None
    sm.set_incremental_state("m", "last_processed_time", "2024-01-15 00:00:00")
    sm.save()
    sm2 = StateManager(tmp_path, "dev")
    assert sm2.get_incremental_state("m", "last_processed_time") == "2024-01-15 00:00:00"


def test_plan_classification(tmp_path):
    sm = StateManager(tmp_path, "dev")
    g = DependencyGraph()
    for n in ("unchanged", "changed", "gone"):
        g.add_model(n)
    g.add_model("newmodel")

    sm.update_model_state("unchanged", file_hash="h1", config_hash=config_hash({}))
    sm.update_model_state("changed", file_hash="old", config_hash=config_hash({}))
    sm.update_model_state("gone", file_hash="h")

    parsed = {
        "unchanged": _parsed("unchanged", "h1"),
        "changed": _parsed("changed", "h2"),
        "newmodel": _parsed("newmodel", "h3"),
    }
    plan = PlanGenerator(sm, g).generate_plan(parsed)
    assert plan.models["unchanged"].change_type is ChangeType.NO_CHANGE
    assert plan.models["changed"].change_type is ChangeType.UPDATE
    assert plan.models["newmodel"].change_type is ChangeType.CREATE
    assert plan.models["gone"].change_type is ChangeType.DELETE
    assert set(plan.changed()) == {"changed", "newmodel"}
    assert plan.summary()["update"] == 1


def test_plan_targets_expand_dependencies(tmp_path):
    sm = StateManager(tmp_path, "dev")
    g = DependencyGraph()
    g.add_model("base")
    g.add_model("mart", {"base"})
    parsed = {"base": _parsed("base"), "mart": _parsed("mart", deps={"base"})}
    plan = PlanGenerator(sm, g).generate_plan(parsed, targets=["mart"])
    assert set(plan.models) == {"base", "mart"}
