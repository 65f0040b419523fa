"""Plan generation: diff desired model set against recorded state to
classify each model CREATE / UPDATE / DELETE / NO_CHANGE, with reasons
and an execution order for the changed subset.

Pure-Python port of the reference planner (reference: src/framework/
plan.py:18-226) — no engine interaction at all (reference §3.3)."""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from enum import Enum


class ChangeType(Enum):
    CREATE = "create"
    UPDATE = "update"
    DELETE = "delete"
    NO_CHANGE = "no_change"


@dataclass
class ModelPlan:
    """(reference: plan.py:18-48)"""

    name: str
    change_type: ChangeType
    reasons: list = field(default_factory=list)


@dataclass
class Plan:
    models: dict = field(default_factory=dict)  # name -> ModelPlan
    execution_order: list = field(default_factory=list)  # list[list[str]]

    def summary(self) -> dict:
        counts = {c: 0 for c in ChangeType}
        for mp in self.models.values():
            counts[mp.change_type] += 1
        return {c.value: n for c, n in counts.items()}

    def changed(self) -> list:
        return [
            mp.name
            for mp in self.models.values()
            if mp.change_type in (ChangeType.CREATE, ChangeType.UPDATE)
        ]


def config_hash(config: dict) -> str:
    """Stable hash of a model's inline config (reference:
    plan.py:192-226 compares config_hash)."""
    return hashlib.md5(
        json.dumps(config or {}, sort_keys=True).encode()
    ).hexdigest()


class PlanGenerator:
    """(reference: plan.py:94-190)"""

    def __init__(self, state_manager, graph):
        self.state = state_manager
        self.graph = graph

    def _determine_change(self, name: str, parsed) -> ModelPlan:
        st = self.state.get(name)
        if st is None:
            return ModelPlan(name, ChangeType.CREATE, ["model not in state"])
        reasons = []
        if st.file_hash != parsed.file_hash:
            reasons.append("file content changed")
        ch = config_hash(parsed.config)
        if st.config_hash and st.config_hash != ch:
            reasons.append("config changed")
        deps = sorted(d for d in parsed.dependencies)
        if sorted(st.dependencies) != deps:
            reasons.append("dependencies changed")
        if reasons:
            return ModelPlan(name, ChangeType.UPDATE, reasons)
        return ModelPlan(name, ChangeType.NO_CHANGE, [])

    def generate_plan(
        self, parsed_models: dict, targets: list | None = None
    ) -> Plan:
        """Classify every model; expand explicit targets with their
        transitive dependencies (reference: plan.py:137-144); deleted
        models = in state but no longer on disk."""
        wanted = set(parsed_models)
        if targets:
            wanted = set()
            for t in targets:
                wanted.add(t)
                wanted |= self.graph.get_dependencies(t, recursive=True)

        plan = Plan()
        for name in sorted(wanted):
            if name not in parsed_models:
                continue
            plan.models[name] = self._determine_change(name, parsed_models[name])

        for name in sorted(self.state.models):
            if name not in parsed_models:
                plan.models[name] = ModelPlan(
                    name, ChangeType.DELETE, ["model file removed"]
                )

        changed = set(plan.changed())
        if changed:
            plan.execution_order = [
                [n for n in level if n in changed]
                for level in self.graph.topological_sort()
            ]
            plan.execution_order = [lv for lv in plan.execution_order if lv]
        return plan

    def apply_recorded(self, plan: Plan, parsed_models: dict) -> None:
        """After a successful run, record the new hashes/deps and drop
        deleted models (reference: plan.py apply path)."""
        for name, mp in plan.models.items():
            if mp.change_type == ChangeType.DELETE:
                self.state.remove_model(name)
            elif name in parsed_models:
                p = parsed_models[name]
                self.state.update_model_state(
                    name,
                    file_hash=p.file_hash,
                    config_hash=config_hash(p.config),
                    dependencies=sorted(p.dependencies),
                    success=True,
                )
        self.state.save()
