"""Plan generation (SQLMesh-style diffing of desired vs recorded
state) — see plan.py."""

from .plan import ChangeType, ModelPlan, Plan, PlanGenerator  # noqa: F401
