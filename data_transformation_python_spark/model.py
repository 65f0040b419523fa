"""Model/column metadata registry loaded from ``schema.yml`` files.

Port of the reference's declared-metadata layer (reference:
src/framework/model.py:16-317): schema.yml column lists are
documentation + test anchors, not enforced schemas (SURVEY §1.4) —
the same contract here, with optional StructType validation available
as an extension point.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import yaml


@dataclass
class ColumnConfig:
    """(reference: model.py:36-57)"""

    name: str
    description: str = ""
    tests: list = field(default_factory=list)  # e.g. ["unique", "not_null",
    # {"accepted_values": {"values": [...]}}, {"range": {"min":..,"max":..}}]


@dataclass
class ModelConfig:
    """(reference: model.py:60-154)"""

    name: str
    description: str = ""
    materialized: str | None = None
    tags: list = field(default_factory=list)
    tests: list = field(default_factory=list)  # model-level tests
    columns: dict = field(default_factory=dict)  # name -> ColumnConfig
    meta: dict = field(default_factory=dict)


class ModelRegistry:
    """Discover and merge all ``schema.yml`` / ``*.yml`` metadata files
    under the models dir (reference: model.py:157-317, loader at
    173-190)."""

    def __init__(self, models_dir: str | Path):
        self.models_dir = Path(models_dir)
        self.models: dict[str, ModelConfig] = {}
        self._load()

    def _load(self) -> None:
        if not self.models_dir.exists():
            return
        for path in sorted(self.models_dir.rglob("*.yml")) + sorted(
            self.models_dir.rglob("*.yaml")
        ):
            try:
                data = yaml.safe_load(path.read_text()) or {}
            except yaml.YAMLError:
                continue
            for mdef in data.get("models") or []:
                name = mdef.get("name")
                if not name:
                    continue
                cols = {}
                for cdef in mdef.get("columns") or []:
                    cname = cdef.get("name")
                    if not cname:
                        continue
                    cols[cname] = ColumnConfig(
                        name=cname,
                        description=cdef.get("description", ""),
                        tests=cdef.get("tests") or [],
                    )
                self.models[name] = ModelConfig(
                    name=name,
                    description=mdef.get("description", ""),
                    materialized=mdef.get("materialized"),
                    tags=mdef.get("tags") or [],
                    tests=mdef.get("tests") or [],
                    columns=cols,
                    meta=mdef.get("meta") or {},
                )

    def get(self, name: str) -> ModelConfig | None:
        return self.models.get(name)
