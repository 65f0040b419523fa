"""Per-environment model state: file/config hashes, run counters,
incremental watermarks.  JSON on disk with atomic tmp+rename writes
and a thread lock (reference: src/framework/state.py:19-173,241-333).

One semantic improvement flagged in SURVEY.md §7: incremental
watermarks store the observed ``max(time_column)`` of the data rather
than the wall-clock time of the run (the reference stores
``datetime.now()`` — materialization.py:241-243 — which silently skips
late-arriving rows)."""

from __future__ import annotations

import json
import os
import tempfile
import threading
from dataclasses import asdict, dataclass, field
from pathlib import Path


@dataclass
class ModelState:
    """(reference: state.py:19-121)"""

    name: str
    file_hash: str = ""
    config_hash: str = ""
    dependencies: list = field(default_factory=list)
    last_run: str | None = None
    run_count: int = 0
    success_count: int = 0
    failure_count: int = 0
    last_status: str | None = None
    incremental_state: dict = field(default_factory=dict)

    def record_run(self, success: bool, when: str) -> None:
        self.last_run = when
        self.run_count += 1
        if success:
            self.success_count += 1
            self.last_status = "success"
        else:
            self.failure_count += 1
            self.last_status = "failed"


class StateManager:
    """Load/save per-env state at ``.state/{env}/state_{env}.json``
    (reference: state.py:109, 123-173)."""

    def __init__(self, state_dir: str | Path, env: str = "dev"):
        self.env = env
        self.state_dir = Path(state_dir) / env
        self.state_file = self.state_dir / f"state_{env}.json"
        # RLock: mutators nest (update_model_state → ensure) and
        # run-all mutates from worker threads while save() iterates.
        self._lock = threading.RLock()
        self.models: dict[str, ModelState] = {}
        self.load()

    def load(self) -> None:
        if not self.state_file.exists():
            self.models = {}
            return
        with self._lock:
            data = json.loads(self.state_file.read_text() or "{}")
            self.models = {
                name: ModelState(**ms) for name, ms in (data.get("models") or {}).items()
            }

    def save(self) -> None:
        """Atomic write: tmp file + rename (reference: state.py:148-173)."""
        with self._lock:
            self.state_dir.mkdir(parents=True, exist_ok=True)
            payload = {
                "env": self.env,
                "models": {n: asdict(m) for n, m in self.models.items()},
            }
            fd, tmp = tempfile.mkstemp(dir=self.state_dir, suffix=".tmp")
            try:
                with os.fdopen(fd, "w") as f:
                    json.dump(payload, f, indent=2, sort_keys=True)
                os.replace(tmp, self.state_file)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)

    # -- change detection (reference: state.py:241-296) ----------------
    def get(self, name: str) -> ModelState | None:
        return self.models.get(name)

    def ensure(self, name: str) -> ModelState:
        with self._lock:
            return self.models.setdefault(name, ModelState(name=name))

    def has_changed(
        self,
        name: str,
        file_hash: str,
        config_hash: str = "",
        dependencies: list | None = None,
    ) -> bool:
        st = self.models.get(name)
        if st is None:
            return True
        if st.file_hash != file_hash:
            return True
        if config_hash and st.config_hash != config_hash:
            return True
        if dependencies is not None and sorted(st.dependencies) != sorted(dependencies):
            return True
        return False

    def update_model_state(
        self,
        name: str,
        file_hash: str,
        config_hash: str = "",
        dependencies: list | None = None,
        success: bool = True,
        when: str | None = None,
    ) -> None:
        import datetime as _dt

        with self._lock:
            st = self.ensure(name)
            st.file_hash = file_hash
            st.config_hash = config_hash
            if dependencies is not None:
                st.dependencies = sorted(dependencies)
            st.record_run(
                success, when or _dt.datetime.now(_dt.timezone.utc).isoformat()
            )

    # -- incremental watermarks (reference: state.py:298-333) ----------
    def get_incremental_state(self, name: str, key: str, default=None):
        st = self.models.get(name)
        if st is None:
            return default
        return st.incremental_state.get(key, default)

    def set_incremental_state(self, name: str, key: str, value) -> None:
        with self._lock:
            self.ensure(name).incremental_state[key] = value

    def remove_model(self, name: str) -> None:
        with self._lock:
            self.models.pop(name, None)


def create_state_manager(state_dir: str | Path, env: str = "dev") -> StateManager:
    """(reference: state.py:399-410)"""
    return StateManager(state_dir, env)
