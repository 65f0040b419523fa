"""Hot-reload file watcher for ``.sql`` / ``.yml`` / ``.yaml`` model
files.

The reference uses the watchdog library (reference: src/framework/
watcher.py:19-148); watchdog is not available here, so this is a
dependency-free polling watcher: an mtime snapshot diff on an
interval, invoking a callback with (event_kind, path) and invalidating
the parser cache — same observable behavior (reference:
parser.py:469-481 cache invalidation)."""

from __future__ import annotations

import threading
import time
from pathlib import Path

WATCHED_SUFFIXES = {".sql", ".yml", ".yaml"}


class ModelWatcher:
    def __init__(
        self,
        models_dir: str | Path,
        callback,
        parser=None,
        poll_interval: float = 1.0,
    ):
        self.models_dir = Path(models_dir)
        self.callback = callback
        self.parser = parser
        self.poll_interval = poll_interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._snapshot: dict[Path, float] = {}

    def _scan(self) -> dict[Path, float]:
        out: dict[Path, float] = {}
        if not self.models_dir.exists():
            return out
        for p in self.models_dir.rglob("*"):
            if p.suffix in WATCHED_SUFFIXES and p.is_file():
                try:
                    out[p] = p.stat().st_mtime
                except OSError:
                    continue
        return out

    def poll_once(self) -> list[tuple[str, Path]]:
        """One diff pass; returns [(event, path)] with event ∈
        created/modified/deleted.  Exposed for tests and for callers
        that drive their own loop."""
        new = self._scan()
        events: list[tuple[str, Path]] = []
        for p, mtime in new.items():
            if p not in self._snapshot:
                events.append(("created", p))
            elif mtime != self._snapshot[p]:
                events.append(("modified", p))
        for p in self._snapshot:
            if p not in new:
                events.append(("deleted", p))
        self._snapshot = new
        if events and self.parser is not None:
            self.parser.invalidate_cache()
        for ev in events:
            self.callback(*ev)
        return events

    def start(self) -> None:
        self._snapshot = self._scan()

        def _loop():
            while not self._stop.is_set():
                time.sleep(self.poll_interval)
                self.poll_once()

        self._thread = threading.Thread(target=_loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
