"""Backfill: re-run a model over a date range in interval chunks,
passing ``start_date`` / ``end_date`` variables per slice.

Port of the reference backfill driver loop (reference:
src/framework/backfill.py:15-85) — pure orchestration around the model
executor; each slice is one Spark job whose date predicate prunes the
scan."""

from __future__ import annotations

import datetime as dt


class BackfillExecutor:
    def __init__(self, model_executor):
        self.model_executor = model_executor

    @staticmethod
    def date_slices(
        start_date: str | dt.date,
        end_date: str | dt.date,
        interval_days: int = 1,
    ) -> list[tuple[str, str]]:
        """Inclusive [start, end] split into interval_days chunks
        (reference: backfill.py:52-80)."""
        if isinstance(start_date, str):
            start_date = dt.date.fromisoformat(start_date)
        if isinstance(end_date, str):
            end_date = dt.date.fromisoformat(end_date)
        if interval_days < 1:
            raise ValueError("interval_days must be >= 1")
        slices = []
        cur = start_date
        while cur <= end_date:
            stop = min(cur + dt.timedelta(days=interval_days - 1), end_date)
            slices.append((cur.isoformat(), stop.isoformat()))
            cur = stop + dt.timedelta(days=1)
        return slices

    def backfill_date_range(
        self,
        model: str,
        start_date: str,
        end_date: str,
        interval_days: int = 1,
        variables: dict | None = None,
        dry_run: bool = False,
    ) -> list[dict]:
        """(reference: backfill.py:22-84)"""
        results = []
        for s, e in self.date_slices(start_date, end_date, interval_days):
            run_vars = {**(variables or {}), "start_date": s, "end_date": e}
            r = self.model_executor.execute_model(
                model, variables=run_vars, dry_run=dry_run
            )
            r["slice"] = (s, e)
            results.append(r)
            if not r.get("success") and self.model_executor.fail_fast:
                break
        return results
