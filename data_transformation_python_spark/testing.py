"""Data-quality tests: unique / not_null / accepted_values / range +
custom SQL tests.

Port of the reference test runner (reference: src/framework/
testing.py:16-149, polars_utils.py:158-377) executed as Spark
DataFrame aggregations — each test is one distributed count, no row
collection.  The documented-but-unimplemented custom SQL test
convention (reference: sql/tests/README.md, SURVEY §2.11 T6) is
implemented here: every ``tests/*.sql`` file must return a single
``failed_rows`` count; 0 passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import functions as F


@dataclass
class TestResult:
    """(reference: testing.py:16-24)"""

    model: str
    test_name: str
    column: str | None
    passed: bool
    rows_failed: int = 0
    error: str | None = None


class TestRunner:
    def __init__(
        self,
        executor,
        registry=None,
        tests_dir: str | Path | None = None,
        state=None,
    ):
        self.executor = executor
        self.spark = executor.spark
        self.registry = registry
        self.tests_dir = Path(tests_dir) if tests_dir else None
        # optional state manager enables the history-aware tests
        # (volume_anomaly); without it they fail with a clear error
        self.state = state

    # -- builtin tests (T1-T4) -----------------------------------------
    def test_unique(self, table: str, column: str) -> int:
        """duplicate-group count (reference: testing.py:30-41)."""
        return (
            self.spark.table(table)
            .groupBy(column)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )

    def test_not_null(self, table: str, column: str) -> int:
        """(reference: testing.py:43-50)"""
        return self.spark.table(table).filter(F.col(column).isNull()).count()

    def test_accepted_values(self, table: str, column: str, values: list) -> int:
        """(reference: testing.py:52-60).  NULLs are not counted,
        matching SQL ``NOT IN`` three-valued logic."""
        return self.spark.table(table).filter(~F.col(column).isin(values)).count()

    def test_range(self, table: str, column: str, min_value=None, max_value=None) -> int:
        """(reference: polars_utils.py:158-168 — Polars-only twin)"""
        df = self.spark.table(table)
        cond = F.lit(False)
        if min_value is not None:
            cond = cond | (F.col(column) < min_value)
        if max_value is not None:
            cond = cond | (F.col(column) > max_value)
        return df.filter(cond).count()

    # -- runner (reference: testing.py:63-149) -------------------------
    def _run_one(self, model: str, table: str, column: str | None, test) -> TestResult:
        try:
            if isinstance(test, str):
                tname, params = test, {}
            else:
                tname, params = next(iter(test.items()))
                params = params or {}
            if tname == "unique":
                failed = self.test_unique(table, column)
            elif tname == "not_null":
                failed = self.test_not_null(table, column)
            elif tname == "accepted_values":
                failed = self.test_accepted_values(
                    table, column, params.get("values") or []
                )
            elif tname == "range":
                failed = self.test_range(
                    table, column, params.get("min"), params.get("max")
                )
            elif tname == "volume_anomaly":
                if self.state is None:
                    return TestResult(
                        model, tname, column, False,
                        error="volume_anomaly needs a state manager "
                        "(TestRunner(..., state=...))",
                    )
                return AnomalyTests(self.spark, self.state).volume_anomaly(
                    model,
                    table,
                    tolerance_pct=float(params.get("tolerance_pct", 50.0)),
                    window=int(params.get("window", 7)),
                )
            elif tname == "freshness":
                return AnomalyTests(self.spark, self.state).freshness(
                    model,
                    table,
                    column or params.get("column"),
                    max_lag_hours=float(params.get("max_lag_hours", 24.0)),
                    as_of=params.get("as_of"),
                )
            else:
                return TestResult(
                    model, tname, column, False, error=f"unknown test {tname!r}"
                )
            return TestResult(model, tname, column, failed == 0, rows_failed=failed)
        except Exception as e:
            return TestResult(
                model, str(test), column, False, error=str(e).split("\n")[0]
            )

    def run_model_tests(self, model: str, table: str) -> list[TestResult]:
        """All schema.yml-declared tests for one model."""
        results: list[TestResult] = []
        cfg = self.registry.get(model) if self.registry else None
        if cfg is None:
            return results
        for test in cfg.tests:
            results.append(self._run_one(model, table, None, test))
        for cname, col in cfg.columns.items():
            for test in col.tests:
                results.append(self._run_one(model, table, cname, test))
        return results

    # -- custom SQL tests (T6 — implemented here) ----------------------
    def run_custom_sql_tests(self, variables: dict | None = None) -> list[TestResult]:
        results: list[TestResult] = []
        if not self.tests_dir or not self.tests_dir.exists():
            return results
        for f in sorted(self.tests_dir.glob("*.sql")):
            try:
                rows = self.executor.execute_query(f.read_text(), variables)
                first = list(rows[0].values())[0] if rows else 0
                failed = int(first or 0)
                results.append(
                    TestResult("custom", f.stem, None, failed == 0, rows_failed=failed)
                )
            except Exception as e:
                results.append(
                    TestResult("custom", f.stem, None, False, error=str(e).split("\n")[0])
                )
        return results


class AnomalyTests:
    """History-aware data-quality checks (beyond the reference's
    stateless T1-T6): volume anomaly against trailing run history and
    source freshness with an injectable clock.  Both are single
    aggregates — no row collection, scale-independent."""

    VOLUME_KEY = "__dq_volume_history"

    def __init__(self, spark, state):
        self.spark = spark
        self.state = state

    def volume_anomaly(
        self,
        model: str,
        table: str,
        tolerance_pct: float = 50.0,
        window: int = 7,
        record: bool = True,
    ) -> TestResult:
        """Row count vs the trailing-``window`` mean of PREVIOUS runs:
        fails when it deviates more than ``tolerance_pct`` percent —
        the "did the upstream feed silently halve/explode" guard.
        First run (no history) passes vacuously and seeds history."""
        n = self.spark.table(table).count()
        hist = self.state.get_incremental_state(model, self.VOLUME_KEY) or []
        try:
            if record:
                self.state.set_incremental_state(
                    model, self.VOLUME_KEY, (hist + [int(n)])[-window:]
                )
            if not hist:
                return TestResult(model, "volume_anomaly", None, True, rows_failed=0)
            mean = sum(hist[-window:]) / len(hist[-window:])
            deviates = mean > 0 and abs(n - mean) > (tolerance_pct / 100.0) * mean
            return TestResult(
                model,
                "volume_anomaly",
                None,
                not deviates,
                rows_failed=int(abs(n - mean)) if deviates else 0,
            )
        except Exception as e:  # history store must never crash the run
            return TestResult(
                model, "volume_anomaly", None, False, error=str(e).split("\n")[0]
            )

    def freshness(
        self,
        model: str,
        table: str,
        column: str,
        max_lag_hours: float,
        as_of=None,
    ) -> TestResult:
        """dbt source-freshness: fails when ``max(column)`` is older
        than ``max_lag_hours`` before ``as_of`` (injectable for tests
        and backfills; defaults to the driver clock)."""
        import datetime as _dt

        if as_of is None:
            as_of = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        elif isinstance(as_of, str):
            as_of = _dt.datetime.fromisoformat(as_of)
        row = (
            self.spark.table(table)
            .agg(F.max(F.col(column).cast("timestamp")).alias("m"))
            .first()
        )
        latest = row["m"]
        if latest is None:
            return TestResult(
                model, "freshness", column, False, error="no data / all-NULL column"
            )
        lag_h = (as_of - latest).total_seconds() / 3600.0
        fresh = lag_h <= max_lag_hours
        return TestResult(
            model, "freshness", column, fresh, rows_failed=0 if fresh else 1
        )
