"""``$variable`` substitution and literal encoding.

Mirrors the reference's single-pass regex substitution and typed
literal formatting (reference: src/framework/executor.py:341-397) and
its literal encoder (reference: src/framework/cdc_polars.py:572-585):
``str`` → quoted with ``''`` escaping, ``bool`` → TRUE/FALSE, ``None``
→ NULL, datetime/date → quoted ISO, numerics verbatim.  Pure Python
preprocessing — runs on the driver before ``spark.sql``.
"""

from __future__ import annotations

import datetime as _dt
import re

VAR_PATTERN = re.compile(r"\$(\w+)")


from .errors import MissingVariableError as _BaseMissingVariableError


class MissingVariableError(_BaseMissingVariableError):
    """A ``$var`` in the SQL has no value provided (reference:
    executor.py:328-339 validation)."""


def format_literal(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, _dt.datetime):
        return "'" + value.isoformat(sep=" ") + "'"
    if isinstance(value, _dt.date):
        return "'" + value.isoformat() + "'"
    if isinstance(value, (int, float)):
        return repr(value)
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


def extract_variables(sql: str) -> set[str]:
    """All ``$name`` references in a SQL text (reference:
    parser.py:344-351)."""
    return set(VAR_PATTERN.findall(sql))


def validate_variables(sql: str, variables: dict) -> None:
    missing = extract_variables(sql) - set(variables or {})
    if missing:
        raise MissingVariableError(
            f"Missing required variables: {sorted(missing)}"
        )


def substitute_variables(sql: str, variables: dict | None, strict: bool = True) -> str:
    """Single-pass O(n) replacement of every ``$name`` with its typed
    literal (reference: executor.py:341-397 — the 'single-pass regex'
    optimization, docs/PERFORMANCE_OPTIMIZATIONS.md:33-46)."""
    variables = variables or {}
    if strict:
        validate_variables(sql, variables)

    def _sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in variables:
            return m.group(0)
        return format_literal(variables[name])

    return VAR_PATTERN.sub(_sub, sql)
