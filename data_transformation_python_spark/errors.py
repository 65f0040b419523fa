"""Typed error hierarchy (reference: src/framework/utils/errors.py).

Every framework-raised failure is a ``FrameworkError`` subclass so CLI
users and calling code can match on type instead of message text; each
class carries the CLI exit code.  Subclasses also inherit the stdlib
type they historically were (ValueError / FileNotFoundError /
RuntimeError) so existing ``except`` clauses keep working.
"""

from __future__ import annotations


class FrameworkError(Exception):
    """Base for all framework failures."""

    exit_code = 1


class ConfigError(FrameworkError, ValueError):
    """Invalid or missing project/profile/source configuration."""

    exit_code = 2


class ModelNotFoundError(FrameworkError, FileNotFoundError):
    """No .sql file for the requested model name."""

    exit_code = 3


class SQLParseError(FrameworkError, ValueError):
    """Model SQL failed to parse/render."""

    exit_code = 4


class MissingVariableError(FrameworkError, ValueError):
    """A required $variable was not provided."""

    exit_code = 5


class DependencyError(FrameworkError):
    """Dependency-graph failures."""

    exit_code = 6


class CircularDependencyError(DependencyError):
    """The model DAG contains a cycle (path in the message)."""

    exit_code = 7


class MaterializationError(FrameworkError, ValueError):
    """A materialization strategy failed or was misconfigured."""

    exit_code = 8


class ModelExecutionError(FrameworkError, RuntimeError):
    """A model's query execution failed after retries."""

    exit_code = 9
