"""Project configuration: profiles / environments / sources YAML.

Port of the reference's config layer (reference: src/framework/
config.py:99-266) with the warehouse connection replaced by Spark
session settings: a profile names a Spark master, warehouse dir,
catalog database/schema and extra Spark conf instead of Snowflake
credentials.  ``${ENV_VAR}`` / ``${ENV_VAR:-default}`` substitution
(reference: config.py:178-203) is preserved.

sources.yml declares external tables (reference: config.py:99-176):
each table resolves either to a catalog identifier or to a file path +
format that the executor registers as a temp view.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path

import yaml

_ENV_PATTERN = re.compile(r"\$\{(\w+)(?::-([^}]*))?\}")


def substitute_env_vars(text: str) -> str:
    """``${VAR}`` → env value (error if unset), ``${VAR:-default}`` →
    env value or default (reference: config.py:178-203)."""

    def _sub(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        val = os.environ.get(name)
        if val is None:
            if default is not None:
                return default
            raise KeyError(f"Environment variable {name} is not set")
        return val

    return _ENV_PATTERN.sub(_sub, text)


def load_yaml(path: Path) -> dict:
    if not path.exists():
        return {}
    return yaml.safe_load(substitute_env_vars(path.read_text())) or {}


@dataclass
class SourceTable:
    source: str
    name: str
    identifier: str | None = None  # catalog table (db.tbl)
    path: str | None = None  # file-backed source
    format: str = "parquet"
    options: dict = field(default_factory=dict)


class SourceRegistry:
    """Resolve ``source('raw', 'orders')`` to a readable relation
    (reference: config.py:121-176 returns DB.SCHEMA.IDENTIFIER)."""

    def __init__(self, raw: dict):
        self._tables: dict[tuple[str, str], SourceTable] = {}
        for sname, sdef in (raw.get("sources") or {}).items():
            database = sdef.get("database")
            schema = sdef.get("schema")
            for tname, tdef in (sdef.get("tables") or {}).items():
                tdef = tdef or {}
                ident = tdef.get("identifier")
                path = tdef.get("path")
                if ident is None and path is None:
                    parts = [p for p in (database, schema, tdef.get("name", tname)) if p]
                    ident = ".".join(parts) if parts else tname
                self._tables[(sname, tname)] = SourceTable(
                    source=sname,
                    name=tname,
                    identifier=ident,
                    path=path,
                    format=tdef.get("format", "parquet"),
                    options=tdef.get("options") or {},
                )

    def get(self, source: str, table: str) -> SourceTable:
        key = (source, table)
        if key not in self._tables:
            raise KeyError(f"Unknown source table {source}.{table}")
        return self._tables[key]

    def all(self) -> list[SourceTable]:
        return list(self._tables.values())


#: Warehouse-profile keys accepted for porting parity (reference:
#: connection.py:100-166).  Auth itself is meaningless for a local
#: SparkSession, but real projects carry these keys in profiles.yml;
#: they validate like the reference and export as ``spark.dtps.profile.*``
#: conf tags (the QUERY_TAG analogue — visible in the Spark UI).
_PROFILE_CONN_KEYS = (
    "account",
    "user",
    "warehouse",
    "role",
    "query_tag",
)


def validate_profile_auth(prof: dict, env: str) -> None:
    """Mirror the reference's per-authenticator validation (reference:
    config.py:244-266).  Only applies when the profile declares a
    warehouse connection at all (local Spark profiles don't)."""
    from .errors import ConfigError

    declares_conn = any(
        k in prof for k in ("account", "authenticator", "password", "private_key")
    )
    if not declares_conn:
        return
    authenticator = prof.get("authenticator", "password")
    if authenticator in ("externalbrowser",):
        return
    if authenticator == "oauth":
        if "token" not in prof:
            raise ConfigError(
                f"OAuth authentication requires 'token' field in connection "
                f"config (environment {env!r})"
            )
    elif authenticator == "snowflake":
        if "private_key" not in prof:
            raise ConfigError(
                f"Private key authentication requires 'private_key' field in "
                f"connection config (environment {env!r})"
            )
    elif "password" not in prof:
        raise ConfigError(
            f"Password authentication requires 'password' field in "
            f"connection config (environment {env!r})"
        )


@dataclass
class ProjectConfig:
    project_dir: Path
    env_name: str = "dev"
    master: str | None = None
    database: str = "default"
    warehouse_dir: str | None = None
    spark_conf: dict = field(default_factory=dict)
    variables: dict = field(default_factory=dict)
    sources: SourceRegistry = field(default_factory=lambda: SourceRegistry({}))
    models_dir: Path | None = None
    tests_dir: Path | None = None
    state_dir: Path | None = None
    connection: dict = field(default_factory=dict)

    def __post_init__(self):
        self.project_dir = Path(self.project_dir)
        if self.models_dir is None:
            self.models_dir = self.project_dir / "models"
            if not self.models_dir.exists():
                alt = self.project_dir / "sql" / "models"
                if alt.exists():
                    self.models_dir = alt
        if self.tests_dir is None:
            self.tests_dir = self.project_dir / "tests"
        if self.state_dir is None:
            self.state_dir = self.project_dir / ".state"


def load_config(project_dir: str | Path, env: str | None = None) -> ProjectConfig:
    """Load profiles.yml + sources.yml for an environment (reference:
    config.py:432-442).  Profile fields map to Spark session settings."""
    project_dir = Path(project_dir)
    profiles = load_yaml(project_dir / "profiles.yml")
    env = env or profiles.get("default_environment", "dev")
    envs = profiles.get("environments") or {}
    prof = envs.get(env) or {}
    sources = SourceRegistry(load_yaml(project_dir / "sources.yml"))
    validate_profile_auth(prof, env)
    connection = {k: prof[k] for k in _PROFILE_CONN_KEYS if k in prof}
    spark_conf = dict(prof.get("spark_conf") or {})
    # profile identity keys → conf tags (QUERY_TAG analogue)
    for k, v in connection.items():
        spark_conf.setdefault(f"spark.dtps.profile.{k}", str(v))
    # session_parameters → runtime conf (reference sets them via SET
    # per statement, connection.py:427-439; Spark's runtime conf is
    # the session-scoped equivalent)
    for k, v in (prof.get("session_parameters") or {}).items():
        key = k if str(k).startswith("spark.") else f"spark.dtps.session.{k}"
        spark_conf.setdefault(key, str(v))
    return ProjectConfig(
        project_dir=project_dir,
        env_name=env,
        master=prof.get("master"),
        database=prof.get("database", prof.get("schema", "default")),
        warehouse_dir=prof.get("warehouse_dir"),
        spark_conf=spark_conf,
        variables=prof.get("vars") or {},
        sources=sources,
        connection=connection,
    )
