"""SQL model parser: discovers ``.sql`` model files, extracts inline
config/meta/dependency comments, renders Jinja (``ref`` / ``source`` /
``this`` / ``is_incremental`` / macros), and collects ``$variables``.

Port of the reference parser (reference: src/framework/parser.py) with
these deliberate fixes, per SURVEY.md fidelity caveats / §7:

- the ``Any``-annotation NameError (reference parser.py:249) is gone;
- ``this()`` emits ``__THIS__`` *and the executor resolves it* (the
  reference never implements resolution — SURVEY §2.9 U3);
- ``is_incremental()`` is a real two-pass render: parse pass renders
  with False, execution pass re-renders with the actual table-exists
  truth (reference renders only once with False — SURVEY §2.9 U4);
- SQL validation uses Spark's own parser instead of sqlglot (not
  available here, and the Spark parser is the authoritative dialect).

Comment formats (reference parser.py:230-304):
    -- config: key=value, key2=value2
    -- depends_on: model_a, model_b
    -- meta:
    --   cdc:
    --     change_type_column: op
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from pathlib import Path

import yaml
from jinja2 import Environment

from .macros import register_macros
from .sqlvars import extract_variables

REF_PLACEHOLDER = "__REF_{name}__"
SOURCE_PLACEHOLDER = "__SOURCE_{source}_{table}__"
THIS_PLACEHOLDER = "__THIS__"

_CONFIG_RE = re.compile(r"--\s*config:\s*(.+?)$", re.MULTILINE)
# var() INSIDE Jinja delimiters only — a SQL var_samp()/var_pop()
# call in the model body must not flag the model as var-driven
_VAR_CALL_RE = re.compile(r"\{[{%][^}%]*\bvar\s*\(")
_DEPENDS_RE = re.compile(r"--\s*depends_on:\s*(.+?)$", re.MULTILINE)
_REF_RE = re.compile(r"\{\{\s*ref\(\s*['\"](.+?)['\"]\s*\)\s*\}\}")
_SOURCE_RE = re.compile(
    r"\{\{\s*source\(\s*['\"](.+?)['\"]\s*,\s*['\"](.+?)['\"]\s*\)\s*\}\}"
)
_FROM_JOIN_RE = re.compile(
    r"\b(?:FROM|JOIN)\s+([A-Za-z_][\w.]*)", re.IGNORECASE
)


@dataclass
class ParsedSQL:
    """Parse result for one model file (reference: parser.py:23-45)."""

    name: str
    path: Path
    raw_sql: str
    rendered_sql: str
    config: dict = field(default_factory=dict)
    meta: dict = field(default_factory=dict)
    dependencies: set = field(default_factory=set)
    source_deps: set = field(default_factory=set)
    variables: set = field(default_factory=set)
    file_hash: str = ""
    uses_is_incremental: bool = False
    uses_var: bool = False


from .errors import SQLParseError  # noqa: E402  (re-export for callers)


class SQLParser:
    """Model-file discovery + parsing with a path-keyed, hash-validated
    cache (reference: parser.py:126-223, cache 143-151 — which keys by
    path and validates the stored hash; keying by content hash alone
    collides for byte-identical files and silently drops models)."""

    def __init__(self, models_dir: str | Path):
        self.models_dir = Path(models_dir)
        self._cache: dict[str, ParsedSQL] = {}
        self.jinja_env = self._build_env()

    # -- Jinja ----------------------------------------------------------
    def _build_env(self) -> Environment:
        env = Environment()
        env.globals["ref"] = lambda name: REF_PLACEHOLDER.format(name=name)
        env.globals["source"] = lambda s, t: SOURCE_PLACEHOLDER.format(
            source=s, table=t
        )
        env.globals["this"] = lambda: THIS_PLACEHOLDER
        # parse-pass defaults; execution re-renders with real values
        env.globals["is_incremental"] = lambda: False
        env.globals["var"] = lambda name, default="": default
        register_macros(env)
        return env

    def render(
        self,
        sql: str,
        is_incremental: bool = False,
        extra: dict | None = None,
        variables: dict | None = None,
    ) -> str:
        """Render a model body; used twice — parse pass (False, no
        vars: ``var()`` yields its declared default, so dependency
        extraction sees the default branch) and execution pass with
        the actual incremental truth (fixes reference gap U4) and the
        merged profile/CLI variables, so ``{% if var('x') == ... %}``
        branches resolve against real config — the dbt-style
        config-driven model body (e.g. the funnel's tokenizer-family
        switch)."""
        env = self.jinja_env.overlay()
        env.globals["is_incremental"] = lambda: is_incremental
        if variables is not None:
            env.globals["var"] = (
                lambda name, default="": variables.get(name, default)
            )
        template = env.from_string(sql)
        return template.render(**(extra or {}))

    # -- comment extraction --------------------------------------------
    @staticmethod
    def extract_config(sql: str) -> dict:
        config: dict = {}
        for m in _CONFIG_RE.finditer(sql):
            for pair in m.group(1).split(","):
                if "=" in pair:
                    k, v = pair.split("=", 1)
                    config[k.strip()] = v.strip()
        return config

    @staticmethod
    def extract_meta(sql: str) -> dict:
        lines = sql.split("\n")
        meta_lines: list[str] = []
        in_meta = False
        for line in lines:
            stripped = line.strip()
            if stripped.startswith("-- meta:"):
                in_meta = True
                continue
            if in_meta:
                if stripped.startswith("--"):
                    # Preserve indentation after the comment marker so
                    # nested YAML survives (the reference strips it —
                    # parser.py:267-270 — silently flattening nested
                    # meta; deliberate fix).
                    content = line.split("--", 1)[1]
                    if content.startswith(" "):
                        content = content[1:]
                    if content.strip():
                        meta_lines.append(content.rstrip())
                elif stripped == "":
                    continue
                else:
                    break
        if not meta_lines:
            return {}
        try:
            return yaml.safe_load("\n".join(meta_lines)) or {}
        except yaml.YAMLError:
            return {}

    @staticmethod
    def extract_depends_on(sql: str) -> set:
        deps = set()
        for m in _DEPENDS_RE.finditer(sql):
            deps.update(d.strip() for d in m.group(1).split(",") if d.strip())
        return deps

    @staticmethod
    def extract_table_refs(sql: str) -> set:
        """Best-effort FROM/JOIN table references from the rendered SQL
        (the reference uses a sqlglot AST — parser.py:353-372; we use a
        conservative regex and exclude placeholders/subqueries)."""
        refs = set()
        for m in _FROM_JOIN_RE.finditer(sql):
            t = m.group(1)
            if not t.startswith("__") and "(" not in t:
                refs.add(t)
        return refs

    # -- main entry points ---------------------------------------------
    def parse_file(self, path: str | Path) -> ParsedSQL:
        path = Path(path)
        raw = path.read_text()
        file_hash = hashlib.md5(raw.encode()).hexdigest()
        cache_key = str(path)
        cached = self._cache.get(cache_key)
        if cached is not None and cached.file_hash == file_hash:
            return cached

        name = path.stem
        config = self.extract_config(raw)
        meta = self.extract_meta(raw)
        comment_deps = self.extract_depends_on(raw)
        ref_deps = set(_REF_RE.findall(raw))
        source_deps = {f"{s}.{t}" for s, t in _SOURCE_RE.findall(raw)}
        uses_inc = "is_incremental()" in raw
        uses_var = bool(_VAR_CALL_RE.search(raw))

        try:
            rendered = self.render(raw, is_incremental=False)
        except Exception as e:  # keep raw on Jinja failure (reference behavior)
            raise SQLParseError(f"Jinja render failed for {name}: {e}") from e

        parsed = ParsedSQL(
            name=name,
            path=path,
            raw_sql=raw,
            rendered_sql=rendered,
            config=config,
            meta=meta,
            dependencies=comment_deps | ref_deps,
            source_deps=source_deps,
            variables=extract_variables(rendered),
            file_hash=file_hash,
            uses_is_incremental=uses_inc,
            uses_var=uses_var,
        )
        self._cache[cache_key] = parsed
        return parsed

    def parse_directory(self, directory: str | Path | None = None) -> dict[str, ParsedSQL]:
        """Recursively parse every ``*.sql`` model (reference:
        parser.py:434-467)."""
        directory = Path(directory or self.models_dir)
        out: dict[str, ParsedSQL] = {}
        if not directory.exists():
            return out
        for f in sorted(directory.rglob("*.sql")):
            parsed = self.parse_file(f)
            out[parsed.name] = parsed
        return out

    def invalidate_cache(self) -> None:
        """Drop the parse cache (hot-reload hook — reference:
        parser.py:469-481)."""
        self._cache.clear()

    # -- validation -----------------------------------------------------
    @staticmethod
    def validate_sql(sql: str, spark=None) -> tuple[bool, str | None]:
        """Syntax-check a statement with Spark's own parser (the
        reference shells to sqlglot — parser.py:483-504; Spark's parser
        is the authoritative dialect here).  Falls back to a trivial
        non-empty check when no session is supplied."""
        if spark is None:
            return (bool(sql.strip()), None if sql.strip() else "empty SQL")
        try:
            # parsePlan only parses — no analysis, no execution
            spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
            return True, None
        except Exception as e:
            first = next(
                (ln for ln in str(e).splitlines() if ln.strip()), "parse error"
            )
            return False, first
