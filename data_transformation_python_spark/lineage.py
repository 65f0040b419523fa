"""Column-level lineage extraction + impact analysis.

The reference derives lineage from a sqlglot AST (reference:
src/framework/parser.py:374-432, utils/lineage.py:10-194).  sqlglot is
not available in this environment, so there are two extractors:

- ``extract_column_lineage_spark``: resolves the query through
  Spark's own analyzer and walks the analyzed logical plan, tracking
  every output attribute's expression id down to the leaf relations.
  This is *stronger* than the reference's AST walk: ``*`` expands to
  real columns (including through joins), aliases/CTEs/subqueries
  resolve exactly, and the result is what the engine will actually
  compute.  Needs a session where the referenced tables/views exist.
- ``extract_column_lineage``: sessionless regex fallback for
  parse-time lineage (same shapes the reference handles; CTEs and
  FROM/JOIN derived tables resolve through to base tables; ``*``
  over a plain base table degrades to table-level, explicitly
  marked).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_SELECT_RE = re.compile(r"\bSELECT\b(.*?)\bFROM\b", re.IGNORECASE | re.DOTALL)
_FROM_RE = re.compile(r"\bFROM\s+([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(\w+))?", re.IGNORECASE)
_JOIN_RE = re.compile(r"\bJOIN\s+([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(\w+))?", re.IGNORECASE)
_ALIAS_RE = re.compile(r"^(.*?)\s+(?:AS\s+)?([A-Za-z_]\w*)$", re.IGNORECASE | re.DOTALL)
_COLREF_RE = re.compile(r"\b(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\b")
_FN_RE = re.compile(r"\b([A-Za-z_]\w*)\s*\(")

_SQL_KEYWORDS = {
    "case", "when", "then", "else", "end", "and", "or", "not", "null", "true",
    "false", "as", "distinct", "interval", "over", "partition", "by", "order",
    "rows", "between", "unbounded", "preceding", "following", "current", "row",
}


@dataclass
class ColumnLineage:
    """(reference: utils/lineage.py:10-79)"""

    column: str
    sources: list = field(default_factory=list)  # [(table, column)]
    transformations: list = field(default_factory=list)  # function names


def _split_select_items(select_body: str) -> list[str]:
    items, depth, cur = [], 0, []
    for ch in select_body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        items.append(tail)
    return items


def _split_ctes(sql: str) -> tuple[dict[str, str], str]:
    """Split a leading ``WITH a AS (...), b AS (...)`` prefix into
    {name: body} (in definition order) plus the main query text.
    Paren-balanced scan — no regex over nested bodies."""
    m = re.match(r"\s*WITH\s+(?:RECURSIVE\s+)?", sql, re.IGNORECASE)
    if not m:
        return {}, sql
    i = m.end()
    ctes: dict[str, str] = {}
    while True:
        hm = re.match(r"\s*([A-Za-z_]\w*)\s*(?:\([^)]*\)\s*)?AS\s*\(", sql[i:], re.IGNORECASE)
        if not hm:
            break
        name, j = hm.group(1), i + hm.end()
        depth, k = 1, j
        while k < len(sql) and depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        ctes[name] = sql[j : k - 1]
        i = k
        cm = re.match(r"\s*,", sql[i:])
        if not cm:
            break
        i += cm.end()
    return ctes, sql[i:]


def extract_column_lineage(sql: str, default_table: str | None = None) -> list[ColumnLineage]:
    """Per-SELECT-item (table, column) sources + transformation names
    (reference: parser.py:374-432).

    ``WITH x AS (...)`` prefixes are resolved without a session: each
    CTE body's lineage is computed first (earlier CTEs visible to
    later ones), then references to CTE columns in the main query —
    including ``cte.*`` / bare ``*`` over a CTE, which expand to the
    CTE's actual output columns — are traced through to base tables,
    matching what the Spark-analyzer extractor returns for the same
    SQL.  ``*`` over a plain base table still degrades to the marked
    table-level ``(table, '*')`` row (the base schema is unknowable
    without a session)."""
    ctes, main = _split_ctes(sql)
    resolved: dict[str, list[ColumnLineage]] = {}
    for name, body in ctes.items():
        resolved[name] = _extract_simple(body, None, resolved)
    return _extract_simple(main, default_table, resolved)


def _resolve_through_ctes(
    sources: list, ctes: dict[str, list[ColumnLineage]]
) -> list:
    out = []
    for table, col in sources:
        lin = ctes.get(table)
        if lin is None:
            out.append((table, col))
            continue
        hits = [cl for cl in lin if cl.column == col]
        if hits:
            out.extend(hits[0].sources)
        elif col == "*":
            for cl in lin:
                out.extend(cl.sources)
        else:
            out.append((table, col))
    seen: set = set()
    return [s for s in out if not (s in seen or seen.add(s))]


_DERIVED_OPEN_RE = re.compile(r"\b(FROM|JOIN)\s*\(", re.IGNORECASE)
_NOT_AN_ALIAS = {
    "on", "where", "group", "order", "having", "limit", "union", "join",
    "left", "right", "inner", "outer", "cross", "full", "using",
    "except", "intersect", "minus", "natural", "lateral", "qualify",
    "window", "distribute", "cluster", "sort",
}


def _hoist_derived_tables(
    sql: str, resolved: dict[str, list[ColumnLineage]]
) -> str:
    """Rewrite ``FROM (SELECT …) [AS] t`` / ``JOIN (SELECT …) u``
    derived tables into plain alias references, registering each
    body's lineage in ``resolved`` exactly like a CTE — so downstream
    resolution (``t.col``, ``t.*``, bare columns) traces through to
    base tables.  Nested derived tables recurse via
    ``_extract_simple``; non-subquery parens after FROM/JOIN (e.g.
    VALUES lists) are left untouched."""
    pos, n = 0, 0
    while True:
        m = _DERIVED_OPEN_RE.search(sql, pos)
        if not m:
            return sql
        open_i = m.end() - 1
        depth, k = 1, open_i + 1
        while k < len(sql) and depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        body = sql[open_i + 1 : k - 1].strip()
        if not re.match(r"(?:WITH|SELECT)\b", body, re.IGNORECASE):
            pos = m.end()
            continue
        am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", sql[k:])
        alias = (
            am.group(1)
            if am and am.group(1).lower() not in _NOT_AN_ALIAS
            else None
        )
        name = alias or f"__derived{n}"
        n += 1
        resolved[name] = _extract_simple(body, None, resolved)
        end = k + (am.end() if alias else 0)
        head = sql[: m.start()] + m.group(1) + " " + name
        pos = len(head)
        sql = head + sql[end:]


def _extract_simple(
    sql: str,
    default_table: str | None = None,
    ctes: dict[str, list[ColumnLineage]] | None = None,
) -> list[ColumnLineage]:
    ctes = dict(ctes) if ctes else {}
    sql = _hoist_derived_tables(sql, ctes)
    m = _SELECT_RE.search(sql)
    if not m:
        return []
    body = m.group(1)

    # alias -> table map from FROM/JOIN clauses
    aliases: dict[str, str] = {}
    tables: list[str] = []
    for rx in (_FROM_RE, _JOIN_RE):
        for tm in rx.finditer(sql):
            table, alias = tm.group(1), tm.group(2)
            tables.append(table)
            if alias and alias.lower() not in ("on", "where", "group", "order", "left",
                                               "right", "inner", "outer", "cross", "join"):
                aliases[alias] = table
    primary = default_table or (tables[0] if tables else None)

    out: list[ColumnLineage] = []
    for item in _split_select_items(body):
        if item == "*" or item.endswith(".*"):
            qual = item[:-2] if item.endswith(".*") else None
            star_table = aliases.get(qual, qual) if qual else primary
            if star_table in ctes:
                # a CTE's output columns are known — expand like the
                # analyzer does, tracing each through to base tables
                for cl in ctes[star_table]:
                    out.append(
                        ColumnLineage(
                            column=cl.column,
                            sources=list(cl.sources),
                            transformations=[],
                        )
                    )
            else:
                out.append(
                    ColumnLineage(column="*", sources=[(star_table or "?", "*")],
                                  transformations=["passthrough"])
                )
            continue
        am = _ALIAS_RE.match(item)
        bare = re.fullmatch(r"(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)", item.strip())
        if bare:
            # unaliased plain column: output name is the column itself
            expr, alias = item, bare.group(2)
        elif am and "(" not in am.group(2):
            expr, alias = am.group(1), am.group(2)
            if expr.strip().lower().endswith(("as",)):
                expr, alias = item, item
        else:
            expr, alias = item, item
        fns = [f.lower() for f in _FN_RE.findall(expr) if f.lower() not in _SQL_KEYWORDS]
        sources = []
        for qm in _COLREF_RE.finditer(expr):
            qual, col = qm.group(1), qm.group(2)
            if col.lower() in _SQL_KEYWORDS or col.lower() in {f.lower() for f in fns}:
                continue
            if qual:
                sources.append((aliases.get(qual, qual), col))
            else:
                sources.append((primary or "?", col))
        # dedup preserving order
        seen = set()
        uniq = [s for s in sources if not (s in seen or seen.add(s))]
        out.append(
            ColumnLineage(
                column=alias.strip(),
                sources=_resolve_through_ctes(uniq, ctes),
                transformations=sorted(set(fns)),
            )
        )
    return out


def extract_column_lineage_spark(spark, sql: str) -> list[ColumnLineage]:
    """Analyzer-grade lineage: run ``sql`` through Spark's analyzer
    (no execution — LIMIT-0 semantics are irrelevant, only the plan is
    read) and map every output column to its source (table, column)
    pairs by walking attribute expression-ids down to leaf relations.

    Provenance names come from the innermost ``SubqueryAlias`` wrapping
    each relation — i.e. the view/table name as referenced, with user
    aliases resolved away."""
    jplan = spark.sql(sql)._jdf.queryExecution().analyzed()
    origins: dict[int, set] = {}  # exprId -> {(table, col)}
    cte_defs: dict[int, list] = {}  # cteId -> [attr exprIds in order]

    def seq(s):
        return [s.apply(i) for i in range(s.size())]

    def attr_refs(expr):
        it = expr.references().iterator()
        while it.hasNext():
            yield it.next()

    def named_outputs(node, kind):
        if kind == "Project":
            return seq(node.projectList())
        if kind == "Aggregate":
            return seq(node.aggregateExpressions())
        if kind == "Window":
            return seq(node.windowExpressions())
        return []

    def visit(node, alias=None):
        kind = node.getClass().getSimpleName()
        if kind == "SubqueryAlias":
            visit(node.child(), alias=node.alias())
            return
        if kind == "View":
            # provenance boundary: this subtree IS the named view
            for a in seq(node.output()):
                origins[a.exprId().id()] = {(alias or "?", a.name())}
            return
        if kind == "WithCTE":
            for d in seq(node.cteDefs()):
                visit(d.child(), alias)
                cte_defs[d.id()] = [
                    a.exprId().id() for a in seq(d.child().output())
                ]
            visit(node.plan(), alias)
            return
        if kind == "CTERelationRef":
            src_ids = cte_defs.get(node.cteId(), [])
            for a, sid in zip(seq(node.output()), src_ids):
                origins[a.exprId().id()] = set(origins.get(sid, set()))
            return
        children = seq(node.children())
        if not children:
            # leaf relation (catalog table / files / local data)
            for a in seq(node.output()):
                origins[a.exprId().id()] = {(alias or kind, a.name())}
            return
        for c in children:
            visit(c, alias)
        if kind == "Union":
            outs = seq(node.output())
            per_child = [seq(c.output()) for c in children]
            for i, a in enumerate(outs):
                merged = set()
                for co in per_child:
                    if i < len(co):
                        merged |= origins.get(co[i].exprId().id(), set())
                origins[a.exprId().id()] = merged
            return
        if kind == "Generate":
            gen_src = set()
            for r in attr_refs(node.generator()):
                gen_src |= origins.get(r.exprId().id(), set())
            for a in seq(node.generatorOutput()):
                origins[a.exprId().id()] = set(gen_src)
        for ne in named_outputs(node, kind):
            src = set()
            for r in attr_refs(ne):
                src |= origins.get(r.exprId().id(), set())
            existing = origins.setdefault(ne.exprId().id(), set())
            existing.update(src)

    visit(jplan)

    # transformation names from the top-level named expressions' SQL
    fns_by_id: dict[int, list] = {}
    top = jplan
    while top.getClass().getSimpleName() in ("WithCTE", "SubqueryAlias"):
        top = (
            top.plan()
            if top.getClass().getSimpleName() == "WithCTE"
            else top.child()
        )
    kind = top.getClass().getSimpleName()
    for ne in named_outputs(top, kind):
        try:
            fns = [
                f.lower()
                for f in _FN_RE.findall(ne.sql())
                if f.lower() not in _SQL_KEYWORDS
            ]
        except Exception:
            fns = []
        fns_by_id[ne.exprId().id()] = sorted(set(fns))

    out = []
    for a in seq(jplan.output()):
        eid = a.exprId().id()
        out.append(
            ColumnLineage(
                column=a.name(),
                sources=sorted(origins.get(eid, set())),
                transformations=fns_by_id.get(eid, []),
            )
        )
    return out


class LineageGraph:
    """Model-level column lineage with downstream impact closure
    (reference: utils/lineage.py:116-194)."""

    def __init__(self):
        # (model, column) -> list[(src_model, src_column)]
        self.edges: dict[tuple, list] = {}

    def add_model(self, model: str, lineage: list[ColumnLineage]) -> None:
        for cl in lineage:
            self.edges[(model, cl.column)] = list(cl.sources)

    def downstream(self, table: str, column: str) -> set:
        """All (model, column) pairs transitively derived from the
        given source column (reference: lineage.py:116-137)."""
        impacted: set[tuple] = set()
        frontier = {(table, column)}
        changed = True
        while changed:
            changed = False
            for (model, col), sources in self.edges.items():
                if (model, col) in impacted:
                    continue
                for s in sources:
                    if s in frontier or s in impacted or s == (table, "*"):
                        impacted.add((model, col))
                        changed = True
                        break
        return impacted

    def to_dot(self) -> str:
        lines = ["digraph lineage {", "  rankdir=LR;"]
        for (model, col), sources in sorted(self.edges.items()):
            for (st, sc) in sources:
                lines.append(f'  "{st}.{sc}" -> "{model}.{col}";')
        lines.append("}")
        return "\n".join(lines)
