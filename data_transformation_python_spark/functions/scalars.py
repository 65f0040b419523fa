"""Scalar-function dialect surface.

The framework-emitted scalar surface (SURVEY §2.7) is Spark-native
already: CURRENT_TIMESTAMP(), COALESCE, DATE_TRUNC, CAST, UPPER,
TRIM, MAX and literal encodings are identical in Spark SQL.  What
needs a shim is user model SQL written against Snowflake — the
reference parses with ``read='snowflake'`` (reference:
parser.py:361,386,498).  sqlglot is unavailable here, so this module
ships a targeted textual transpiler for the Snowflake-isms that
actually appear in the reference's model corpus, and documents the
rest as unsupported (fail loudly rather than mis-execute).
"""

from __future__ import annotations

import re

#: direct function/type renames (case-insensitive, word-boundary)
SNOWFLAKE_TO_SPARK: dict[str, str] = {
    # types
    "TIMESTAMP_NTZ": "TIMESTAMP_NTZ",  # Spark 3.4+ native
    "TIMESTAMP_LTZ": "TIMESTAMP",
    "TIMESTAMP_TZ": "TIMESTAMP",
    "NUMBER": "DECIMAL",
    "VARIANT": "STRING",
    # functions
    "IFF": "IF",
    "NVL": "COALESCE",
    "TO_VARCHAR": "CAST",  # handled specially below
    "LISTAGG": "ARRAY_JOIN",  # handled specially below
    "SYSDATE": "CURRENT_TIMESTAMP",
    "GETDATE": "CURRENT_TIMESTAMP",
}

_SIMPLE_RENAMES = {
    "IFF": "IF",
    "NVL": "COALESCE",
    "SYSDATE": "CURRENT_TIMESTAMP",
    "GETDATE": "CURRENT_TIMESTAMP",
    "TIMESTAMP_LTZ": "TIMESTAMP",
    "TIMESTAMP_TZ": "TIMESTAMP",
}

_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_UNSUPPORTED = ("FLATTEN(", "LATERAL FLATTEN", "MATCH_RECOGNIZE", "PIVOT (")


class UnsupportedDialectFeature(ValueError):
    pass


def rewrite_qualify(sql: str) -> str:
    """``SELECT ... QUALIFY <pred>`` → subquery + outer WHERE.

    Open-source Spark has no QUALIFY (SURVEY §4); this rewrite wraps
    the query and hoists the window predicate.  Handles the common
    single-SELECT shape used by the reference's silver models
    (reference: sql/models/silver/example_with_ref.sql.example:14-17).
    """
    m = _QUALIFY_RE.search(sql)
    if not m:
        return sql
    head, tail = sql[: m.start()], sql[m.end() :]
    # predicate runs to end of statement (the reference corpus never
    # follows QUALIFY with ORDER BY/LIMIT)
    pred = tail.strip().rstrip(";")
    # name the window expr, select it in the inner query
    win_m = re.search(r"(.+?)\s*(=|<=|<|>|>=)\s*(\d+)\s*$", pred, re.DOTALL)
    if not win_m:
        raise UnsupportedDialectFeature(f"cannot rewrite QUALIFY predicate: {pred!r}")
    win_expr, op, bound = win_m.groups()
    inner = re.sub(
        r"\bSELECT\b",
        f"SELECT {win_expr.strip()} AS __qualify_rn,",
        head,
        count=1,
        flags=re.IGNORECASE,
    )
    return (
        "SELECT * EXCEPT (__qualify_rn) FROM (\n"
        + inner.strip()
        + f"\n) WHERE __qualify_rn {op} {bound}"
    )


def transpile_snowflake(sql: str) -> str:
    """Best-effort Snowflake → Spark SQL rewrite for the reference's
    model corpus; raises on constructs with no faithful rewrite."""
    upper = sql.upper()
    for bad in _UNSUPPORTED:
        if bad in upper:
            raise UnsupportedDialectFeature(
                f"Snowflake construct {bad.strip('(')} has no automatic Spark rewrite"
            )
    out = sql
    for sf, sp in _SIMPLE_RENAMES.items():
        out = re.sub(rf"\b{sf}\b", sp, out, flags=re.IGNORECASE)
    # TO_VARCHAR(x) → CAST(x AS STRING)
    out = re.sub(
        r"\bTO_VARCHAR\s*\(([^()]+)\)",
        r"CAST(\1 AS STRING)",
        out,
        flags=re.IGNORECASE,
    )
    # LISTAGG(x, sep) → ARRAY_JOIN(COLLECT_LIST(x), sep)
    out = re.sub(
        r"\bLISTAGG\s*\(([^(),]+),\s*([^()]+)\)",
        r"ARRAY_JOIN(COLLECT_LIST(\1), \2)",
        out,
        flags=re.IGNORECASE,
    )
    # DATEADD(part, n, d) → TIMESTAMPADD(part, n, d) (Spark 3.3+).
    # Snowflake accepts a QUOTED part ('day') but Spark's unit must be
    # an unquoted keyword — strip the quotes during the rewrite.
    out = re.sub(
        r"\bDATEADD\s*\(\s*'(\w+)'\s*,",
        r"TIMESTAMPADD(\1,",
        out,
        flags=re.IGNORECASE,
    )
    out = re.sub(r"\bDATEADD\s*\(", "TIMESTAMPADD(", out, flags=re.IGNORECASE)
    # 3-arg DATEDIFF(part, a, b) → TIMESTAMPDIFF; Spark's own 2-arg
    # DATEDIFF(end, start) is left untouched (a 2-arg call cannot
    # match the three comma-separated groups).  The part may be
    # quoted (stripped, as above) and each arg may carry one paren
    # level (e.g. CAST(a AS DATE)).
    _darg = r"(?:[^(),]|\([^()]*\))+"
    out = re.sub(
        rf"\bDATEDIFF\s*\(\s*'?(\w+)'?\s*,\s*({_darg})\s*,\s*({_darg})\s*\)",
        r"TIMESTAMPDIFF(\1, \2, \3)",
        out,
        flags=re.IGNORECASE,
    )
    # ZEROIFNULL(x) → COALESCE(x, 0); NULLIFZERO(x) → NULLIF(x, 0)
    # (argument may itself contain one paren level, e.g. CAST(...));
    # deeper nesting is left untouched and fails loudly in Spark
    _arg = r"((?:[^()]|\([^()]*\))+)"
    out = re.sub(
        rf"\bZEROIFNULL\s*\({_arg}\)", r"COALESCE(\1, 0)", out, flags=re.IGNORECASE
    )
    out = re.sub(
        rf"\bNULLIFZERO\s*\({_arg}\)", r"NULLIF(\1, 0)", out, flags=re.IGNORECASE
    )
    # 2-arg REGEXP_SUBSTR(s, p) → REGEXP_EXTRACT(s, p, 0)
    out = re.sub(
        r"\bREGEXP_SUBSTR\s*\(([^(),]+),\s*([^()]+)\)",
        r"REGEXP_EXTRACT(\1, \2, 0)",
        out,
        flags=re.IGNORECASE,
    )
    # TO_NUMBER / TRY_TO_NUMBER → CAST / TRY_CAST with Snowflake's
    # default NUMBER(38,0), or the explicit (precision, scale)
    out = re.sub(
        r"\b(TRY_)?TO_NUMBER\s*\(([^(),]+)\)",
        lambda m: f"{'TRY_' if m.group(1) else ''}CAST({m.group(2)} AS DECIMAL(38,0))",
        out,
        flags=re.IGNORECASE,
    )
    out = re.sub(
        r"\b(TRY_)?TO_NUMBER\s*\(([^(),]+),\s*(\d+)\s*,\s*(\d+)\s*\)",
        lambda m: (
            f"{'TRY_' if m.group(1) else ''}CAST({m.group(2)} "
            f"AS DECIMAL({m.group(3)},{m.group(4)}))"
        ),
        out,
        flags=re.IGNORECASE,
    )
    # OBJECT_CONSTRUCT('k', v, ...) → TO_JSON(NAMED_STRUCT(...)):
    # Snowflake's VARIANT object becomes its faithful portable form, a
    # JSON string (same key/value pairs; args pass through verbatim)
    _oargs = r"((?:[^()]|\([^()]*\))*)"
    out = re.sub(
        rf"\bOBJECT_CONSTRUCT\s*\({_oargs}\)",
        r"TO_JSON(NAMED_STRUCT(\1))",
        out,
        flags=re.IGNORECASE,
    )
    # 2-arg CONVERT_TIMEZONE(target_tz, ts) interprets ts in the
    # session zone; Spark's 3-arg convert_timezone needs the source
    # zone spelled out
    out = re.sub(
        rf"\bCONVERT_TIMEZONE\s*\(\s*('[^']+')\s*,\s*((?:[^(),]|\([^()]*\))+)\s*\)",
        r"CONVERT_TIMEZONE(current_timezone(), \1, \2)",
        out,
        flags=re.IGNORECASE,
    )
    out = rewrite_qualify(out)
    return out
