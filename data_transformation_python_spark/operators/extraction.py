"""Document-extraction front door: HTML → clean text with
boilerplate stripping — the trafilatura/jusText shape, as a pure
JVM expression pipeline (regexp + array higher-order functions, no
Python row loop anywhere).

A 100 TB text corpus arrives as markup, not clean text.  The operator
implements the classic density-based extraction cascade:

1. drop ``<script>``/``<style>`` containers and HTML comments
   (dotall non-greedy regexes — their CONTENT is never text);
2. segment what remains into blocks on block-level tags
   (p/div/headings/lists/table cells/nav/footer/…);
3. per block, measure (a) the visible text length after tag
   stripping, entity decoding and whitespace normalization and
   (b) the LINK DENSITY — characters inside ``<a>…</a>`` anchors
   over total visible characters;
4. keep blocks that are long enough (``min_chars``) and not
   link-dominated (``3·link_chars < len`` ⇒ density < ⅓) — the
   jusText "good block" heuristic that kills navs, footers, and ad
   units while keeping body paragraphs;
5. concatenate kept blocks.

Every step is a deterministic string computation shared with the
DuckDB oracle through per-dialect expression builders (the
``(col, dialect)`` pattern of text.py's BPE oracle): the patterns are
restricted to the Java-regex ∩ RE2 common subset (no lookaround, no
backrefs), lengths are exact integer char counts, and the keep rule is
an integer inequality — so extraction replays bit-for-bit.

Scale posture: the whole pipeline is ONE narrow codegen'd projection
per document — zero shuffles, zero UDFs; it runs at parquet-scan
speed and composes in front of every downstream text operator.

No reference counterpart; LLM-pipeline extension surface (SURVEY.md
§2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_extract",
    "html_extract_expr",
    "synth_html_expr",
]

_BLOCK_TAGS = (
    "p|div|nav|footer|header|article|section|aside|title|head|body|"
    "html|h[1-6]|li|ul|ol|br|table|tr|td"
)
# tag name must be followed by a space, "/", or ">" — RE2 has no
# lookahead, so the optional attribute tail is an explicit alternative
# (keeps <pre>/<param> from prefix-matching p)
_SPLIT_PAT = f"</?(?:{_BLOCK_TAGS})(?:[ /][^>]*)?>"
_SCRIPT_PAT = "(?s)<script[^>]*>.*?</script>"
_STYLE_PAT = "(?s)<style[^>]*>.*?</style>"
_COMMENT_PAT = "(?s)<!--.*?-->"
_ANCHOR_PAT = "(?s)<a[^>]*>(.*?)</a>"
_TAG_PAT = "<[^>]*>"
_WS_PAT = "[ \\t\\r\\n]+"


def _re_replace(x: str, pat: str, rep: str, dialect: str) -> str:
    if dialect == "spark":
        return f"regexp_replace({x}, '{pat}', '{rep}')"
    return f"regexp_replace({x}, '{pat}', '{rep}', 'g')"


def _decode_entities(x: str, dialect: str) -> str:
    """The five entities the fixture corpus uses; ``&amp;`` decodes
    LAST so ``&amp;lt;`` round-trips as the literal ``&lt;``."""
    for ent, rep in (
        ("'&nbsp;'", "' '"),
        ("'&lt;'", "'<'"),
        ("'&gt;'", "'>'"),
        ("'&quot;'", "chr(34)"),
        ("'&#39;'", "chr(39)"),
        ("'&amp;'", "'&'"),
    ):
        x = f"replace({x}, {ent}, {rep})"
    return x


def _norm_block(b: str, dialect: str) -> str:
    """Visible text of one block: strip tags → decode entities →
    collapse whitespace → trim."""
    stripped = _re_replace(b, _TAG_PAT, " ", dialect)
    decoded = _decode_entities(stripped, dialect)
    return f"trim({_re_replace(decoded, _WS_PAT, ' ', dialect)})"


def _link_chars(b: str, dialect: str) -> str:
    """Total characters inside <a>…</a> anchors of one block."""
    extracted = f"regexp_extract_all({b}, '{_ANCHOR_PAT}', 1)"
    if dialect == "spark":
        return (
            f"aggregate({extracted}, CAST(0 AS BIGINT),"
            f" (acc, x) -> acc + length(x))"
        )
    return (
        f"CAST(COALESCE(list_sum(list_transform({extracted},"
        f" x -> length(x))), 0) AS BIGINT)"
    )


def html_extract_expr(
    html: str,
    dialect: str,
    *,
    min_chars: int = 25,
) -> dict[str, str]:
    """Expression fragments for the extraction cascade over an html
    string column: returns ``{"blocks", "kept", "extracted"}`` —
    compose them as nested SQL in either dialect."""
    c = _re_replace(html, _SCRIPT_PAT, " ", dialect)
    c = _re_replace(c, _STYLE_PAT, " ", dialect)
    c = _re_replace(c, _COMMENT_PAT, " ", dialect)
    if dialect == "spark":
        blocks = f"split({c}, '{_SPLIT_PAT}')"
        t_fn, f_fn, join_fn = "transform", "filter", "array_join"
    else:
        blocks = f"regexp_split_to_array({c}, '{_SPLIT_PAT}')"
        t_fn, f_fn, join_fn = "list_transform", "list_filter", "array_to_string"
    norm = _norm_block("b", dialect)
    links = _link_chars("b", dialect)
    keep = (
        f"length({norm}) >= {min_chars}"
        f" AND 3 * {links} < length({norm})"
    )
    kept = f"{t_fn}({f_fn}({blocks}, b -> {keep}), b -> {norm})"
    extracted = f"{join_fn}({kept}, chr(10))"
    return {"blocks": blocks, "kept": kept, "extracted": extracted}


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    *,
    min_chars: int = 25,
) -> DataFrame:
    """Extract clean text from an HTML column — one shuffle-free
    projection per document.

    Output: (doc_id, n_blocks, n_kept, extracted_len, extracted).
    """
    e = html_extract_expr(html_col, "spark", min_chars=min_chars)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"CAST(size({e['blocks']}) AS BIGINT)").alias("n_blocks"),
        F.expr(f"CAST(size({e['kept']}) AS BIGINT)").alias("n_kept"),
        F.expr(f"CAST(length({e['extracted']}) AS BIGINT)").alias(
            "extracted_len"
        ),
        F.expr(e["extracted"]).alias("extracted"),
    )


def synth_html_expr(
    text: str,
    doc_id: str,
    dialect: str,
    *,
    chunk: int = 16,
) -> str:
    """Deterministic markup fixture: wrap a clean-text column in the
    page furniture a crawler actually sees — head with style/script
    junk, repeated nav links (link-dominated), body paragraphs of
    ``chunk`` tokens each, an ad div on even doc_ids, an entity-bearing
    lead paragraph, and a footer.  Pure string algebra shared by both
    dialects, so the oracle rebuilds the identical page."""
    if dialect == "spark":
        toks = f"split({text}, ' ')"
        n = f"size({toks})"
        cast_s = f"CAST({doc_id} AS STRING)"
        paras = (
            f"array_join(transform(sequence(1, CAST(({n} + {chunk - 1})"
            f" div {chunk} AS INT)), i -> concat('<p>',"
            f" array_join(slice({toks}, (i - 1) * {chunk} + 1, {chunk}),"
            f" ' '), '</p>')), '')"
        )
        nav_rep = f"repeat({_NAV!r}, CAST({doc_id} % 3 + 1 AS INT))"
    else:
        toks = f"string_split({text}, ' ')"
        n = f"len({toks})"
        cast_s = f"CAST({doc_id} AS VARCHAR)"
        paras = (
            f"array_to_string(list_transform(generate_series(1,"
            f" CAST(({n} + {chunk - 1}) // {chunk} AS BIGINT)),"
            f" i -> '<p>' || array_to_string({toks}[(i - 1) * {chunk} + 1"
            f" : i * {chunk}], ' ') || '</p>'), '')"
        )
        nav_rep = f"repeat({_NAV!r}, CAST({doc_id} % 3 + 1 AS BIGINT))"
    return (
        f"'<html><head><title>Doc ' || {cast_s} || '</title>'"
        f" || '<style>.c{{color:#fff}}</style>'"
        f" || '<script type=\"text/javascript\">var id=' || {cast_s}"
        f" || ';track();</script></head><body>' || {nav_rep}"
        f" || '<div class=\"content\">{_LEAD}' || {paras} || '</div>'"
        f" || CASE WHEN {doc_id} % 2 = 0 THEN {_AD!r} ELSE '' END"
        f" || '<footer>&amp; corp co</footer></body></html>'"
    )


_NAV = '<nav><a href="/h">home page link</a> <a href="/a">about us page</a></nav>'
_AD = '<div class="ad">BUY <a href="#">NOW</a></div>'
_LEAD = (
    "<p>A &quot;quoted&quot; lead &amp; intro paragraph that survives"
    " extraction, it&#39;s long enough to keep.</p>"
)
