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
    "synth_html_dirty_expr",
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

# -- dirty-markup additions (real-web HTML the clean grammar lacks) --
# Quote-aware attribute tail: a '>' inside a quoted attribute value
# must not terminate the tag (RE2-safe — alternation of quoted runs,
# no lookaround/backrefs, shared verbatim by Java regex and RE2).
_ATTR_Q = "[^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*"
_SPLIT_PAT_Q = f"</?(?:{_BLOCK_TAGS})(?:[ /]{_ATTR_Q})?>"
_TAG_PAT_Q = f"<{_ATTR_Q}>"
# CDATA sections are never visible text (XML-ism; HTML parsers treat
# them as bogus comments) — strip whole, like script/style.  Pattern
# written at REGEX level (single backslashes); _sql_pat doubles them
# for Spark's escape-processing string parser.
_CDATA_PAT = "(?s)<!\\[CDATA\\[.*?\\]\\]>"
# A truncated page ending mid-tag: strip the dangling '<...' tail
# (browsers drop it; without this it leaks as visible text).  \z not
# $: Java's un-flagged $ also matches before a trailing newline,
# RE2's does not — \z is absolute end-of-text in both.
_TRUNC_PAT = "<[^<>]*\\z"


def _sql_pat(pat: str, dialect: str) -> str:
    """Embed a REGEX-level pattern into a SQL string literal.  Spark's
    string parser consumes one backslash level (and '' is the quote
    escape in both engines); DuckDB passes backslashes through to RE2
    untouched."""
    if dialect == "spark":
        pat = pat.replace("\\", "\\\\")
    return pat.replace("'", "''")


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


def _decode_numeric_refs(x: str, dialect: str) -> str:
    """General numeric character references — ``&#NN;`` (decimal) and
    ``&#xNN;``/``&#XNN;`` (hex) — decoded to their Unicode codepoint.

    Pure string algebra, no UDF: split on the literal ``&#``; every
    fragment after the first either starts with ``digits;`` /
    ``x hexdigits;`` (decode the codepoint, keep the rest) or gets its
    ``&#`` restored verbatim.  Spark has no codepoint→char builtin
    (its ``chr`` wraps mod 256), so the char is built by UTF-16BE
    byte decode — one code unit for BMP, an explicit surrogate pair
    above it; DuckDB's ``chr`` is codepoint-native.  Invalid
    codepoints (0, > U+10FFFF, the surrogate range) are left as
    literal text, which keeps the expression total on arbitrary
    input.  Trailing-semicolon-less legacy refs are NOT decoded
    (HTML5 allows them in some positions; we require the ``;``).

    Known divergence from single-pass HTML semantics, by design:
    this runs BEFORE the named-entity cascade, so ``&amp;#65;``
    correctly stays literal ``&#65;``, but the pathological
    ``&#38;lt;`` double-decodes to ``<`` where a browser renders
    ``&lt;`` — the cost of replayable string algebra over a stateful
    parser."""
    if dialect == "spark":
        parts = f"split({x}, '&#')"
        head = f"element_at({parts}, 1)"
        tail = f"slice({parts}, 2, size({parts}) - 1)"
        t_fn, join_fn = "transform", "array_join"
        cp_dec = "CAST(regexp_extract(p, '^([0-9]{1,7});', 1) AS BIGINT)"
        cp_hex = (
            "CAST(conv(regexp_extract(p, '^[xX]([0-9a-fA-F]{1,6});', 1),"
            " 16, 10) AS BIGINT)"
        )

        def chr_of(cp: str) -> str:
            return (
                f"decode(unhex(CASE WHEN {cp} < 65536"
                f" THEN lpad(hex({cp}), 4, '0')"
                f" ELSE concat(lpad(hex(55296 + ({cp} - 65536) div 1024),"
                f" 4, '0'), lpad(hex(56320 + pmod({cp} - 65536, 1024)),"
                f" 4, '0')) END), 'UTF-16BE')"
            )

        def matches(pat: str) -> str:
            return f"p RLIKE '{pat}'"

    else:
        parts = f"string_split({x}, '&#')"
        head = f"{parts}[1]"
        tail = f"{parts}[2:]"
        t_fn, join_fn = "list_transform", "array_to_string"
        # TRY_CAST: CASE conditions need not short-circuit, and DuckDB
        # errors on CAST('' AS BIGINT) for non-ref fragments (Spark's
        # non-ANSI CAST/conv already yield NULL there)
        cp_dec = (
            "TRY_CAST(regexp_extract(p, '^([0-9]{1,7});', 1) AS BIGINT)"
        )
        cp_hex = (
            "TRY_CAST(('0x' || regexp_extract(p,"
            " '^[xX]([0-9a-fA-F]{1,6});', 1)) AS BIGINT)"
        )

        def chr_of(cp: str) -> str:
            return f"chr(CAST({cp} AS INT))"

        def matches(pat: str) -> str:
            return f"regexp_matches(p, '{pat}')"

    def valid(cp: str) -> str:
        return (
            f"{cp} BETWEEN 1 AND 1114111"
            f" AND NOT ({cp} BETWEEN 55296 AND 57343)"
        )

    frag = (
        f"CASE WHEN {matches('^[0-9]{1,7};')} AND {valid(cp_dec)}"
        f" THEN concat({chr_of(cp_dec)},"
        f" {_re_replace('p', '^[0-9]{1,7};', '', dialect)})"
        f" WHEN {matches('^[xX][0-9a-fA-F]{1,6};')} AND {valid(cp_hex)}"
        f" THEN concat({chr_of(cp_hex)},"
        f" {_re_replace('p', '^[xX][0-9a-fA-F]{1,6};', '', dialect)})"
        f" ELSE concat('&#', p) END"
    )
    return f"concat({head}, {join_fn}({t_fn}({tail}, p -> {frag}), ''))"


def _norm_block(b: str, dialect: str, dirty: bool = False) -> str:
    """Visible text of one block: strip tags → decode entities →
    collapse whitespace → trim.  ``dirty`` switches to the
    quote-aware tag pattern and decodes numeric character references
    before the named-entity cascade."""
    stripped = _re_replace(
        b, _sql_pat(_TAG_PAT_Q, dialect) if dirty else _TAG_PAT, " ",
        dialect,
    )
    if dirty:
        stripped = _decode_numeric_refs(stripped, dialect)
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
    dirty: bool = False,
) -> dict[str, str]:
    """Expression fragments for the extraction cascade over an html
    string column: returns ``{"blocks", "kept", "extracted"}`` —
    compose them as nested SQL in either dialect.

    ``dirty=True`` hardens the cascade for real-web markup: CDATA
    sections stripped whole, a dangling truncated tag at EOF dropped,
    quote-aware tag/segmentation patterns (a ``>`` inside a quoted
    attribute no longer terminates the tag), and general numeric
    character references (``&#NN;``/``&#xNN;``) decoded.  The default
    emits byte-identical SQL to the pre-dirty builder, so existing
    plans and fingerprints are untouched."""
    c = _re_replace(html, _SCRIPT_PAT, " ", dialect)
    c = _re_replace(c, _STYLE_PAT, " ", dialect)
    c = _re_replace(c, _COMMENT_PAT, " ", dialect)
    if dirty:
        c = _re_replace(c, _sql_pat(_CDATA_PAT, dialect), " ", dialect)
        c = _re_replace(c, _sql_pat(_TRUNC_PAT, dialect), " ", dialect)
    split_pat = _sql_pat(_SPLIT_PAT_Q, dialect) if dirty else _SPLIT_PAT
    if dialect == "spark":
        blocks = f"split({c}, '{split_pat}')"
        t_fn, f_fn, join_fn = "transform", "filter", "array_join"
    else:
        blocks = f"regexp_split_to_array({c}, '{split_pat}')"
        t_fn, f_fn, join_fn = "list_transform", "list_filter", "array_to_string"
    norm = _norm_block("b", dialect, dirty=dirty)
    links = _link_chars("b", dialect)
    keep = (
        f"length({norm}) >= {min_chars}"
        f" AND 3 * {links} < length({norm})"
    )
    kept = f"{t_fn}({f_fn}({blocks}, b -> {keep}), b -> {norm})"
    extracted = f"{join_fn}({kept}, chr(10))"
    if dialect != "spark":
        # DuckDB's array_to_string over an EMPTY list is NULL where
        # Spark's array_join is '' — a page with zero kept blocks
        # must extract to '' in both engines (caught by the
        # cross-engine fuzz; the fixture grammars always keep >= 1
        # block, so the gates never exercised it)
        extracted = f"COALESCE({extracted}, '')"
    return {"blocks": blocks, "kept": kept, "extracted": extracted}


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    *,
    min_chars: int = 25,
    dirty: bool = False,
) -> DataFrame:
    """Extract clean text from an HTML column — one shuffle-free
    projection per document.  ``dirty=True`` selects the hardened
    real-web cascade (see ``html_extract_expr``).

    Output: (doc_id, n_blocks, n_kept, extracted_len, extracted).
    """
    e = html_extract_expr(html_col, "spark", min_chars=min_chars,
                          dirty=dirty)
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


def synth_html_dirty_expr(
    text: str,
    doc_id: str,
    dialect: str,
    *,
    chunk: int = 16,
) -> str:
    """Messier second fixture grammar — the real-web constructs the
    clean fixture (``synth_html_expr``) never emits, each of which the
    ``dirty=True`` cascade must survive and the clean cascade would
    corrupt:

    - an attribute value CONTAINING ``>`` on a block tag (quote-aware
      segmentation or the tag bleeds into visible text);
    - UNCLOSED ``<p``/mis-nested inline tags (jusText's corpus
      reality: tag soup, not XHTML);
    - a body-level CDATA section wrapping fake markup;
    - general numeric character references — decimal, hex, supra-BMP
      (surrogate-pair path), an invalid surrogate ref that must stay
      literal, and ``&amp;#66;`` which must decode to the LITERAL
      ``&#66;`` (named-after-numeric ordering);
    - on odd doc_ids, a page truncated mid-tag.

    Pure dual-dialect string algebra like the clean fixture, so the
    DuckDB oracle rebuilds the identical page."""
    if dialect == "spark":
        toks = f"split({text}, ' ')"
        n = f"size({toks})"
        cast_s = f"CAST({doc_id} AS STRING)"
        paras = (
            f"array_join(transform(sequence(1, CAST(({n} + {chunk - 1})"
            f" div {chunk} AS INT)), i -> concat('<p class=\"t\">',"
            f" array_join(slice({toks}, (i - 1) * {chunk} + 1, {chunk}),"
            f" ' '))), '')"
        )
    else:
        toks = f"string_split({text}, ' ')"
        n = f"len({toks})"
        cast_s = f"CAST({doc_id} AS VARCHAR)"
        paras = (
            f"array_to_string(list_transform(generate_series(1,"
            f" CAST(({n} + {chunk - 1}) // {chunk} AS BIGINT)),"
            f" i -> '<p class=\"t\">' || array_to_string("
            f"{toks}[(i - 1) * {chunk} + 1 : i * {chunk}], ' ')), '')"
        )
    return (
        f"'<html><head><title>Dirty ' || {cast_s} || '</title>'"
        f" || '<script>//<![CDATA[' || chr(10)"
        f" || 'var a = 1 < 2 && id > ' || {cast_s} || ';' || chr(10)"
        f" || '//]]></script></head><body>'"
        f" || '<div data-note=\"id > 0\" class=\"m\">'"
        f" || {_DIRTY_NAV!r} || {_DIRTY_LEAD!r} || {paras}"
        f" || '<b><i>mis-nested emphasis run kept only when long'"
        f" || ' enough to pass</b></i>'"
        f" || '<![CDATA[ junk <p>never visible text</p> ]]>'"
        f" || '<footer><a href=\"/c\">contact</a> legal</footer>'"
        f" || CASE WHEN {doc_id} % 2 = 1"
        f" THEN '</body></html><img data-x=\"half' ELSE"
        f" '</body></html>' END"
    )


_DIRTY_NAV = (
    '<nav><a href="/x">site navigation one</a>'
    ' <a href="/y">site navigation two</a></nav>'
)
_DIRTY_LEAD = (
    "<p>Lead&#8217;s intro &#x2014; d&#233;j&#224; vu gr&#xFC;n"
    " &#128512; wide, &amp;#66; stays literal, &#xD800; invalid"
    " stays, and this line runs long enough to keep.</p>"
)
