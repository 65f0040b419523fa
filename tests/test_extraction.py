"""HTML-to-text extraction (operators/extraction.py).

Oracle parity pins the synth→extract pipeline cross-engine; these
tests pin the extraction SEMANTICS on hand-built pages where the
expected output is known by eye: script/style/comment content must
never leak, link-dominated blocks must drop, entities must decode,
and short fragments must be rejected.
"""

from __future__ import annotations

from data_transformation_python_spark.operators import extraction as ex


def _extract(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return ex.html_extract(df).collect()[0].asDict()


def test_script_style_comment_content_never_leaks(spark):
    out = _extract(
        spark,
        "<html><head><style>.x{secretcss:1}</style>"
        "<script>var secretjs = 'leaky string here';</script></head>"
        "<body><!-- secretcomment --><p>This paragraph is the only "
        "visible content and easily long enough.</p></body></html>",
    )
    assert "secret" not in out["extracted"]
    assert out["n_kept"] == 1
    assert out["extracted"].startswith("This paragraph")


def test_link_dominated_block_drops_text_block_stays(spark):
    out = _extract(
        spark,
        '<body><nav><a href="/">navigation link one</a> '
        '<a href="/">navigation link two</a></nav>'
        "<p>Plain prose with one small <a href=\"#\">ref</a> inside "
        "a much longer sentence survives.</p></body>",
    )
    assert out["n_kept"] == 1
    assert "navigation" not in out["extracted"]
    assert "Plain prose" in out["extracted"]
    # the anchor inside the kept block is stripped to its text
    assert "ref" in out["extracted"] and "href" not in out["extracted"]


def test_entities_decode_and_whitespace_collapses(spark):
    out = _extract(
        spark,
        "<p>A &quot;b&quot;   c&nbsp;&amp;\n\td, it&#39;s &lt;tagless&gt; "
        "and definitely long enough to keep around.</p>",
    )
    assert out["extracted"].startswith('A "b" c & d, it\'s <tagless>')
    assert "  " not in out["extracted"]


def test_short_blocks_reject(spark):
    out = _extract(spark, "<p>too short</p><div>also tiny</div>")
    assert out["n_kept"] == 0 and out["extracted"] == ""


def test_pre_tag_does_not_split(spark):
    # <pre> is not a configured block tag and must not prefix-match p
    out = _extract(
        spark,
        "<p>alpha beta gamma delta <pre>epsilon</pre> zeta eta theta "
        "iota kappa together one block.</p>",
    )
    assert out["n_kept"] == 1
    assert "epsilon" in out["extracted"]


# -- property-based fuzz: the extractor must be total and safe --------------
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_FRAG = st.one_of(
    st.text(
        alphabet="abcdefgh <>/&;#\"'.!\n\t=-", min_size=0, max_size=30
    ),
    st.sampled_from(
        [
            "<script>var x = 'evil';</script>",
            "<style>.a{b:c}</style>",
            "<p>a paragraph that is certainly long enough to keep</p>",
            "<div class='x'>",
            "</div>",
            "<a href='#'>link text</a>",
            "<!-- comment -->",
            "&amp;&lt;&gt;&quot;&#39;&nbsp;",
            "<br/>",
            "<p",  # unterminated tag
            "</p></p>",
        ]
    ),
)


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=30, deadline=None)
@given(st.lists(_FRAG, min_size=0, max_size=12))
def test_html_extract_total_on_arbitrary_markup(spark, frags):
    """Any tag soup must extract without throwing, never leak script
    or style CONTENT that was properly delimited, and keep counts
    consistent."""
    html = "".join(frags)
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    from data_transformation_python_spark.operators import extraction as ex

    out = ex.html_extract(df).collect()[0].asDict()
    assert out["n_kept"] <= out["n_blocks"]
    assert out["extracted_len"] == len(out["extracted"])
    if "<script>var x = 'evil';</script>" in html:
        assert "evil" not in out["extracted"]
    # kept blocks honor the minimum-length rule
    for block in out["extracted"].split("\n"):
        if block:
            assert len(block) >= 25


# -- dirty-markup cascade (html_extract(dirty=True)) -------------------------


def _extract_dirty(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return ex.html_extract(df, dirty=True).collect()[0].asDict()


def test_numeric_character_references_decode(spark):
    out = _extract_dirty(
        spark,
        "<p>It&#8217;s d&#233;j&#224; &#x2014; gr&#xFC;n &#65;. and a "
        "wide &#128512; plus padding to pass the length rule.</p>",
    )
    assert "It’s déjà — grün A." in out["extracted"]
    assert "\U0001F600" in out["extracted"]  # supra-BMP surrogate path


def test_invalid_and_escaped_numeric_refs_stay_literal(spark):
    out = _extract_dirty(
        spark,
        "<p>&#xD800; surrogate and &#1114112; overflow and &#0; zero "
        "and &amp;#66; escaped all stay literal, padded long enough.</p>",
    )
    for literal in ("&#xD800;", "&#1114112;", "&#0;", "&#66;"):
        assert literal in out["extracted"], literal
    # the escaped form must NOT double-decode to the letter B
    assert " B " not in out["extracted"]


def test_quoted_gt_attribute_does_not_bleed(spark):
    out = _extract_dirty(
        spark,
        '<div data-note="id > 0" class="m"><p>Visible paragraph body '
        "comfortably past the minimum length.</p></div>",
    )
    assert out["extracted"].startswith("Visible paragraph")
    assert '">' not in out["extracted"] and "id > 0" not in out["extracted"]


def test_cdata_and_truncated_tail_never_leak(spark):
    out = _extract_dirty(
        spark,
        "<p>Real content sentence that is clearly long enough to "
        "keep.</p><![CDATA[ junk <p>cdatainner</p> ]]>"
        '<img src="truncated-at-eof',
    )
    assert "cdatainner" not in out["extracted"]
    assert "junk" not in out["extracted"]
    assert "truncated-at-eof" not in out["extracted"]
    assert out["extracted"].startswith("Real content")


def test_clean_default_sql_unchanged():
    """dirty=False must emit byte-identical SQL to the pre-dirty
    builder — existing gate results and plan fingerprints depend on
    it.  Pin by asserting none of the dirty-only constructs appear."""
    for dialect in ("spark", "duckdb"):
        e = ex.html_extract_expr("html", dialect)
        blob = "||".join(e.values())
        assert "CDATA" not in blob
        assert "'&#')" not in blob  # numeric-ref split absent
        assert "UTF-16BE" not in blob and "chr(CAST" not in blob


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=30, deadline=None)
@given(st.lists(_FRAG, min_size=0, max_size=12))
def test_html_extract_dirty_total_on_arbitrary_markup(spark, frags):
    """The hardened cascade must be total on the same tag soup (plus
    numeric-ref shrapnel the base alphabet already generates via
    '&', '#' and digits-free hex letters), leak nothing, and keep
    counts consistent."""
    html = "".join(frags)
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = ex.html_extract(df, dirty=True).collect()[0].asDict()
    assert out["n_kept"] <= out["n_blocks"]
    assert out["extracted_len"] == len(out["extracted"])
    if "<script>var x = 'evil';</script>" in html:
        assert "evil" not in out["extracted"]
    for block in out["extracted"].split("\n"):
        if block:
            assert len(block) >= 25


# -- cross-engine fuzz: Spark and DuckDB must agree on ARBITRARY soup --------

_DIRTY_FRAG = st.one_of(
    st.text(
        alphabet="abcdefgh <>/&;#\"'.!\n\t=-0123456789xX", min_size=0,
        max_size=24,
    ),
    st.sampled_from(
        [
            "&#65;", "&#x41;", "&#8217;", "&#128512;",       # valid refs
            "&#xD800;", "&#1114112;", "&#0;", "&#",          # invalid/cut
            "&amp;#66;",                                       # escaped
            "<![CDATA[ x<y ]]>",
            '<div data-a="1 > 2">',
            "<p>a paragraph that is certainly long enough to keep</p>",
            "<p", "</p></p>", "<img src=\"trunc",             # truncation
            "<script>var x = 'evil';</script>",
            "<a href='#'>link text</a>",
        ]
    ),
)


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=15, deadline=None)
@given(st.lists(_DIRTY_FRAG, min_size=0, max_size=10))
def test_html_extract_dirty_cross_engine_parity(spark, frags):
    """The dirty cascade's dual-dialect expression builders must
    produce IDENTICAL (n_blocks, n_kept, extracted) in Spark and
    DuckDB on arbitrary tag soup — not just on the fixture grammars
    the oracle gates replay.  Documents travel as a registered
    relation (no SQL-literal escaping in play on either side)."""
    import duckdb
    import pyarrow as pa

    html = "".join(frags)
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    srow = ex.html_extract(df, dirty=True).collect()[0]

    con = duckdb.connect()
    con.register("pages", pa.table({"doc_id": [1], "html": [html]}))
    e = ex.html_extract_expr("html", "duckdb", dirty=True)
    drow = con.execute(
        f"SELECT CAST(len({e['blocks']}) AS BIGINT) AS n_blocks,"
        f" CAST(len({e['kept']}) AS BIGINT) AS n_kept,"
        f" {e['extracted']} AS extracted FROM pages"
    ).fetchone()
    assert (srow["n_blocks"], srow["n_kept"], srow["extracted"]) == (
        drow[0], drow[1], drow[2]
    ), html
