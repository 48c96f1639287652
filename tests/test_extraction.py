"""HTML boilerplate-extraction tests (extraction.py, VERDICT r9
item 1): parser edge cases on handcrafted markup, the link-density
rule at its boundary, the Arrow-batched Spark stage, and the
zero-exchange plan lock."""

from __future__ import annotations

from bigdatafinalproject_hockey_spark.extraction import (
    extract_blocks,
    extract_text,
    extract_html_text_batched,
)
from bigdatafinalproject_hockey_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# pure-Python parser semantics
# ---------------------------------------------------------------------------


def test_script_style_head_and_comments_skipped():
    html = (
        "<html><head><title>t</title><script>var a = '<div>not text</div>';"
        "</script><style>p{}</style></head>"
        "<body><!-- chrome --><p>real text</p>"
        "<noscript>enable js</noscript></body></html>"
    )
    assert extract_blocks(html) == [("real text", "")]


def test_entities_decoded_and_whitespace_collapsed():
    html = "<p>  a &amp; b\n\t c&#32;d  </p>"
    assert extract_blocks(html) == [("a & b c d", "")]


def test_nested_blocks_segment_at_every_boundary():
    html = "<div>a<p>b</p>c</div>"
    assert [t for t, _ in extract_blocks(html)] == ["a", "b", "c"]


def test_inline_tags_do_not_split_blocks():
    html = "<p>one <b>two</b> <i>three</i> four</p>"
    assert extract_blocks(html) == [("one two three four", "")]


def test_void_br_flushes_like_a_block_boundary():
    assert [t for t, _ in extract_blocks("<p>a<br/>b<br>c</p>")] == [
        "a", "b", "c",
    ]


def test_unclosed_tags_and_stray_closers_are_tolerated():
    # trailing text with no closing tags must still flush (close()),
    # and an unmatched </div> / </a> must not underflow the counters.
    html = "</div></a><p>head</p>tail"
    assert [t for t, _ in extract_blocks(html)] == ["head", "tail"]


def test_link_text_attributed_through_nesting():
    html = "<p><a href='/'>go <b>now</b></a> rest</p>"
    assert extract_blocks(html) == [("go now rest", "go now")]


def test_density_boundary_is_closed_at_threshold():
    # 5 link chars / 10 total = exactly 0.5 -> dropped (>= rule);
    # one char less of link text -> kept.
    dropped = "<p><a>abcde</a>fgh i</p>"  # "abcdefgh i" 10 chars, link 5
    kept = "<p><a>abcd</a>fgh ij</p>"  # "abcdfgh ij" 10 chars, link 4
    assert extract_text(dropped) == ("", 0, 1)
    assert extract_text(kept) == ("abcdfgh ij", 1, 0)


def test_empty_blocks_are_elided_not_counted():
    html = "<div></div><div>  </div><p>x</p>"
    assert extract_text(html) == ("x", 1, 0)


def test_document_order_preserved_in_clean_text():
    html = "<h1>first</h1><p>second</p><nav><a>a b c d e</a></nav><p>third</p>"
    clean, kept, dropped = extract_text(html)
    assert clean == "first\nsecond\nthird"
    assert (kept, dropped) == (3, 1)


# ---------------------------------------------------------------------------
# Spark stage + plan lock
# ---------------------------------------------------------------------------


def test_batched_stage_matches_pure_python(spark):
    rows = [
        (1, "<p>hello <a href='/'>x</a> world</p>"),
        (2, "<nav><a>a</a><a>b</a></nav><p>kept text here</p>"),
        (3, "<div>plain</div>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_blocks_kept"], r["n_blocks_dropped"])
        for r in extract_html_text_batched(df).collect()
    }
    for doc_id, html in rows:
        assert got[doc_id] == extract_text(html)


def test_extract_html_plan_is_rowlocal_and_pruned(spark):
    """The registered query must stay ONE Arrow-batched map stage over
    a two-column scan: zero exchanges (raw HTML never shuffles), and
    the documents scan reads only (doc_id, text)."""
    plan = (
        QUERIES["text_extract_html"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    scan = [s for s in plan.split("FileScan parquet") if "documents" in s][0]
    read_schema = scan.split("ReadSchema:")[1]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "source" not in read_schema and "lang" not in read_schema


# ---------------------------------------------------------------------------
# property tests (hypothesis): fixture round-trip + parser total-ness
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    _corpus_token = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
    )

    @settings(max_examples=200, deadline=None)
    @given(
        doc_id=st.integers(min_value=0, max_value=10**12),
        tokens=st.lists(_corpus_token, min_size=1, max_size=40),
    )
    def test_fixture_roundtrip_closed_form(doc_id, tokens):
        """For ANY corpus-charset text, extracting the fixture page
        must reproduce the exact closed form the oracles assume —
        this is the property the value-hash checks rest on."""
        text = " ".join(tokens)
        html = _fixture_html(doc_id, text)
        clean, kept, dropped = extract_text(html)
        expected = f"heading h{doc_id % 100}\n{text} note {doc_id}"
        if doc_id % 2 == 1:
            expected += f"\nsee also item {doc_id} for more context & details"
            assert (kept, dropped) == (3, 2)
        else:
            assert (kept, dropped) == (2, 3)
        assert clean == expected

    @settings(max_examples=300, deadline=None)
    @given(
        soup=st.text(
            alphabet="abc<>/&;!= \"'-pdivscrptyle",
            min_size=0,
            max_size=200,
        )
    )
    def test_parser_is_total_on_tag_soup(soup):
        """The extractor must never raise on arbitrary malformed
        markup (stray brackets, half-open tags, bad entities) — a
        quarantine path upstream may feed it anything."""
        clean, kept, dropped = extract_text(soup)
        assert isinstance(clean, str)
        assert kept >= 0 and dropped >= 0


def _fixture_html(doc_id: int, text: str) -> str:
    """Python twin of extraction.html_fixture_expr (kept in lockstep;
    the Spark/SQL parity tests pin the expression itself)."""
    i = str(doc_id)
    if doc_id % 2 == 1:
        div = (
            f'<div>see also <a href="/item/{i}">item {i}</a> '
            "for more context &amp; details</div>"
        )
    else:
        div = (
            '<div><a href="/r1">related article one</a> '
            '<a href="/r2">related article two</a> extra</div>'
        )
    return (
        f"<html><head><title>doc {i}</title><script>var page={i};"
        "</script><style>p{margin:0}</style></head><body>"
        '<nav><a href="/">home</a> <a href="/about">about</a> '
        '<a href="/contact">contact</a></nav>'
        f"<h1>heading h{doc_id % 100}</h1>"
        f"<!-- boilerplate {i} -->"
        f"<p>{text} <em>note {i}</em></p>"
        f"{div}"
        '<footer><a href="/terms">terms</a> '
        '<a href="/privacy">privacy</a></footer></body></html>'
    )


# ---------------------------------------------------------------------------
# unicode normalization (NFC + control/bidi strip)
# ---------------------------------------------------------------------------


def test_normalize_unicode_known_cases():
    from bigdatafinalproject_hockey_spark.extraction import normalize_unicode

    # NFC composition
    assert normalize_unicode("café") == ("café", 0)
    # singleton mapping (OHM SIGN -> GREEK CAPITAL OMEGA)
    assert normalize_unicode("Ω") == ("Ω", 0)
    # C0 controls stripped, \t \n \r kept (they are whitespace)
    assert normalize_unicode("a\x07b\tc\nd") == ("ab\tc\nd", 1)
    # bidi marks stripped
    assert normalize_unicode("x‎y‪z‬") == ("xyz", 3)
    # bidi ISOLATES stripped too (ADVICE r10: LRI/RLI/FSI/PDI,
    # U+2066-U+2069, grouped with the embeddings by Unicode)
    assert normalize_unicode("a⁦b⁧c⁨d⁩e") == (
        "abcde", 4,
    )


def test_normalize_unicode_nfkc_known_cases():
    from bigdatafinalproject_hockey_spark.extraction import (
        CLEAN_NFKC_SUFFIX,
        DIRTY_NFKC_N_STRIPPED,
        DIRTY_NFKC_SUFFIX,
        normalize_unicode,
    )

    # compatibility folds NFC leaves alone
    assert normalize_unicode("ﬁve", "NFKC") == ("five", 0)
    assert normalize_unicode("５②", "NFKC") == ("52", 0)
    assert normalize_unicode("ﬁve") == ("ﬁve", 0)  # NFC keeps
    # strip classes still apply under NFKC
    assert normalize_unicode("a\x07b⁦c", "NFKC") == ("abc", 2)
    # the registered fixture's closed form
    assert normalize_unicode(DIRTY_NFKC_SUFFIX, "NFKC") == (
        CLEAN_NFKC_SUFFIX,
        DIRTY_NFKC_N_STRIPPED,
    )


def test_normalize_unicode_nfc_fixture_closed_form():
    from bigdatafinalproject_hockey_spark.extraction import (
        CLEAN_SUFFIX,
        DIRTY_N_STRIPPED,
        DIRTY_SUFFIX,
        normalize_unicode,
    )

    assert normalize_unicode(DIRTY_SUFFIX) == (
        CLEAN_SUFFIX,
        DIRTY_N_STRIPPED,
    )


def test_normalize_unicode_plan_rowlocal(spark):
    plan = (
        QUERIES["text_normalize_unicode"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


if HAVE_HYPOTHESIS:
    import unicodedata

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def test_normalize_unicode_total_and_idempotent(s):
        """Totality + idempotence on arbitrary unicode, and ASCII
        printable text is a fixed point."""
        from bigdatafinalproject_hockey_spark.extraction import (
            normalize_unicode,
        )

        out, n = normalize_unicode(s)
        assert n >= 0
        again, n2 = normalize_unicode(out)
        assert again == out and n2 == 0

    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=0x20,
                                          max_codepoint=0x7E), max_size=80))
    def test_normalize_unicode_ascii_fixed_point(s):
        from bigdatafinalproject_hockey_spark.extraction import (
            normalize_unicode,
        )

        assert normalize_unicode(s) == (s, 0)
