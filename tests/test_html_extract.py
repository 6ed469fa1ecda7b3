"""Planted-boilerplate tests for the HTML extraction operator: the
density rule must drop nav/sidebar/footer and keep article prose, and
the parser must survive hostile-but-legal HTML shapes."""

from __future__ import annotations

from website_traffic_etl_gcp_spark.operators import html_extract as hx


def test_blocks_segmentation_and_link_density():
    html = (
        "<html><head><title>t</title><script>var x=1;</script></head>"
        '<body><nav><a href="/">home</a><a href="/a">about us</a></nav>'
        "<article><p>real article prose with many plain words here</p>"
        '</article><footer><a href="/tos">terms</a> copyright</footer>'
        "</body></html>"
    )
    blocks = hx.extract_blocks(html)
    texts = [b[0] for b in blocks]
    assert "real article prose with many plain words here" in texts
    assert all("var x" not in t and "t" != t for t in texts)  # head skipped
    nav = next(b for b in blocks if "home" in b[0])
    assert nav[2] == nav[1]  # all nav chars are anchor chars
    footer = next(b for b in blocks if "copyright" in b[0])
    assert 0 < footer[2] < footer[1]


def test_density_rule_keeps_only_prose():
    html = (
        "<body><nav><a>one</a><a>two</a><a>three</a></nav>"
        "<p>this paragraph has clearly more than five words total</p>"
        "<ul><li><a>pure link one</a></li><li><a>pure link two</a></li></ul>"
        "<p>short text</p>"  # < 5 words -> boilerplate
        "</body>"
    )
    main, n_blocks, n_content = hx.extract_main_text(html)
    assert main == "this paragraph has clearly more than five words total"
    assert n_content == 1
    assert n_blocks == 5  # nav, p, li, li, p


def test_mixed_anchor_block_passes_when_density_low():
    # 1 short anchor inside long prose: density well under 1/3 -> kept.
    html = "<p>read the full statement at <a>this page</a> for all of the details</p>"
    main, _, n_content = hx.extract_main_text(html)
    assert n_content == 1
    assert "read the full statement" in main and "this page" in main


def test_empty_and_whitespace_html():
    assert hx.extract_main_text("") == ("", 0, 0)
    assert hx.extract_main_text("<body>   \n\t </body>") == ("", 0, 0)


def test_unclosed_and_nested_tags():
    # Unclosed <p>, nested divs, stray </a>: parser must not crash and
    # the trailing buffer must still flush.
    html = "<div><div><p>alpha beta gamma delta epsilon zeta</div></a>"
    main, n_blocks, n_content = hx.extract_main_text(html)
    assert main == "alpha beta gamma delta epsilon zeta"
    assert n_content == 1


def test_planted_wrapper_ground_truth(spark):
    """End-to-end: plant the wrapper over a tiny frame, extract, and
    check the closed-form ground truth the DuckDB oracle recomputes."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(doc_id=3, text="the quick brown fox jumps over the dog"),
            Row(doc_id=4, text="tiny doc"),  # < 5 words -> main dropped
            # markup metacharacters must round-trip via entity escaping
            Row(doc_id=5, text="a <b> & &amp; </article> c d e f"),
        ]
    )
    planted = df.select(
        "doc_id", hx.plant_boilerplate_html("doc_id", "text").alias("html")
    )
    out = {
        r["doc_id"]: r
        for r in hx.extract_main_content(planted, "html").collect()
    }
    r3 = out[3]  # doc_id % 3 == 0 -> appendix paragraph present
    assert r3["main_text"] == (
        "the quick brown fox jumps over the dog "
        "appendix note for document 3 with extra detail"
    )
    assert r3["n_blocks"] == 6 and r3["n_content_blocks"] == 2
    r4 = out[4]
    assert r4["main_text"] == "" and r4["n_content_blocks"] == 0
    assert r4["n_blocks"] == 5
    assert r4["content_chars"] == 0
    r5 = out[5]  # metacharacter text recovered verbatim, blocks intact
    assert r5["main_text"] == "a <b> & &amp; </article> c d e f"
    assert r5["n_blocks"] == 5 and r5["n_content_blocks"] == 1


# ---- property tests: the parser must never crash and the density
# rule's outputs must stay within the parsed text ----------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_html_chunks = st.lists(
    st.one_of(
        st.sampled_from([
            "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
            "<nav>", "</nav>", "<script>", "</script>", "<li>", "</ul>",
            "<br/>", "<!-- c -->", "<P CLASS='y'>", "</SPAN>", "&amp;",
            "<", ">", "</", "<>",
        ]),
        st.text(
            alphabet=st.characters(blacklist_characters="<>&"),
            max_size=20,
        ),
    ),
    max_size=40,
)


@settings(max_examples=150, deadline=None)
@given(chunks=_html_chunks)
def test_extractor_total_on_arbitrary_markup(chunks):
    html = "".join(chunks)
    main, n_blocks, n_content = hx.extract_main_text(html)
    assert 0 <= n_content <= n_blocks
    # output is ASCII-whitespace-normalized (the oracle's \s class):
    # no runs, no edge whitespace
    assert main == hx.ascii_ws_normalize(main)
    # no fabricated text: every non-space character of the output
    # appears in the (entity-unescaped) input. Word-level containment
    # is deliberately NOT asserted — an inline tag between two text
    # runs joins them without whitespace ('0<a>0' -> word '00'),
    # which is correct inline-tag semantics, so output words need not
    # be input substrings.
    import html as html_mod

    unescaped = html_mod.unescape(html)
    for ch in set(main) - {" "}:
        assert ch in unescaped


@settings(max_examples=50, deadline=None)
@given(
    text=st.text(max_size=200),
    doc_id=st.integers(min_value=0, max_value=10**9),
)
def test_planted_wrapper_roundtrip_property(text, doc_id):
    r"""For ANY text — markup metacharacters included — extraction over
    the planted wrapper returns exactly the closed-form ground truth
    the oracle computes (the wrapper entity-escapes the payload and
    the parser unescapes it back). Whitespace semantics are the
    oracle's ASCII \s class, NOT Python str.split() (which also
    folds NBSP/NEL)."""
    norm = hx.ascii_ws_normalize(text)
    escaped = (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    html = (
        f"<html><head><title>doc {doc_id}</title><script>var t=0;</script>"
        f"<style>p{{margin:0}}</style></head><body><nav>"
        + "".join(
            f'<a href="/p{i}">item {i}</a>' for i in range(2 + doc_id % 4)
        )
        + '</nav><div class="side"><ul>'
        '<li><a href="/x">more links here</a></li>'
        '<li><a href="/y">related posts now</a></li></ul></div>'
        f"<article><p>{escaped}</p>"
        + (
            f"<p>appendix note for document {doc_id} with extra detail</p>"
            if doc_id % 3 == 0
            else ""
        )
        + '</article><footer><a href="/tos">terms</a> '
        '<a href="/privacy">privacy</a> copyright 2026</footer>'
        "</body></html>"
    )
    main, n_blocks, n_content = hx.extract_main_text(html)
    keep_main = len(norm) > 0 and len(norm.split(" ")) >= 5
    appendix = (
        f"appendix note for document {doc_id} with extra detail"
        if doc_id % 3 == 0
        else None
    )
    expected = " ".join(
        [x for x in ((norm if keep_main else None), appendix) if x]
    )
    assert main == expected
    assert n_blocks == 4 + (1 if norm else 0) + (1 if appendix else 0)
    assert n_content == int(keep_main) + int(bool(appendix))


def test_implied_head_close():
    """HTML5 allows </head> to be omitted — <body> (or flow content)
    implies it; the head skip must not swallow the document."""
    main, n_blocks, n_content = hx.extract_main_text(
        "<html><head><title>t</title><body>"
        "<p>six plain words of real prose here</p></body></html>"
    )
    assert main == "six plain words of real prose here"
    assert n_content == 1
    # head content stays skipped even without the end tag
    assert "t " not in main and main[:1] != "t"


def test_unicode_whitespace_preserved():
    r"""NBSP is NOT whitespace to the oracle's ASCII \\s class — the
    extractor must keep it verbatim so closed-form parity holds."""
    main, _, _ = hx.extract_main_text("<p>a b c d e f</p>")
    assert main == "a b c d e f"


def test_vertical_tab_is_not_whitespace():
    r"""RE2's \s is [\t\n\f\r ] — no \v. The normalizer must match
    exactly, or a document containing a vertical tab diverges from
    the closed-form oracle (round-11 advice item)."""
    assert hx.ascii_ws_normalize("a\x0bb") == "a\x0bb"
    assert hx.ascii_ws_normalize(" a \t\n\f\r b ") == "a b"
    # and the density word rule then counts "a\x0bb" as ONE word
    main, _, n = hx.extract_main_text(
        "<p>a\x0bb one two three four five</p>"
    )
    assert "a\x0bb" in main


def test_anchor_chars_use_block_normalization_rule():
    """Anchor text split across fragments (comments/inline tags inside
    <a>) must count whitespace once, with the same normalization as
    the block text — so an all-anchor block has anchor_chars == chars
    even when the anchor is fragmented (round-11 advice item)."""
    html = "<p><a>one <!-- c --> two<b> three</b></a></p>"
    blocks = hx.extract_blocks(html)
    assert len(blocks) == 1
    text, chars, anchor_chars = blocks[0]
    assert text == "one two three"
    assert anchor_chars == chars == len("one two three")
