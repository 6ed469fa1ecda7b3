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
