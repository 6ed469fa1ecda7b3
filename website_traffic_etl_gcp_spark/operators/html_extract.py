"""HTML boilerplate extraction — the pre-filter stage of a web-corpus
pipeline that turns crawled HTML into clean main-content text before
quality scoring / dedup run.

The classifier is the block-level text-density rule from boilerpipe
(Kohlschuetter et al., WSDM 2010, "Boilerplate Detection using Shallow
Text Features"): segment the DOM into text blocks at block-level tag
boundaries, then keep a block iff its anchor-text ratio ("link
density") is low and it carries enough words. Navigation bars, link
lists and footers are almost pure anchor text; article prose is not.

Parsing runs in the Arrow-batch slot (``mapInPandas`` over Python's
stdlib :class:`html.parser.HTMLParser`) — real HTML tokenization is not
expressible in Catalyst column algebra, and Arrow batching keeps the
per-row Python overhead amortized (one interpreter call per ~10k-row
batch, not per row). Everything upstream/downstream of this operator
stays JVM-side.

Scale note: extraction is a pure per-row map — no shuffle, no state —
so it parallelizes linearly with input splits at any corpus size; the
only cost is the Python worker lane, which is the standard price of
HTML parsing in any PySpark pipeline.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Tags whose content never renders as body text. ``head`` is handled
# separately because HTML5 allows its end tag to be OMITTED (implied by
# <body> or any flow content) — a depth counter would stick.
_SKIP_TAGS = frozenset({"script", "style", "title", "noscript", "template"})

# The EXACT RE2 `\s` class the DuckDB oracle uses: [\t\n\f\r ] — no
# \v (RE2's \s excludes vertical tab) and no Unicode spaces (Python's
# str.split() folds NBSP/NEL, which the oracle regex does NOT). Using
# any wider class would break the closed-form ground truth on a
# corpus containing the excluded characters.
_ASCII_WS = re.compile(r"[ \t\n\r\f]+")


def ascii_ws_normalize(s: str) -> str:
    """Collapse RE2-``\\s`` whitespace runs to single spaces, trim."""
    return _ASCII_WS.sub(" ", s).strip(" \t\n\r\f")

# Tags that open/close a text block. Inline tags (a, b, span, em, ...)
# accumulate into the current block.
_BLOCK_TAGS = frozenset({
    "p", "div", "article", "section", "header", "footer", "nav", "aside",
    "main", "ul", "ol", "li", "table", "tr", "td", "th", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "body", "html", "figure",
    "figcaption",
})

# Density rule thresholds: a block is content iff link_density <= 1/3
# and it has at least MIN_WORDS words.
MAX_LINK_DENSITY = 1.0 / 3.0
MIN_CONTENT_WORDS = 5

EXTRACT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("main_text", StringType()),
    StructField("n_blocks", LongType()),
    StructField("n_content_blocks", LongType()),
    StructField("content_chars", LongType()),
])


class _BlockParser(HTMLParser):
    """Segments an HTML document into text blocks with per-block
    total-char and anchor-char counts (the two shallow features the
    density rule needs)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, chars, anchor_chars)
        self._buf: list[str] = []
        # raw anchor fragments for the CURRENT block — normalized once
        # at flush with the same rule as the block text, so whitespace
        # between fragments of one anchor (split by comments/inline
        # tags) counts identically in both totals
        self._anchor_buf: list[str] = []
        self._skip_depth = 0
        self._anchor_depth = 0
        self._in_head = False

    def _flush(self) -> None:
        text = ascii_ws_normalize("".join(self._buf))
        if text:
            anchor_chars = len(ascii_ws_normalize("".join(self._anchor_buf)))
            self.blocks.append((text, len(text), anchor_chars))
        self._buf = []
        self._anchor_buf = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "head":
            self._in_head = True
            return
        if tag == "body" or (self._in_head and tag in _BLOCK_TAGS):
            # HTML5: </head> may be omitted — <body> (or any flow
            # content) implies it. Without this, an implied head end
            # would skip the whole document.
            self._in_head = False
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag == "head":
            self._in_head = False
            return
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth or self._in_head:
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._anchor_buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


def extract_blocks(html: str) -> list[tuple[str, int, int]]:
    """Parse ``html`` into (text, n_chars, anchor_chars) blocks."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def extract_main_text(html: str) -> tuple[str, int, int]:
    """Apply the density rule; returns (main_text, n_blocks, n_content)."""
    blocks = extract_blocks(html)
    kept: list[str] = []
    for text, chars, anchor_chars in blocks:
        link_density = anchor_chars / chars if chars else 1.0
        n_words = len(text.split(" "))  # ASCII-space words (oracle parity)
        if link_density <= MAX_LINK_DENSITY and n_words >= MIN_CONTENT_WORDS:
            kept.append(text)
    return " ".join(kept), len(blocks), len(kept)


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched boilerplate removal over an HTML string column.

    Pure map (no shuffle); output one row per input row with the
    extracted main text and block-census stats. ``passthrough``
    columns are carried through the Arrow batch unchanged (same row
    order), so downstream stages that need sibling metadata (domain,
    source, ...) compose without a corpus-sized re-join on doc_id.
    """
    pt = [c for c in passthrough]
    schema = StructType(
        list(EXTRACT_SCHEMA.fields) + [df.schema[c] for c in pt]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                main, n_blocks, n_content = extract_main_text(html or "")
                rows.append((int(doc_id), main, n_blocks, n_content, len(main)))
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "main_text", "n_blocks",
                    "n_content_blocks", "content_chars",
                ],
            )
            for c in pt:
                out[c] = pdf[c].to_numpy()
            yield out

    return df.select(id_col, html_col, *pt).mapInPandas(batches, schema)


def plant_boilerplate_html(
    id_col: Column | str = "doc_id", text_col: Column | str = "text"
) -> Column:
    """Wrap a clean text column in deterministic crawl-shaped HTML
    boilerplate (JVM-side concat — planting costs no Python).

    The wrapper varies with ``doc_id`` so the extractor faces a
    non-constant page structure: the nav carries ``2 + doc_id % 4``
    links, and every third doc gains a second content paragraph. The
    ground truth (what extraction must return) stays closed-form, which
    is what the DuckDB oracle recomputes.
    """
    did = F.col(id_col) if isinstance(id_col, str) else id_col
    raw = F.col(text_col) if isinstance(text_col, str) else text_col
    # entity-escape the payload (& first) so text containing markup
    # metacharacters survives planting: the parser unescapes char
    # references back to the original text, so the closed-form ground
    # truth (extraction returns the raw text) holds for ANY corpus,
    # not just metacharacter-free ones
    txt = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    nav_links = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), (did % 4) + F.lit(1)),
            lambda i: F.concat(
                F.lit('<a href="/p'), i.cast("string"), F.lit('">item '),
                i.cast("string"), F.lit("</a>"),
            ),
        ),
    )
    appendix = F.when(
        did % 3 == 0,
        F.concat(
            F.lit("<p>appendix note for document "),
            did.cast("string"),
            F.lit(" with extra detail</p>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<html><head><title>doc "), did.cast("string"),
        F.lit("</title><script>var t=0;</script><style>p{margin:0}</style>"
              "</head><body><nav>"),
        nav_links,
        F.lit('</nav><div class="side"><ul>'
              '<li><a href="/x">more links here</a></li>'
              '<li><a href="/y">related posts now</a></li></ul></div>'
              "<article><p>"),
        txt,
        F.lit("</p>"),
        appendix,
        F.lit('</article><footer><a href="/tos">terms</a> '
              '<a href="/privacy">privacy</a> copyright 2026</footer>'
              "</body></html>"),
    )
