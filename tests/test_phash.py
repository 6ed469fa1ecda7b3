"""Perceptual media hash (round 10): dHash over decoded pixel grids,
banded with the shared SimHash LSH machinery.

The correctness story the multimodal_dedup_phash oracle relies on is
proved here at the unit level: container invariance (BMP and PNG of
the same pixels decode identically, so their hashes collide exactly),
bounded perturbation damage (the planted one-cell edit flips at most
2 dHash bits, both inside band 0 — so 4×16 banding catches every
planted pair BY CONSTRUCTION, which is what lets the SQL oracle pin
caught=TRUE), and the empty-cell edge the oracle predicts arithmetically.
"""

from __future__ import annotations

import hashlib

import pytest

from website_traffic_etl_gcp_spark.operators.multimodal import (
    PERTURB_CELL,
    PHASH_BAND_WIDTH,
    PHASH_BANDS,
    PHASH_MAX_HAMMING,
    _bmp_dims,
    dhash64,
    perturb_pixels,
)
from website_traffic_etl_gcp_spark.sources import media_minimal as media


def _pixels(text: str) -> bytes:
    content = text.encode("utf-8")
    w, h = _bmp_dims(content)
    return w, h, media.embed_content(content, w * h)


CORPUS = [
    "the quick brown fox jumps over the lazy dog " * k for k in (1, 3, 7)
] + ["short", "a" * 48, "unicode σπάρκ κείμενο " * 5]


def test_dhash_is_signed_int64():
    for text in CORPUS:
        _w, _h, px = _pixels(text)
        h = dhash64(px)
        assert -(1 << 63) <= h < (1 << 63)


def test_dhash_deterministic():
    _w, _h, px = _pixels(CORPUS[0])
    assert dhash64(px) == dhash64(bytes(px))


def test_container_invariance_bmp_vs_png():
    """A PNG re-encode of the same pixel grid must decode to the same
    bytes, hence hash identically — hamming 0."""
    for text in CORPUS:
        w, h, px = _pixels(text)
        bmp = media.encode_bmp(w, h, px)
        png = media.encode_png(w, h, px)
        _, _, px_bmp = media.decode_bmp(bmp)
        _, _, px_png = media.decode_png(png)
        assert px_bmp == px_png == px
        assert dhash64(px_bmp) == dhash64(px_png)
        assert (
            hashlib.md5(px_bmp).hexdigest() == hashlib.md5(px_png).hexdigest()
        )


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_perturbation_flips_at_most_two_bits_in_band_zero():
    """The planted edit touches only cell PERTURB_CELL, so only the
    two comparisons involving that cell (bits PERTURB_CELL-1 and
    PERTURB_CELL) can change — both inside band 0. This is the
    constructive recall proof the oracle's caught=TRUE pin rests on."""
    assert (PERTURB_CELL - 1) // PHASH_BAND_WIDTH == 0
    assert PERTURB_CELL // PHASH_BAND_WIDTH == 0
    for text in CORPUS:
        _w, _h, px = _pixels(text)
        h0, h1 = dhash64(px), dhash64(perturb_pixels(px))
        xor = (h0 ^ h1) & ((1 << 64) - 1)
        assert _hamming(h0, h1) <= 2 <= PHASH_MAX_HAMMING + 1
        # flipped bits confined to band 0 → bands 1..3 agree exactly
        for j in range(1, PHASH_BANDS):
            band = (xor >> (PHASH_BAND_WIDTH * j)) & (
                (1 << PHASH_BAND_WIDTH) - 1
            )
            assert band == 0, f"band {j} disturbed for {text!r}"


def test_perturbation_changes_pixels_iff_cell_nonempty():
    """The SQL oracle predicts pixels_differ as
    6N//64 > 5N//64 — verify that arithmetic against the real edit."""
    for n in (10, 12, 13, 52, 63, 64, 65, 128, 500):
        px = bytes(range(256))[:n] if n <= 256 else bytes(n)
        px = (b"\x01\x02\x03" * n)[:n]
        out = perturb_pixels(px)
        cell_nonempty = (PERTURB_CELL + 1) * n // 64 > PERTURB_CELL * n // 64
        assert (out != px) == cell_nonempty
        assert len(out) == n


def test_banded_pairs_soundness_precondition():
    from pyspark.sql import Row, SparkSession

    from website_traffic_etl_gcp_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    spark = SparkSession.getActiveSession()
    if spark is None:
        pytest.skip("no active session (covered by the oracle suite)")
    fps = spark.createDataFrame([Row(doc_id=1, simhash=5)])
    with pytest.raises(ValueError):
        banded_hamming_pairs(fps, n_bands=3, band_width=16, max_hamming=3)
