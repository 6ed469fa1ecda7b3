"""Property-based round trips for the vendored media codecs: encode→
decode must be the identity for ARBITRARY dimensions and pixel/sample
content (the hand-built fixtures in test_media_codecs pin the byte
layout; these pin totality across the input space — every stride
remainder, every odd/even sample length, every frame-count mix)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from website_traffic_etl_gcp_spark.sources import media_minimal as media

_dims = st.tuples(
    st.integers(min_value=1, max_value=67),
    st.integers(min_value=1, max_value=19),
)


@settings(max_examples=60, deadline=None)
@given(_dims, st.binary(min_size=0, max_size=32))
def test_bmp_round_trip_any_dims(dims, salt):
    w, h = dims
    pixels = (salt * (w * h // max(1, len(salt)) + 1))[: w * h] or b"\x00" * (
        w * h
    )
    pixels = pixels.ljust(w * h, b"\x00")
    assert media.decode_bmp(media.encode_bmp(w, h, pixels)) == (w, h, pixels)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_wav_round_trip_any_content(content):
    samples = content if len(content) % 2 == 0 else content + b"\x00"
    rate, frames, got = media.decode_wav(media.encode_wav(samples))
    assert (rate, frames, got) == (
        media.WAV_SAMPLE_RATE,
        len(samples) // 2,
        samples,
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=256),
            st.integers(min_value=1, max_value=9),
            st.binary(min_size=0, max_size=16),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_ico_round_trip_any_frames(raw_frames):
    frames = []
    for w, h, salt in raw_frames:
        pixels = (salt or b"\x01") * (w * h)
        frames.append((w, h, pixels[: w * h].ljust(w * h, b"\x00")))
    assert media.decode_ico(media.encode_ico(frames)) == frames


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.integers(0, 64))
def test_content_framing_round_trip(content, slack):
    buf = media.embed_content(content, len(content) + 4 + slack)
    assert media.extract_content(buf) == content
    # the length prefix is little-endian and exact
    assert struct.unpack_from("<I", buf, 0)[0] == len(content)
