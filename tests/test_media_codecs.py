"""The vendored BMP/WAV codecs (sources/media_minimal.py) on REAL
bytes: spec-conformance against hand-laid-out fixtures (built with
struct in this file, independently of the encoder), encode→decode
round trips, loud failures on every unsupported variant, and the
Spark-side multimodal plans decoding genuine containers end to end.
(Their registry entries are additionally oracle-checked in
test_queries_oracle; these tests pin the byte-level semantics.)"""

from __future__ import annotations

import hashlib
import struct

import pytest

from website_traffic_etl_gcp_spark.operators import multimodal as mm
from website_traffic_etl_gcp_spark.sources import media_minimal as media


# ---- hand-built BMP fixture (independent of the encoder) -----------------


def _manual_bmp_3x2() -> bytes:
    """A 3×2 8-bpp BMP laid out by hand: logical pixels are
    row0=[1,2,3], row1=[4,5,6]; the FILE stores row1 first (bottom-up)
    and pads each 3-byte row to a 4-byte stride."""
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    pixel_array = bytes([4, 5, 6, 0]) + bytes([1, 2, 3, 0])  # bottom-up + pad
    off = 14 + 40 + len(palette)
    file_header = struct.pack("<2sIHHI", b"BM", off + len(pixel_array), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(pixel_array), 2835, 2835, 256, 0
    )
    return file_header + info + palette + pixel_array


def test_decode_bmp_undoes_bottom_up_and_padding():
    w, h, pixels = media.decode_bmp(_manual_bmp_3x2())
    assert (w, h) == (3, 2)
    assert pixels == bytes([1, 2, 3, 4, 5, 6])  # logical top-down order


def test_encode_bmp_matches_manual_layout():
    got = media.encode_bmp(3, 2, bytes([1, 2, 3, 4, 5, 6]))
    assert got == _manual_bmp_3x2()


def test_bmp_round_trip_various_strides():
    # widths 1..9 cross every padding remainder (stride 4, 4, 4, 4, 8…)
    for w in range(1, 10):
        for h in (1, 2, 5):
            pixels = bytes(range(w * h)) if w * h < 256 else bytes(w * h)
            assert media.decode_bmp(media.encode_bmp(w, h, pixels)) == (
                w,
                h,
                pixels,
            )


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XX" + b[2:], "signature"),
        (lambda b: b[:28] + struct.pack("<H", 24) + b[30:], "8-bpp"),
        (lambda b: b[:30] + struct.pack("<I", 1) + b[34:], "BI_RGB"),
        (lambda b: b[:-4], "truncated"),
        # negative height = top-down variant, explicitly unsupported
        (
            lambda b: b[:22] + struct.pack("<i", -2) + b[26:],
            "top-down",
        ),
    ],
)
def test_bmp_rejects_unsupported_variants(mutate, msg):
    with pytest.raises(media.MediaFormatError, match=msg):
        media.decode_bmp(mutate(_manual_bmp_3x2()))


# ---- hand-built WAV fixture ----------------------------------------------


def _manual_wav(samples: bytes, extra_chunk: bytes = b"") -> bytes:
    fmt = struct.pack("<HHIIHH", 1, 1, 16_000, 32_000, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + extra_chunk
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_wav_basic():
    rate, frames, samples = media.decode_wav(_manual_wav(b"\x01\x02\x03\x04"))
    assert (rate, frames, samples) == (16_000, 2, b"\x01\x02\x03\x04")


def test_decode_wav_skips_unknown_chunks_with_odd_pad():
    # a 3-byte LIST chunk forces the RIFF odd-size pad byte; the data
    # chunk must still be found at the padded offset
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    rate, frames, samples = media.decode_wav(
        _manual_wav(b"\x0a\x0b", extra_chunk=extra)
    )
    assert (rate, frames, samples) == (16_000, 1, b"\x0a\x0b")


def test_encode_wav_round_trip():
    payload = bytes(range(64))
    assert media.decode_wav(media.encode_wav(payload)) == (
        media.WAV_SAMPLE_RATE,
        32,
        payload,
    )


def test_wav_rejects_unsupported_variants():
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 16_000, 64_000, 4, 16)
    stereo = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(stereo_fmt) + 8)
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(stereo_fmt)) + stereo_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(media.MediaFormatError, match="mono"):
        media.decode_wav(stereo)
    with pytest.raises(media.MediaFormatError, match="RIFF"):
        media.decode_wav(b"FORM" + bytes(20))
    no_data = (
        b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    )
    with pytest.raises(media.MediaFormatError, match="fmt"):
        media.decode_wav(no_data)


# ---- content framing -----------------------------------------------------


def test_embed_extract_round_trip():
    for content in (b"", b"x", b"hello world", bytes(200)):
        buf = media.embed_content(content, len(content) + 4 + 7)
        assert media.extract_content(buf) == content
    with pytest.raises(media.MediaFormatError, match="exceeds capacity"):
        media.embed_content(b"12345", 8)
    with pytest.raises(media.MediaFormatError, match="length prefix"):
        media.extract_content(struct.pack("<I", 99) + b"short")


# ---- AVI (uncompressed RIFF motion container) -----------------------------


def test_avi_roundtrip():
    w, h = 17, 9
    frames = [
        bytes((i * 7 + k) % 256 for i in range(w * h)) for k in range(4)
    ]
    dw, dh, micros, out = media.decode_avi(media.encode_avi(w, h, frames))
    assert (dw, dh) == (w, h)
    assert micros == 1_000_000 // media.AVI_FPS
    assert out == frames


def test_avi_odd_stride_padding():
    # width 3 pads rows to stride 4; a decoder that forgets the DWORD
    # padding shifts every row
    frames = [b"\x01\x02\x03\x04\x05\x06"]
    assert media.decode_avi(media.encode_avi(3, 2, frames))[3] == frames


def test_avi_rejections():
    avi = media.encode_avi(4, 2, [bytes(8)])
    with pytest.raises(media.MediaFormatError, match="not a RIFF/AVI"):
        media.decode_avi(media.encode_wav(b"\x00\x00"))
    with pytest.raises(media.MediaFormatError):
        media.decode_avi(avi[:40])
    # compressed frames are rejected, not mis-decoded
    bad = bytearray(avi)
    idx = bad.find(b"00db")
    bad[idx : idx + 4] = b"00dc"
    with pytest.raises(media.MediaFormatError, match="00dc"):
        media.decode_avi(bytes(bad))
    # frame-count cross-check against avih.dwTotalFrames
    bad2 = bytearray(media.encode_avi(4, 2, [bytes(8), bytes(8)]))
    idx2 = bad2.find(b"00db")
    bad2[idx2 : idx2 + 4] = b"JUNK"
    with pytest.raises(media.MediaFormatError, match="declares 2"):
        media.decode_avi(bytes(bad2))
    with pytest.raises(media.MediaFormatError, match="pixel buffer"):
        media.encode_avi(4, 2, [bytes(7)])
    with pytest.raises(media.MediaFormatError, match="at least one"):
        media.encode_avi(4, 2, [])


# ---- Spark-side: plans decode genuine containers -------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


TEXTS = [
    "short",
    "a" * 600,  # multi-row BMP, multi-chunk WAV at CHUNK_CHARS=256
    "unicode: héllo wörld ✓",  # utf-8 multibyte
    "",  # empty document
]


def test_bmp_corpus_metadata_real_decode(spark):
    out = {
        r["doc_id"]: r
        for r in mm.extract_bmp_metadata(
            mm.encode_bmp_corpus(_docs(spark, TEXTS))
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        content = t.encode("utf-8")
        v = int(hashlib.md5(content).hexdigest()[:8], 16)
        w = 16 + v % 512
        h = -(-(len(content) + 4) // w)
        r = out[i]
        assert r["n_bytes"] == len(content)
        assert r["checksum"] == hashlib.md5(content).hexdigest()
        assert (r["width"], r["height"]) == (w, h)
        assert r["row_stride"] == (w + 3) // 4 * 4


def test_bmp_payloads_are_real_containers(spark):
    # the bytes crossing between encode and decode stages are valid
    # standalone BMP files — decodable by the spec reader directly
    rows = mm.encode_bmp_corpus(_docs(spark, TEXTS)).collect()
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:2] == b"BM"
        w, h, pixels = media.decode_bmp(payload)
        assert len(pixels) == w * h


def test_resize_dims_bmp_aspect_fit(spark):
    out = {
        r["doc_id"]: r
        for r in mm.resize_dims_bmp(
            mm.encode_bmp_corpus(_docs(spark, TEXTS))
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        content = t.encode("utf-8")
        v = int(hashlib.md5(content).hexdigest()[:8], 16)
        w = 16 + v % 512
        h = -(-(len(content) + 4) // w)
        ow, oh = mm.aspect_fit(w, h)
        assert (out[i]["width"], out[i]["height"]) == (w, h)
        assert (out[i]["out_w"], out[i]["out_h"]) == (ow, oh)


def test_wav_chunks_real_decode(spark):
    rows = mm.chunk_wav(mm.encode_wav_corpus(_docs(spark, TEXTS))).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(TEXTS):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        n_expected = max(1, -(-len(t) // mm.CHUNK_CHARS))
        assert len(chunks) == n_expected
        reassembled = ""
        for k, r in enumerate(chunks):
            piece = t[k * mm.CHUNK_CHARS : (k + 1) * mm.CHUNK_CHARS]
            assert r["chunk_len"] == len(piece)
            assert r["chunk_md5"] == hashlib.md5(piece.encode()).hexdigest()
            assert r["n_frames"] == (len(t.encode("utf-8")) + 5) // 2
            reassembled += piece
        assert reassembled == t


# ---- ICO (multi-frame container) -----------------------------------------


def _manual_ico_one_frame_2x2() -> bytes:
    """A 1-frame 2×2 8-bpp ICO laid out by hand: doubled-height BMP
    header, grayscale palette, XOR rows bottom-up padded to 4 bytes,
    all-opaque AND mask (1-bpp rows padded to 32 bits)."""
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    xor = bytes([3, 4, 0, 0]) + bytes([1, 2, 0, 0])  # bottom-up + pad
    and_mask = b"\x00" * 8  # 2 rows × 4-byte stride
    header = struct.pack(
        "<IiiHHIIiiII", 40, 2, 4, 1, 8, 0, len(xor) + len(and_mask),
        0, 0, 256, 0,
    )
    img = header + palette + xor + and_mask
    icondir = struct.pack("<HHH", 0, 1, 1)
    entry = struct.pack("<BBBBHHII", 2, 2, 0, 0, 1, 8, len(img), 6 + 16)
    return icondir + entry + img


def test_decode_ico_hand_built_fixture():
    frames = media.decode_ico(_manual_ico_one_frame_2x2())
    assert frames == [(2, 2, bytes([1, 2, 3, 4]))]


def test_encode_ico_matches_manual_layout():
    got = media.encode_ico([(2, 2, bytes([1, 2, 3, 4]))])
    assert got == _manual_ico_one_frame_2x2()


def test_ico_multi_frame_round_trip():
    frames = [
        (3, 2, bytes(range(6))),
        (256, 1, bytes(256)),  # 256 encodes as 0 in the directory
        (5, 5, bytes(range(25))),
    ]
    assert media.decode_ico(media.encode_ico(frames)) == frames


def test_ico_rejects_unsupported_variants():
    data = _manual_ico_one_frame_2x2()
    with pytest.raises(media.MediaFormatError, match="not an icon"):
        media.decode_ico(b"\x00\x00\x02\x00" + data[4:])  # type=2 (cursor)
    with pytest.raises(media.MediaFormatError, match="truncated"):
        media.decode_ico(data[:-4])
    # PNG-compressed frame: entry points at a PNG signature
    png = b"\x89PNG\r\n\x1a\n" + bytes(8)
    icondir = struct.pack("<HHH", 0, 1, 1)
    entry = struct.pack("<BBBBHHII", 2, 2, 0, 0, 1, 8, len(png), 22)
    with pytest.raises(media.MediaFormatError, match="PNG"):
        media.decode_ico(icondir + entry + png)
    # dimension contract: entry says 2x2 but BMP header says 3x(2*2)
    bad = bytearray(data)
    struct.pack_into("<i", bad, 6 + 16 + 4, 3)  # biWidth → 3
    with pytest.raises(media.MediaFormatError, match="doubled-height"):
        media.decode_ico(bytes(bad))


def test_ico_corpus_frame_sampling_real_decode(spark):
    out = mm.sample_frames_ico(
        mm.encode_ico_corpus(_docs(spark, TEXTS))
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(TEXTS):
        raw = t.encode("utf-8")
        frames = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert len(frames) == 1 + len(raw) % 4
        for k, r in enumerate(frames):
            content = raw + b":" + str(k).encode()
            assert r["frame_checksum"] == hashlib.md5(content).hexdigest()
            assert r["width"] == mm.ICO_FRAME_W
            assert r["height"] == -(-(len(content) + 4) // mm.ICO_FRAME_W)


# ---- PNG ---------------------------------------------------------------


def test_png_roundtrip_all_filter_types():
    """Height >= 5 forces the encoder through every filter type
    (row r uses filter r % 5); the decode must reconstruct exactly."""
    import random

    rng = random.Random(11)
    for w, h in ((1, 1), (3, 2), (17, 5), (64, 9), (257, 6)):
        px = bytes(rng.randrange(256) for _ in range(w * h))
        w2, h2, px2 = media.decode_png(media.encode_png(w, h, px))
        assert (w2, h2, px2) == (w, h, px)


def test_png_crc_and_signature_guards():
    data = bytearray(media.encode_png(8, 8, bytes(64)))
    bad_sig = b"\x88" + bytes(data[1:])
    with pytest.raises(media.MediaFormatError, match="signature"):
        media.decode_png(bad_sig)
    data[20] ^= 0xFF  # inside the IHDR body → CRC mismatch
    with pytest.raises(media.MediaFormatError, match="CRC"):
        media.decode_png(bytes(data))


def test_png_unsupported_variants_raise():
    import struct as _s
    import zlib as _z

    def chunk(ctype, body):
        return (
            _s.pack(">I", len(body)) + ctype + body
            + _s.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # RGB colour type (2) must be rejected loudly, not mis-decoded
    ihdr = _s.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(bytes(5 * 4)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(media.MediaFormatError, match="unsupported"):
        media.decode_png(data)
    # Adam7 interlace likewise
    ihdr = _s.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(bytes(5 * 4)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(media.MediaFormatError, match="interlace"):
        media.decode_png(data)


def test_png_content_embedding_roundtrip():
    content = b"the quick brown fox, compressed and filtered" * 7
    w, h = 23, -(-(len(content) + 4) // 23)
    pixels = media.embed_content(content, w * h)
    _, _, out = media.decode_png(media.encode_png(w, h, pixels))
    assert media.extract_content(out) == content
