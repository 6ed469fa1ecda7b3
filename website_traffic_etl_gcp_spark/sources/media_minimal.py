"""Minimal pure-Python BMP and WAV codecs.

The reference pipeline treats media blobs as opaque GCS objects
(reference extract.py:55-80 downloads then hands bytes to a library);
this container ships no imaging/audio libraries, so without this
module the §2F multimodal path could only run its deterministic-fake
decode. Both halves here implement PUBLIC file-format specs — the
Windows BMP format (BITMAPFILEHEADER + BITMAPINFOHEADER, as documented
in the Windows SDK / Wikipedia "BMP file format") and the RIFF/WAVE
PCM format (the Multimedia Programming Interface and Data
Specification 1.0) — just enough for uncompressed containers:

- BMP: 8-bits-per-pixel palettized, ``BI_RGB`` (uncompressed),
  bottom-up row order, rows padded to 4-byte boundaries, 256-entry
  grayscale palette. ``decode_bmp`` validates the ``BM`` signature,
  header sizes, bit depth, compression field, and that the pixel
  array actually holds ``stride × height`` bytes; it reassembles the
  logical top-down pixel bytes by un-padding and re-reversing rows.
- WAV: RIFF container with a PCM ``fmt `` chunk (format tag 1,
  mono, 16-bit) and a ``data`` chunk. ``decode_wav`` walks the chunk
  list generically (skipping unknown chunks, honoring the odd-size
  pad byte the RIFF spec requires), so files with extra chunks
  (LIST/INFO, fact) decode correctly.
- ICO: the Windows icon container (ICONDIR + ICONDIRENTRY directory
  + embedded BMPs with the spec's DOUBLED biHeight covering the XOR
  pixel block and the 1-bpp AND transparency mask) — the MULTI-IMAGE
  format that gives the frame-sampling plan a genuinely real
  multi-frame decode: ``decode_ico`` validates the directory, each
  embedded header, the entry-vs-header dimension contract, and the
  XOR/AND block sizes, then reassembles per-frame top-down pixels.

Deliberately NOT supported (clear errors instead of wrong data):
BMP top-down (negative height), 1/4/16/24/32-bpp, RLE compression,
BITMAPV4/V5 color-space extensions; WAV non-PCM format tags,
multi-channel or non-16-bit streams, WAVE_FORMAT_EXTENSIBLE; ICO
frames stored as PNG (the compressed variant).

The payload convention used by the multimodal plans: the logical
content (utf-8 document bytes) is length-prefixed (4-byte little-
endian) and zero-padded into the BMP pixel array / WAV sample data,
so a decoder must correctly undo row padding + bottom-up ordering
(BMP) or chunk walking (WAV) to recover the content — the decode is
load-bearing, not decorative.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "MediaFormatError",
    "encode_bmp",
    "decode_bmp",
    "bmp_stride",
    "encode_wav",
    "decode_wav",
    "encode_ico",
    "decode_ico",
    "encode_avi",
    "decode_avi",
    "AVI_FPS",
    "encode_png",
    "decode_png",
    "embed_content",
    "extract_content",
    "WAV_SAMPLE_RATE",
]


class MediaFormatError(ValueError):
    """A container failed structural validation (bad magic, truncated
    pixel array, unsupported variant)."""


# ---- shared content framing ---------------------------------------------


def embed_content(content: bytes, capacity: int) -> bytes:
    """Length-prefix ``content`` and zero-pad to ``capacity`` bytes."""
    if len(content) + 4 > capacity:
        raise MediaFormatError(
            f"content of {len(content)} bytes exceeds capacity {capacity}"
        )
    framed = struct.pack("<I", len(content)) + content
    return framed + b"\x00" * (capacity - len(framed))


def extract_content(buf: bytes) -> bytes:
    """Undo :func:`embed_content`."""
    if len(buf) < 4:
        raise MediaFormatError("buffer too small for length prefix")
    (n,) = struct.unpack_from("<I", buf, 0)
    if n + 4 > len(buf):
        raise MediaFormatError(
            f"length prefix {n} exceeds buffer of {len(buf) - 4} bytes"
        )
    return buf[4 : 4 + n]


# ---- BMP -----------------------------------------------------------------

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # bfType bfSize res1 res2 bfOffBits
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER
_BMP_INFO_SIZE = 40
_BMP_PALETTE_ENTRIES = 256
_BMP_HEADERS_SIZE = 14 + _BMP_INFO_SIZE + 4 * _BMP_PALETTE_ENTRIES


def bmp_stride(width: int) -> int:
    """Row stride of an 8-bpp BMP: width bytes padded to 4-byte
    multiples (the spec's DWORD row alignment)."""
    return (width + 3) // 4 * 4


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize ``pixels`` (logical top-down, ``width × height``
    bytes, one 8-bit palette index per pixel) as a structurally valid
    8-bpp uncompressed BMP: grayscale palette, bottom-up rows, 4-byte
    row padding."""
    if width <= 0 or height <= 0:
        raise MediaFormatError(f"non-positive dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise MediaFormatError(
            f"pixel buffer {len(pixels)} != {width}x{height}"
        )
    stride = bmp_stride(width)
    pad = b"\x00" * (stride - width)
    # bottom-up: the file stores the last logical row first
    rows = [
        pixels[r * width : (r + 1) * width] + pad
        for r in range(height - 1, -1, -1)
    ]
    pixel_array = b"".join(rows)
    off_bits = _BMP_HEADERS_SIZE
    file_size = off_bits + len(pixel_array)
    file_header = _BMP_FILE_HEADER.pack(b"BM", file_size, 0, 0, off_bits)
    info_header = _BMP_INFO_HEADER.pack(
        _BMP_INFO_SIZE,  # biSize
        width,  # biWidth
        height,  # biHeight (positive → bottom-up)
        1,  # biPlanes
        8,  # biBitCount
        0,  # biCompression = BI_RGB
        len(pixel_array),  # biSizeImage
        2835,  # biXPelsPerMeter (72 dpi)
        2835,  # biYPelsPerMeter
        _BMP_PALETTE_ENTRIES,  # biClrUsed
        0,  # biClrImportant
    )
    palette = b"".join(
        struct.pack("<BBBB", i, i, i, 0) for i in range(_BMP_PALETTE_ENTRIES)
    )
    return file_header + info_header + palette + pixel_array


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Parse an 8-bpp uncompressed BMP → ``(width, height, pixels)``
    with ``pixels`` in logical top-down order (row padding stripped,
    bottom-up ordering undone)."""
    if len(data) < 14 + _BMP_INFO_SIZE:
        raise MediaFormatError("truncated BMP header")
    magic, file_size, _r1, _r2, off_bits = _BMP_FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise MediaFormatError(f"bad BMP signature {magic!r}")
    (
        bi_size,
        width,
        height,
        planes,
        bpp,
        compression,
        size_image,
        _xppm,
        _yppm,
        _clr_used,
        _clr_important,
    ) = _BMP_INFO_HEADER.unpack_from(data, 14)
    if bi_size < _BMP_INFO_SIZE:
        raise MediaFormatError(f"unsupported BITMAPCOREHEADER (biSize={bi_size})")
    if height < 0:
        raise MediaFormatError("top-down BMP (negative height) unsupported")
    if planes != 1:
        raise MediaFormatError(f"biPlanes={planes} != 1")
    if bpp != 8:
        raise MediaFormatError(f"only 8-bpp supported, got {bpp}")
    if compression != 0:
        raise MediaFormatError(f"only BI_RGB supported, got {compression}")
    if width <= 0 or height == 0:
        raise MediaFormatError(f"bad dimensions {width}x{height}")
    stride = bmp_stride(width)
    if off_bits + stride * height > len(data):
        raise MediaFormatError(
            f"pixel array truncated: need {stride * height} bytes at "
            f"offset {off_bits}, file has {len(data)}"
        )
    if file_size != len(data):
        raise MediaFormatError(
            f"bfSize {file_size} != actual file length {len(data)}"
        )
    # row de-padding + bottom-up flip as one strided numpy view;
    # materialize via ascontiguousarray — .tobytes() straight off a
    # negative-stride view copies element-wise (~5× slower than the
    # contiguous blit)
    arr = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=off_bits
    )
    view = arr.reshape(height, stride)[::-1, :width]
    return width, height, np.ascontiguousarray(view).tobytes()


# ---- WAV -----------------------------------------------------------------

WAV_SAMPLE_RATE = 16_000
_WAV_FMT_PCM = 1


def encode_wav(samples: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Wrap raw little-endian PCM16 mono sample bytes in a RIFF/WAVE
    container (``fmt `` + ``data`` chunks; data padded to an even
    byte count per the RIFF pad rule)."""
    if len(samples) % 2:
        raise MediaFormatError("PCM16 sample bytes must be even-length")
    byte_rate = sample_rate * 2
    fmt = struct.pack(
        "<HHIIHH", _WAV_FMT_PCM, 1, sample_rate, byte_rate, 2, 16
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _riff_header(data: bytes, form: bytes) -> None:
    """Validate the outer RIFF header against ``form`` (``WAVE`` /
    ``AVI ``) and the declared size against the actual byte count."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != form:
        raise MediaFormatError(f"not a RIFF/{form.decode().strip()} file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 != len(data):
        raise MediaFormatError(
            f"RIFF size {riff_size} != file length {len(data)} - 8"
        )


def _riff_chunks(data: bytes, pos: int, end: int):
    """The shared RIFF chunk walker (WAV *and* AVI decode): yields
    ``(chunk_id, body)`` from ``data[pos:end]``, skipping nothing —
    callers decide which ids they care about. Unknown chunks are
    therefore skipped for free, truncation is an error, and odd-sized
    chunks honor the RIFF pad byte."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + csize]
        if len(body) != csize or pos + 8 + csize > end:
            raise MediaFormatError(f"chunk {cid!r} truncated")
        yield cid, body
        pos += 8 + csize + (csize & 1)  # RIFF pad byte on odd sizes


def decode_wav(data: bytes) -> tuple[int, int, bytes]:
    """Parse a RIFF/WAVE PCM16-mono file → ``(sample_rate, n_frames,
    sample_bytes)``. Walks the chunk list generically: unknown chunks
    are skipped, odd-sized chunks honor the RIFF pad byte."""
    _riff_header(data, b"WAVE")
    fmt_seen, sample_rate, samples = False, None, None
    for cid, body in _riff_chunks(data, 12, len(data)):
        csize = len(body)
        if cid == b"fmt ":
            if csize < 16:
                raise MediaFormatError("fmt chunk too small")
            tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != _WAV_FMT_PCM:
                raise MediaFormatError(f"non-PCM format tag {tag}")
            if channels != 1 or bits != 16:
                raise MediaFormatError(
                    f"only mono PCM16 supported (got {channels}ch {bits}-bit)"
                )
            sample_rate, fmt_seen = rate, True
        elif cid == b"data":
            samples = body
    if not fmt_seen:
        raise MediaFormatError("missing fmt chunk")
    if samples is None:
        raise MediaFormatError("missing data chunk")
    return sample_rate, len(samples) // 2, samples


# ---- AVI (RIFF motion container; uncompressed DIB frames) ----------------
#
# The public AVI RIFF form (Microsoft "AVI RIFF File Reference"):
# RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
# '00db'*)). Only the uncompressed subset is implemented — one 'vids'
# stream with the 'DIB ' handler, 8-bpp BI_RGB frames stored exactly
# like a BMP pixel array (bottom-up rows, DWORD padding) in '00db'
# ("db" = uncompressed DIB) chunks. Compressed '00dc' chunks, audio
# streams, multi-stream files, and idx1-dependent ordering are
# deliberately rejected with clear errors. The chunk walking reuses
# the same `_riff_chunks` walker as the WAV decoder.

AVI_FPS = 10
_AVI_MICROS_PER_FRAME = 1_000_000 // AVI_FPS
_AVI_MAIN_HEADER = struct.Struct("<14I")  # MainAVIHeader, 56 bytes
_AVI_STREAM_HEADER = struct.Struct("<4s4sIHHIIIIIIIIhhhh")  # 56 bytes


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(body)) + list_type + body


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return (
        cid + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )


def encode_avi(width: int, height: int, frames: list[bytes],
               fps: int = AVI_FPS) -> bytes:
    """Serialize ``frames`` (each ``width*height`` logical top-down
    8-bpp pixel bytes) as a structurally valid uncompressed AVI:
    hdrl (avih + one vids/DIB strl), movi with one '00db' DIB per
    frame (bottom-up rows, DWORD padding — the BMP pixel-array
    convention)."""
    if not frames:
        raise MediaFormatError("AVI needs at least one frame")
    stride = bmp_stride(width)
    dibs = []
    for i, pixels in enumerate(frames):
        if len(pixels) != width * height:
            raise MediaFormatError(
                f"frame {i} pixel buffer {len(pixels)} != "
                f"{width}x{height}"
            )
        pad = b"\x00" * (stride - width)
        dibs.append(
            b"".join(
                pixels[r * width : (r + 1) * width] + pad
                for r in range(height - 1, -1, -1)
            )
        )
    frame_bytes = stride * height
    avih = _AVI_MAIN_HEADER.pack(
        1_000_000 // fps,          # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0,                         # dwFlags
        len(frames),               # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        frame_bytes,               # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,                # dwReserved[4]
    )
    strh = _AVI_STREAM_HEADER.pack(
        b"vids", b"DIB ",
        0, 0, 0, 0,                # flags, priority, language, initial
        1, fps,                    # dwScale / dwRate = frame rate
        0, len(frames),            # dwStart, dwLength (frames)
        frame_bytes, 0xFFFF, 0,    # sugBufSize, quality, sampleSize
        0, 0, width, height,       # rcFrame
    )
    palette = b"".join(
        struct.pack("<BBBB", i, i, i, 0)
        for i in range(_BMP_PALETTE_ENTRIES)
    )
    strf = _BMP_INFO_HEADER.pack(
        _BMP_INFO_SIZE, width, height, 1, 8, 0,
        frame_bytes, 0, 0, _BMP_PALETTE_ENTRIES, 0,
    ) + palette
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(
            b"strl",
            _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf),
        ),
    )
    movi = _riff_list(
        b"movi", b"".join(_riff_chunk(b"00db", d) for d in dibs)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an uncompressed AVI → ``(width, height,
    micros_per_frame, [frame_pixels, ...])`` with logical top-down
    8-bpp pixels per frame. Validates the hdrl contract (one vids/DIB
    stream, 8-bpp BI_RGB strf matching the avih dims), walks movi
    with the shared RIFF walker, rejects compressed '00dc' frames,
    undoes bottom-up ordering + DWORD row padding, and cross-checks
    the decoded frame count against avih.dwTotalFrames."""
    _riff_header(data, b"AVI ")
    width = height = None
    micros = total_frames = None
    strh_seen = strf_seen = False
    frames: list[bytes] = []
    for cid, body in _riff_chunks(data, 12, len(data)):
        if cid != b"LIST":
            continue
        ltype = body[:4]
        inner = body[4:]
        if ltype == b"hdrl":
            for hid, hbody in _riff_chunks(inner, 0, len(inner)):
                if hid == b"avih":
                    if len(hbody) < _AVI_MAIN_HEADER.size:
                        raise MediaFormatError("avih too small")
                    vals = _AVI_MAIN_HEADER.unpack_from(hbody, 0)
                    micros, total_frames = vals[0], vals[4]
                    if vals[6] != 1:
                        raise MediaFormatError(
                            f"only single-stream AVI supported "
                            f"(got {vals[6]} streams)"
                        )
                    width, height = vals[8], vals[9]
                elif hid == b"LIST" and hbody[:4] == b"strl":
                    sbody = hbody[4:]
                    for sid, sc in _riff_chunks(sbody, 0, len(sbody)):
                        if sid == b"strh":
                            if len(sc) < _AVI_STREAM_HEADER.size:
                                raise MediaFormatError("strh too small")
                            sv = _AVI_STREAM_HEADER.unpack_from(sc, 0)
                            if sv[0] != b"vids":
                                raise MediaFormatError(
                                    f"non-video stream {sv[0]!r}"
                                )
                            if sv[1] not in (b"DIB ", b"\x00\x00\x00\x00"):
                                raise MediaFormatError(
                                    f"compressed handler {sv[1]!r} "
                                    "unsupported"
                                )
                            strh_seen = True
                        elif sid == b"strf":
                            if len(sc) < _BMP_INFO_HEADER.size:
                                raise MediaFormatError("strf too small")
                            (
                                bi_size, bw, bh, planes, bpp, comp,
                                _sz, _x, _y, _cu, _ci,
                            ) = _BMP_INFO_HEADER.unpack_from(sc, 0)
                            if bi_size < _BMP_INFO_SIZE:
                                raise MediaFormatError(
                                    "unsupported strf header"
                                )
                            if planes != 1 or bpp != 8 or comp != 0:
                                raise MediaFormatError(
                                    "only uncompressed 8-bpp AVI "
                                    "frames supported"
                                )
                            if width is not None and (
                                bw != width or bh != height
                            ):
                                raise MediaFormatError(
                                    f"strf dims {bw}x{bh} != avih "
                                    f"{width}x{height}"
                                )
                            strf_seen = True
        elif ltype == b"movi":
            for fid, fbody in _riff_chunks(inner, 0, len(inner)):
                if fid == b"00dc":
                    raise MediaFormatError(
                        "compressed '00dc' frames unsupported"
                    )
                if fid != b"00db":
                    continue  # rec lists / padding chunks
                if width is None:
                    raise MediaFormatError("movi before hdrl")
                stride = bmp_stride(width)
                if len(fbody) != stride * height:
                    raise MediaFormatError(
                        f"frame {len(frames)}: DIB size {len(fbody)} "
                        f"!= stride {stride} × height {height}"
                    )
                farr = np.frombuffer(fbody, dtype=np.uint8)
                fview = farr.reshape(height, stride)[::-1, :width]
                frames.append(np.ascontiguousarray(fview).tobytes())
    if width is None or not strh_seen or not strf_seen:
        raise MediaFormatError("missing hdrl/strh/strf")
    if total_frames != len(frames):
        raise MediaFormatError(
            f"avih declares {total_frames} frames, movi holds "
            f"{len(frames)}"
        )
    return width, height, micros, frames


# ---- ICO (multi-image container; embedded BMPs) --------------------------

_ICONDIR = struct.Struct("<HHH")  # reserved, type(1=icon), count
_ICONDIRENTRY = struct.Struct("<BBBBHHII")  # w h colors res planes bpp size off


def encode_ico(frames: list[tuple[int, int, bytes]]) -> bytes:
    """Serialize frames (each ``(width, height, pixels)`` with logical
    top-down 8-bpp pixels) as a structurally valid .ico: ICONDIR +
    one ICONDIRENTRY per frame + per-frame embedded BMPs — each a
    BITMAPINFOHEADER with the spec's DOUBLED height (XOR pixel block
    + 1-bpp AND transparency mask), 256-entry grayscale palette,
    bottom-up padded rows. Dimensions are capped at 256 (stored as 0
    per the format)."""
    if not frames:
        raise MediaFormatError("ICO needs at least one frame")
    images = []
    for w, h, pixels in frames:
        if not (0 < w <= 256 and 0 < h <= 256):
            raise MediaFormatError(f"ICO frame dims {w}x{h} out of range")
        if len(pixels) != w * h:
            raise MediaFormatError(
                f"frame pixel buffer {len(pixels)} != {w}x{h}"
            )
        stride = bmp_stride(w)
        pad = b"\x00" * (stride - w)
        xor = b"".join(
            pixels[r * w : (r + 1) * w] + pad
            for r in range(h - 1, -1, -1)
        )
        and_stride = (w + 31) // 32 * 4  # 1-bpp rows pad to 32 bits
        and_mask = b"\x00" * (and_stride * h)  # fully opaque
        header = _BMP_INFO_HEADER.pack(
            _BMP_INFO_SIZE, w, h * 2, 1, 8, 0,
            len(xor) + len(and_mask), 0, 0, _BMP_PALETTE_ENTRIES, 0,
        )
        palette = b"".join(
            struct.pack("<BBBB", i, i, i, 0)
            for i in range(_BMP_PALETTE_ENTRIES)
        )
        images.append((w, h, header + palette + xor + and_mask))
    out = [_ICONDIR.pack(0, 1, len(images))]
    offset = _ICONDIR.size + _ICONDIRENTRY.size * len(images)
    entries = []
    for w, h, img in images:
        entries.append(
            _ICONDIRENTRY.pack(
                w % 256, h % 256,  # 256 encodes as 0 per the format
                0, 0, 1, 8, len(img), offset,
            )
        )
        offset += len(img)
    return b"".join(out + entries + [img for _, _, img in images])


def decode_ico(data: bytes) -> list[tuple[int, int, bytes]]:
    """Parse an .ico → ``[(width, height, pixels), ...]`` with logical
    top-down 8-bpp pixels per frame. Validates the directory, each
    embedded BMP header (doubled height, 8-bpp, BI_RGB), and that the
    XOR block + AND mask actually fit the entry; undoes bottom-up
    ordering and row padding."""
    if len(data) < _ICONDIR.size:
        raise MediaFormatError("truncated ICONDIR")
    reserved, ico_type, count = _ICONDIR.unpack_from(data, 0)
    if reserved != 0 or ico_type != 1:
        raise MediaFormatError(
            f"not an icon file (reserved={reserved}, type={ico_type})"
        )
    if count == 0:
        raise MediaFormatError("ICO with zero images")
    frames = []
    for i in range(count):
        epos = _ICONDIR.size + _ICONDIRENTRY.size * i
        if epos + _ICONDIRENTRY.size > len(data):
            raise MediaFormatError(f"truncated ICONDIRENTRY {i}")
        ew, eh, _colors, _res, _planes, bpp, size, off = (
            _ICONDIRENTRY.unpack_from(data, epos)
        )
        w, h = ew or 256, eh or 256  # 0 encodes 256
        img = data[off : off + size]
        if len(img) != size:
            raise MediaFormatError(f"frame {i} image data truncated")
        if img[:8] == b"\x89PNG\r\n\x1a\n":
            raise MediaFormatError("PNG-compressed ICO frames unsupported")
        (
            bi_size, bw, bh, planes, bbpp, compression,
            _sz, _x, _y, _cu, _ci,
        ) = _BMP_INFO_HEADER.unpack_from(img, 0)
        if bi_size < _BMP_INFO_SIZE:
            raise MediaFormatError(f"frame {i}: unsupported header")
        if bw != w or bh != h * 2:
            raise MediaFormatError(
                f"frame {i}: BMP dims {bw}x{bh} != entry {w}x{h}*2 "
                "(the ICO doubled-height contract)"
            )
        if planes != 1 or bbpp != 8 or compression != 0:
            raise MediaFormatError(
                f"frame {i}: only uncompressed 8-bpp supported"
            )
        xor_off = _BMP_INFO_SIZE + 4 * _BMP_PALETTE_ENTRIES
        stride = bmp_stride(w)
        and_stride = (w + 31) // 32 * 4
        need = xor_off + stride * h + and_stride * h
        if len(img) < need:
            raise MediaFormatError(
                f"frame {i}: XOR+AND blocks truncated "
                f"({len(img)} < {need})"
            )
        rows = [
            img[xor_off + r * stride : xor_off + r * stride + w]
            for r in range(h - 1, -1, -1)
        ]
        frames.append((w, h, b"".join(rows)))
    return frames


# ---- PNG (Portable Network Graphics, W3C spec / RFC 2083) ---------------
#
# 8-bit grayscale (colour type 0), non-interlaced, the mandatory
# IHDR/IDAT/IEND chunk sequence, zlib (RFC 1950) compressed scanlines
# — the DEFLATE half comes from the stdlib ``zlib`` module, the PNG
# layer (chunk framing, CRCs, per-scanline filter methods 0-4:
# None/Sub/Up/Average/Paeth) is implemented here from the public spec.
# The encoder deliberately CYCLES the five filter types across rows
# (row r uses filter r % 5, each correctly applied), so a decoder that
# does not implement the full filter reconstruction — including the
# spec's Paeth predictor tie-breaking order — corrupts the pixels and
# fails the content checksum downstream.

_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §6.6): nearest of left/up/up-left
    to the gradient estimate, ties broken left, then up, then
    up-left — the ORDER is normative."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize ``pixels`` (top-down, ``width × height`` bytes, one
    8-bit gray sample per pixel) as a valid non-interlaced grayscale
    PNG. Row ``r`` is written with filter type ``r % 5`` (correctly
    applied per the spec), exercising every reconstruction path."""
    import zlib

    if width <= 0 or height <= 0:
        raise MediaFormatError(f"non-positive dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise MediaFormatError(
            f"pixel buffer {len(pixels)} != {width}x{height}"
        )
    raw = bytearray()
    prev = bytes(width)
    for r in range(height):
        row = pixels[r * width : (r + 1) * width]
        ftype = r % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - 1] if i else 0)) & 0xFF
                for i in range(width)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(width))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - 1] if i else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(width)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - 1] if i else 0,
                        prev[i],
                        prev[i - 1] if i else 0,
                    )
                )
                & 0xFF
                for i in range(width)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse a non-interlaced 8-bit grayscale PNG → ``(width, height,
    pixels)`` top-down. Validates the signature, chunk CRCs, IHDR
    fields, chunk ordering (IHDR first, IEND last, IDAT contiguous
    per spec §5.6), inflates the IDAT stream, and reconstructs all
    five scanline filter types."""
    import zlib

    if data[:8] != _PNG_SIGNATURE:
        raise MediaFormatError("bad PNG signature")
    pos = 8
    width = height = None
    idat = bytearray()
    idat_done = False
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise MediaFormatError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise MediaFormatError(f"truncated {ctype!r} chunk body")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise MediaFormatError(f"CRC mismatch in {ctype!r} chunk")
        if width is None:
            if ctype != b"IHDR":
                raise MediaFormatError(f"first chunk {ctype!r}, not IHDR")
            width, height, depth, ctype_f, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (depth, ctype_f) != (8, 0):
                raise MediaFormatError(
                    f"unsupported PNG variant: depth={depth} colour="
                    f"{ctype_f} (8-bit grayscale only)"
                )
            if comp or filt:
                raise MediaFormatError("nonstandard compression/filter method")
            if interlace:
                raise MediaFormatError("Adam7 interlace unsupported")
            if width <= 0 or height <= 0:
                raise MediaFormatError(f"bad dimensions {width}x{height}")
        elif ctype == b"IDAT":
            if idat_done:
                raise MediaFormatError("non-contiguous IDAT chunks")
            idat += body
        elif ctype == b"IEND":
            seen_end = True
            break
        else:
            if idat:
                idat_done = True  # ancillary chunk after the IDAT run
        pos += 12 + length
    if width is None or not seen_end:
        raise MediaFormatError("missing IHDR or IEND")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (width + 1) * height:
        raise MediaFormatError(
            f"inflated scanline data {len(raw)} != {(width + 1) * height}"
        )
    # row-wise numpy reconstruction (r11): None/Sub/Up are whole-row
    # array ops (Sub = cumsum mod 256, Up = wrapping uint8 add);
    # Average and Paeth keep the per-byte loop — their left-neighbor
    # dependence is inherently sequential (the same split every
    # C decoder makes, minus the C)
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(height, width + 1)
    out = np.empty((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for r in range(height):
        ftype = int(mat[r, 0])
        line = mat[r, 1:]
        if ftype == 0:
            row = line.copy()
        elif ftype == 1:
            # row[i] = sum(line[0..i]) mod 256 == the sequential Sub
            row = np.cumsum(line, dtype=np.uint64).astype(np.uint8)
        elif ftype == 2:
            row = line + prev  # uint8 wraparound == mod 256
        elif ftype == 3:
            row = np.empty(width, dtype=np.uint8)
            line_l, prev_l = line.tolist(), prev.tolist()
            left = 0
            for i in range(width):
                left = (line_l[i] + ((left + prev_l[i]) >> 1)) & 0xFF
                row[i] = left
        elif ftype == 4:
            row = np.empty(width, dtype=np.uint8)
            line_l, prev_l = line.tolist(), prev.tolist()
            left = up_left = 0
            for i in range(width):
                left = (
                    line_l[i] + _paeth(left, prev_l[i], up_left)
                ) & 0xFF
                row[i] = left
                up_left = prev_l[i]
        else:
            raise MediaFormatError(f"unknown filter type {ftype} in row {r}")
        out[r] = row
        prev = row
    return width, height, out.tobytes()
