"""Minimal pure-stdlib PNG codec (vendored, VERDICT r6 task 4).

This sandbox has no pillow, which left the real-image-decode branch of the
multimodal kernels permanently skipped in CI. This module closes that gap
with a self-contained PNG encoder/decoder built only on ``zlib`` +
``struct``: enough of the spec (ISO/IEC 15948) for the pipeline's decode /
resize / luma-grid kernels and their test fixtures, while PIL remains the
preferred backend whenever it imports.

Supported: 8-bit-per-sample, color types 0 (grayscale), 2 (RGB) and
6 (RGBA), non-interlaced, all five scanline filters on decode (None/Sub/
Up/Average/Paeth), multiple IDAT chunks. Unsupported shapes (palette,
16-bit, interlace) raise ``ValueError`` — callers fall back to the byte
stand-in exactly as they do for any undecodable payload.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_MODE_CHANNELS = {"L": 1, "RGB": 3, "RGBA": 4}
_COLOR_TYPE = {"L": 0, "RGB": 2, "RGBA": 6}
_MODE_FOR_COLOR_TYPE = {0: "L", 2: "RGB", 6: "RGBA"}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    filter_type: int = 0,
) -> bytes:
    """Encode raw row-major samples as a PNG. ``pixels`` is
    ``width*height*channels`` bytes. ``filter_type`` applies one scanline
    filter uniformly (0..4) — useful for pinning the decoder's filter
    reconstruction in tests; 0 (None) is the production default."""
    ch = _MODE_CHANNELS.get(mode)
    if ch is None:
        raise ValueError(f"unsupported mode {mode!r}")
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, "
            f"want {width}x{height}x{ch}"
        )
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        raw.extend(_filter_row(filter_type, row, prev, ch))
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[mode], 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _filter_row(ft: int, row: bytes, prev: bytes, ch: int) -> bytes:
    if ft == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        else:  # Paeth
            out[i] = (x - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Decompression-bomb guard: reject images whose decoded sample plane would
# exceed this many bytes BEFORE inflating the IDAT stream (PIL ships a
# similar pixel cap; this vendored fallback needs its own — ADVICE r7).
MAX_DECODED_BYTES = 64 * 1024 * 1024


def decode_png(payload: bytes) -> tuple[int, int, str, bytes]:
    """Decode a PNG payload -> ``(width, height, mode, pixels)`` with
    ``pixels`` the defiltered row-major samples. ``ValueError`` on anything
    that is not a PNG this codec supports — including corrupt streams whose
    primitives raise ``struct.error``/``zlib.error``/``IndexError``
    internally (callers catch ``ValueError`` only, matching the PIL
    branch's contract; ADVICE r7)."""
    try:
        return _decode_png_inner(payload)
    except ValueError:
        raise
    except (struct.error, zlib.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt PNG payload: {e}") from e


def _decode_png_inner(payload: bytes) -> tuple[int, int, str, bytes]:
    if payload[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = len(_SIGNATURE)
    width = height = ch = -1
    mode = ""
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _MODE_FOR_COLOR_TYPE:
                raise ValueError(f"unsupported color type {color}")
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter/interlace")
            mode = _MODE_FOR_COLOR_TYPE[color]
            ch = _MODE_CHANNELS[mode]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width < 0 or not idat:
        raise ValueError("missing IHDR/IDAT")
    stride = width * ch
    expected = (stride + 1) * height
    # bomb guard: size the output from IHDR and cap the inflate at it — a
    # tiny crafted IDAT can otherwise expand to an arbitrarily large buffer
    # before any post-hoc size check runs (ADVICE r7)
    if expected > MAX_DECODED_BYTES:
        raise ValueError(
            f"decoded size {expected} exceeds cap {MAX_DECODED_BYTES}"
        )
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) > expected or dec.unconsumed_tail or dec.decompress(b"", 1):
        raise ValueError("IDAT inflates past the declared dimensions")
    if len(raw) != expected:
        raise ValueError("IDAT size mismatch")
    # the capped decompress can return exactly `expected` bytes from a
    # stream missing its terminator/adler32 — zlib only verifies the
    # checksum at end-of-stream, so require it (ADVICE r8)
    if not dec.eof:
        raise ValueError("truncated IDAT stream")
    pixels = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        row = _unfilter_row(ft, line, prev, ch)
        pixels[y * stride:(y + 1) * stride] = row
        prev = row
    return width, height, mode, bytes(pixels)


def _unfilter_row(ft: int, line: bytes, prev: bytes, ch: int) -> bytes:
    if ft == 0:
        return line
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = out[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ft == 1:
            out[i] = (x + a) & 0xFF
        elif ft == 2:
            out[i] = (x + b) & 0xFF
        elif ft == 3:
            out[i] = (x + (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
    return bytes(out)


def luma(width: int, height: int, mode: str, pixels: bytes) -> list[int]:
    """Row-major 8-bit luma plane (ITU-R 601 integer weights, the same
    coefficients PIL's ``convert('L')`` uses)."""
    if mode == "L":
        return list(pixels)
    ch = _MODE_CHANNELS[mode]
    return [
        (pixels[i] * 299 + pixels[i + 1] * 587 + pixels[i + 2] * 114) // 1000
        for i in range(0, width * height * ch, ch)
    ]


def halve(
    width: int, height: int, mode: str, pixels: bytes
) -> tuple[int, int, bytes]:
    """Point-sample every other pixel in both axes (min 1px) — the
    no-dependency resize the kernels use when PIL is absent."""
    ch = _MODE_CHANNELS[mode]
    nw, nh = max(1, width // 2), max(1, height // 2)
    out = bytearray(nw * nh * ch)
    for y in range(nh):
        src_row = (y * 2) * width * ch
        dst_row = y * nw * ch
        for x in range(nw):
            s = src_row + (x * 2) * ch
            d = dst_row + x * ch
            out[d:d + ch] = pixels[s:s + ch]
    return nw, nh, bytes(out)
