"""Real decoders behind optional imports (VERDICT r5 task 5): stdlib-wave
WAV decode is always real; PIL paths run when pillow is importable (skipif
otherwise); every kernel falls back to the deterministic byte stand-in on a
non-decodable payload, keeping the registered oracles unchanged."""

from __future__ import annotations

import io
import math
import wave

import numpy as np
import pytest

from prefect_flow_arc_indexer_spark.multimodal import binary, png_mini


def _wav_bytes(samples: list[int], sampwidth: int = 1, n_ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sampwidth)
        w.setframerate(8000)
        if sampwidth == 1:
            w.writeframes(bytes(samples))
        else:
            w.writeframes(np.array(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_decode_audio_real_roundtrips_8_and_16_bit():
    s8 = list(range(200))
    assert binary.decode_audio_real(_wav_bytes(s8)).tolist() == s8
    s16 = [-32768, -1, 0, 1, 32767] * 20
    assert binary.decode_audio_real(_wav_bytes(s16, sampwidth=2)).tolist() == s16
    # stereo: first channel only
    stereo = _wav_bytes([10, 99] * 64, sampwidth=1, n_ch=2)
    assert binary.decode_audio_real(stereo).tolist() == [10] * 64


def test_decode_audio_real_rejects_non_wav():
    with pytest.raises(ValueError, match="RIFF"):
        binary.decode_audio_real(b"plain ascii text payload")


def test_audio_energy_takes_real_wav_path(spark):
    """A real WAV payload is decoded through the container (header stripped,
    PCM samples extracted) — the RMS must be computed over the SAMPLES we
    wrote, not over the raw payload bytes (which include the 44-byte
    header and would shift every window)."""
    samples = [(i * 37) % 256 for i in range(binary.AUDIO_WINDOW * 2)]
    payload = _wav_bytes(samples)
    media = spark.createDataFrame(
        [(1, "audio/wav", bytearray(payload), len(payload))],
        binary.MEDIA_SCHEMA,
    )
    rows = {r.window_idx: r for r in binary.audio_energy(media).collect()}
    assert set(rows) == {0, 1}
    for w in (0, 1):
        win = samples[w * binary.AUDIO_WINDOW: (w + 1) * binary.AUDIO_WINDOW]
        want = round(math.sqrt(sum(v * v for v in win) / binary.AUDIO_WINDOW), 6)
        assert rows[w].rms == want and rows[w].peak == max(win)


def test_audio_energy_fallback_matches_byte_standin(spark):
    """A non-WAV payload takes the stand-in path: bytes as 8-bit PCM."""
    raw = bytes([(i * 11) % 256 for i in range(binary.AUDIO_WINDOW)])
    media = spark.createDataFrame(
        [(1, "audio/wav", bytearray(raw), len(raw))], binary.MEDIA_SCHEMA
    )
    [row] = binary.audio_energy(media).collect()
    want = round(math.sqrt(sum(v * v for v in raw) / binary.AUDIO_WINDOW), 6)
    assert row.rms == want


def test_speech_vad_and_spectral_accept_real_wav(spark):
    """The VAD and FFT kernels run the same real-first dispatch."""
    samples = [128 + int(100 * math.sin(i / 3)) for i in range(binary.AUDIO_WINDOW)]
    payload = _wav_bytes(samples)
    media = spark.createDataFrame(
        [(1, "audio/wav", bytearray(payload), len(payload))],
        binary.MEDIA_SCHEMA,
    )
    [vad] = media.mapInPandas(binary._vad_batches, binary.VAD_SCHEMA).collect()
    assert vad.ss == sum(v * v for v in samples)
    [spec] = binary.audio_spectral(media).collect()
    assert spec.dominant_bin >= 1  # a real sinusoid has a spectral peak


def _png_fixture(width: int = 64, height: int = 32) -> bytes:
    """A real PNG payload, built without pillow: a top-dark/bottom-bright
    RGB gradient (luma varies along y, so the row-chunked grid cells see
    different averages and the fingerprint has structure)."""
    px = bytearray()
    for y in range(height):
        v = (y * 255) // max(1, height - 1)
        px += bytes((v, v // 2, 255 - v)) * width
    return png_mini.encode_png(width, height, bytes(px), "RGB")


def test_image_real_paths(spark):
    """The real-image branch runs regardless of pillow (VERDICT r6 task 4):
    decode_image_real reads true dimensions, resize halves them and
    re-encodes a decodable PNG, and the pHash grid comes from decoded
    luma — the fixture is built with the vendored encoder, so this test
    never skips."""
    payload = _png_fixture()
    assert binary.decode_image_real(payload)[:2] == (64, 32)
    media = spark.createDataFrame(
        [(3, "image/png", bytearray(payload), len(payload))],
        binary.MEDIA_SCHEMA,
    )
    [rz] = binary.resize_media(media).collect()
    assert binary.decode_image_real(bytes(rz.resized_payload))[:2] == (32, 16)
    [ph] = binary.image_phash(media).collect()
    assert 0 < ph.phash < (1 << binary.PHASH_BITS)
    # the gradient's bright half sets high-index grid cells above the mean:
    # the fingerprint must come from decoded luma, not strided payload bytes
    n = len(payload)
    byte_standin = [
        payload[j * n // binary.PHASH_BITS] for j in range(binary.PHASH_BITS)
    ]
    s = sum(byte_standin)
    standin_hash = sum(
        1 << j
        for j, v in enumerate(byte_standin)
        if binary.PHASH_BITS * v > s
    )
    assert ph.phash != standin_hash


def test_png_mini_roundtrip_all_filters_and_modes():
    """The vendored codec reconstructs every scanline filter and mode."""
    w, h = 9, 5
    for mode, ch in (("L", 1), ("RGB", 3), ("RGBA", 4)):
        px = bytes(((x * 37 + c * 11) % 256) for x in range(w * h) for c in range(ch))
        for ft in range(5):
            enc = png_mini.encode_png(w, h, px, mode, filter_type=ft)
            assert png_mini.decode_png(enc) == (w, h, mode, px)


def test_png_mini_rejects_non_png_and_bad_shapes():
    with pytest.raises(ValueError, match="not a PNG"):
        png_mini.decode_png(b"just ascii text payload")
    with pytest.raises(ValueError, match="pixel buffer"):
        png_mini.encode_png(2, 2, b"\x00" * 3, "L")
    # halve: point-samples every other pixel, min 1px
    w, h, px = png_mini.halve(4, 1, "L", bytes([10, 20, 30, 40]))
    assert (w, h, px) == (2, 1, bytes([10, 30]))


def _chunk(tag: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(body)) + tag + body + b"\0\0\0\0"


def test_png_mini_corrupt_streams_surface_as_valueerror():
    """Every parse failure must be a ValueError — the binary.py callers
    catch only ValueError, so a raw zlib.error/struct.error from one
    corrupt payload would crash the whole mapInPandas task (ADVICE r7)."""
    import struct

    sig = png_mini._SIGNATURE
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    # IDAT that is not a zlib stream (raised zlib.error before)
    with pytest.raises(ValueError, match="corrupt PNG"):
        png_mini.decode_png(
            sig + ihdr + _chunk(b"IDAT", b"notzlib") + _chunk(b"IEND", b"")
        )
    # IHDR body shorter than the 13-byte layout (raised struct.error)
    with pytest.raises(ValueError, match="corrupt PNG"):
        png_mini.decode_png(
            sig + _chunk(b"IHDR", b"\x00\x01") + _chunk(b"IEND", b"")
        )


def test_png_mini_decompression_bomb_rejected_before_inflate():
    """A small payload declaring absurd dimensions must be rejected from
    the IHDR alone — and an IDAT inflating past the declared size must
    stop at the cap, not materialize the bomb (ADVICE r7)."""
    import struct
    import zlib

    sig = png_mini._SIGNATURE
    huge = _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 100_000, 100_000, 8, 0, 0, 0, 0)
    )
    with pytest.raises(ValueError, match="exceeds cap"):
        png_mini.decode_png(
            sig
            + huge
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b"")
        )
    # declared 1x1 L (expected 2 raw bytes) but the IDAT inflates to 1 MiB:
    # the capped inflate must cut it off with ValueError, never allocate it
    tiny = _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
    bomb = _chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
    with pytest.raises(ValueError, match="inflates past"):
        png_mini.decode_png(sig + tiny + bomb + _chunk(b"IEND", b""))


@pytest.mark.skipif(binary.HAS_PIL, reason="pins the png_mini-only branch")
def test_decode_image_real_non_png_raises_without_pil():
    """Without pillow, only PNG has a real decoder — a JPEG-ish payload hits
    the clearly-fenced NotImplementedError boundary."""
    with pytest.raises(NotImplementedError, match="non-PNG"):
        binary.decode_image_real(b"\xff\xd8\xff\xe0 not a png")


def test_image_fallback_without_decodable_payload(spark):
    """A text payload (never a valid PNG) takes the strided-byte stand-in in
    BOTH kernels, regardless of whether PIL is installed — this is what
    keeps q_media_resize/q_image_phash on their oracles."""
    raw = b"just ascii text playing an opaque payload for the demo corpus!!"
    media = spark.createDataFrame(
        [(3, "image/png", bytearray(raw), len(raw))], binary.MEDIA_SCHEMA
    )
    [rz] = binary.resize_media(media).collect()
    assert bytes(rz.resized_payload) == raw[:: binary.RESIZE_STRIDE]
    [ph] = binary.image_phash(media).collect()
    n = len(raw)
    vs = [raw[j * n // binary.PHASH_BITS] for j in range(binary.PHASH_BITS)]
    s = sum(vs)
    want = sum(1 << j for j, v in enumerate(vs) if binary.PHASH_BITS * v > s)
    assert ph.phash == want
