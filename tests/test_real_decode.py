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

from prefect_flow_arc_indexer_spark.multimodal import binary


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


@pytest.mark.skipif(not binary.HAS_PIL, reason="pillow not installed")
def test_image_real_paths_with_pil(spark):
    """With pillow present: decode_image_real reads true dimensions, resize
    halves them, and the pHash grid comes from decoded luma."""
    img = binary._PILImage.new("RGB", (64, 32), color=(200, 10, 10))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    assert binary.decode_image_real(payload)[:2] == (64, 32)
    media = spark.createDataFrame(
        [(3, "image/png", bytearray(payload), len(payload))],
        binary.MEDIA_SCHEMA,
    )
    [rz] = binary.resize_media(media).collect()
    assert binary.decode_image_real(bytes(rz.resized_payload))[:2] == (32, 16)
    [ph] = binary.image_phash(media).collect()
    assert 0 <= ph.phash < (1 << binary.PHASH_BITS)


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
