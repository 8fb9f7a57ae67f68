"""Multimodal binary-column plumbing: schema, Arrow batch shape, stubbed
decode, oracle parity."""

from __future__ import annotations

import pytest

from prefect_flow_arc_indexer_spark.multimodal import binary
from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle


def test_media_frame_schema_and_payload(spark):
    media = binary.media_frame(spark, SF_DIR)
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "n_bytes": "bigint",
    }
    row = media.orderBy("doc_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.n_bytes == len(row.payload)
    assert row.media_type in {"image/png", "audio/wav", "video/mp4"}


def test_extract_features_matches_oracle(spark, duck):
    rq = all_queries()["q_multimodal_meta"]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def test_fake_decode_is_deterministic_and_bounded():
    w, h, f, m = binary._fake_decode_features(b"hello world, this is a payload")
    assert (w, h, f, m) == binary._fake_decode_features(
        b"hello world, this is a payload"
    )
    assert 16 <= w < 16 + 640 and 16 <= h < 16 + 480 and 1 <= f <= 24


@pytest.mark.skipif(binary.HAS_PIL, reason="PIL installed: real path active")
def test_real_decode_is_explicit_stub_without_pil():
    with pytest.raises(NotImplementedError, match="decode"):
        binary.decode_image_real(b"\x89PNG...")


def test_audio_energy_window_math(spark):
    """Windows are full-size only, rms is bounded by the byte range, and
    the row count equals sum(floor(n_bytes/64)) over audio rows."""
    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        AUDIO_WINDOW,
        audio_energy,
        media_frame,
    )
    from pyspark.sql import functions as F

    media = media_frame(spark, "/root/testdata/sf0.001")
    out = audio_energy(media).collect()
    expected_rows = (
        media.where(F.col("media_type") == "audio/wav")
        .select(F.sum(F.floor(F.col("n_bytes") / AUDIO_WINDOW)))
        .first()[0]
    )
    assert len(out) == expected_rows
    for r in out:
        assert 0.0 <= r["rms"] <= 127.0  # ASCII payload bytes
        assert 0 <= r["peak"] <= 127
        assert r["rms"] <= r["peak"]  # RMS never exceeds the peak sample


def test_audio_energy_stays_arrow_batched(spark):
    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        audio_energy,
        media_frame,
    )

    plan = (
        audio_energy(media_frame(spark, "/root/testdata/sf0.001"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_image_phash_bits_and_bands(spark, duck):
    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        PHASH_BAND_BITS,
        PHASH_BITS,
        image_phash,
        media_frame,
    )
    from prefect_flow_arc_indexer_spark.plans.registry import all_queries
    from tests.helpers import assert_matches_oracle

    out = image_phash(media_frame(spark, "/root/testdata/sf0.001")).collect()
    assert out
    mask = (1 << PHASH_BAND_BITS) - 1
    hashes = set()
    for r in out:
        assert 0 <= r["phash"] < (1 << PHASH_BITS)
        # band keys decompose the fingerprint exactly
        for b in range(4):
            assert r[f"band{b}"] == (r["phash"] >> (b * PHASH_BAND_BITS)) & mask
        hashes.add(r["phash"])
    assert len(hashes) > 1  # fingerprints discriminate, not collapsed
    assert_matches_oracle(
        all_queries()["q_image_phash"].builder(spark, "/root/testdata/sf0.001"),
        duck,
        all_queries()["q_image_phash"].oracle,
    )


def test_phash_pairs_verified_hamming(spark, duck):
    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        PHASH_HAMMING_MAX,
    )
    from prefect_flow_arc_indexer_spark.plans.registry import all_queries
    from tests.helpers import assert_matches_oracle

    q = all_queries()["q_phash_pairs"]
    rows = q.builder(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= PHASH_HAMMING_MAX
    assert_matches_oracle(
        q.builder(spark, "/root/testdata/sf0.001"), duck, q.oracle
    )
