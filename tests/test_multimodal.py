"""Multimodal plumbing: binary round-trip through Arrow, fake-decoder
determinism, frame sampling arithmetic, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
    decode_features,
    resize_images,
    sample_frames,
    synth_media,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synth_media(load_table(spark, sf_dir, "documents"))


def test_media_schema_and_kinds(media):
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.filter(F.col("kind") == "image").first()
    assert isinstance(row.data, (bytes, bytearray))
    assert row.meta.width is not None and row.meta.sample_rate is None


def test_fake_decode_features_deterministic(media):
    f1 = {r.media_id: (r.n_bytes, r.byte_mean, r.byte_entropy)
          for r in decode_features(media, "fake").collect()}
    f2 = {r.media_id: (r.n_bytes, r.byte_mean, r.byte_entropy)
          for r in decode_features(media, "fake").collect()}
    assert f1 == f2
    # n_bytes must equal the binary length computed JVM-side
    jvm = {r.media_id: r.n for r in media.select("media_id", F.octet_length("data").alias("n")).collect()}
    assert all(f1[k][0] == jvm[k] for k in jvm)
    assert all(v[2] is None or v[2] >= 0 for v in f1.values())


def test_frame_sampling_arithmetic(media):
    frames = sample_frames(media, every_n=24)
    per = frames.groupBy("media_id", "n_frames").count().collect()
    for r in per:
        expect = (r.n_frames - 1) // 24 + 1
        assert r["count"] == expect


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="PIL present: the real path is live, not gated")
def test_real_decoder_stub_gates_clearly(media):
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_features(media, "real")


def test_resize_stub_gates_clearly(media):
    with pytest.raises(NotImplementedError, match="codec"):
        resize_images(media, 224, 224)


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed in this container")
def test_real_decoder_decodes_image_dimensions(spark):
    # proven the day the container gains PIL: a genuine PNG round-trips
    # through the Arrow batch and comes back with true pixel dimensions
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    rows = [(1, "image", bytearray(buf.getvalue()), (17, 9, None, None)),
            (2, "image", bytearray(b"not an image"), (None, None, None, None))]
    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: (r.decoded_width, r.decoded_height, r.decoder)
           for r in decode_features(df, "real").collect()}
    assert got[1] == (17, 9, "real")
    assert got[2] == (None, None, "real")  # undecodable payload keeps the row


def test_pcm_features_crafted_bytes(spark):
    """Known PCM16 payloads: signed decode, zero-crossing rule (sign change
    across the >=0 / <0 boundary), odd-byte truncation, empty payload."""
    import struct

    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
        pcm_features,
    )

    samples = [100, -200, 300, 0, -1]  # 3 sign flips: +/-, -/+, +/- (0 is +)
    payload = struct.pack("<5h", *samples) + b"\x7f"  # trailing odd byte dropped
    rows = [
        (1, payload),
        (2, b""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: r for r in pcm_features(df).collect()}
    assert got[1].n_samples == 5
    assert got[1].sum_sq == sum(s * s for s in samples)
    assert got[1].zero_crossings == 3
    assert got[1].peak == 300
    assert got[2].n_samples == 0 and got[2].sum_sq == 0
    assert got[3].n_samples is None
