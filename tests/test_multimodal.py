"""Multimodal plumbing: binary round-trip through Arrow, fake-decoder
determinism, frame sampling arithmetic, REAL PNG decode/resize (pure-stdlib
codec — no skip gates left on the image path)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.functions.png_codec import (
    decode_png,
    encode_png,
    png_dimensions,
    resize_nearest,
)
from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    resize_images,
    sample_frames,
    synth_media,
    synth_png_media,
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


# --- pure-stdlib PNG codec -------------------------------------------------


def test_png_roundtrip_gray_and_rgb():
    gray = (np.arange(9 * 17) % 256).astype(np.uint8).reshape(9, 17)
    assert png_dimensions(encode_png(gray)) == (17, 9)
    out = decode_png(encode_png(gray))
    assert out.shape == (9, 17, 1)
    assert np.array_equal(out[:, :, 0], gray)

    rgb = (np.arange(5 * 7 * 3) % 251).astype(np.uint8).reshape(5, 7, 3)
    out = decode_png(encode_png(rgb))
    assert out.shape == (5, 7, 3)
    assert np.array_equal(out, rgb)


def _apply_filter(ftype: int, px: np.ndarray, bpp: int) -> bytes:
    """Forward-filter scanlines per the PNG spec (the encoder side of what
    _unfilter reverses) so the decoder is exercised on ALL filter types,
    not just the filter-0 rows our encoder emits."""
    h, stride = px.shape
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = px[y].astype(np.int32)
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[x] = (row[x] - pred) & 0xFF
        out.append(ftype)
        out += bytes(filt.astype(np.uint8))
        prior = row
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decoder_handles_every_filter_type(ftype):
    import struct
    import zlib

    px = (np.arange(6 * 11) * 7 % 256).astype(np.uint8).reshape(6, 11)
    ihdr = struct.pack(">IIBBBBB", 11, 6, 8, 0, 0, 0, 0)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(_apply_filter(ftype, px, 1)))
            + chunk(b"IEND", b""))
    out = decode_png(data)
    assert np.array_equal(out[:, :, 0], px)


def test_png_decoder_rejects_junk_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not an image")
    # interlaced header
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(data)


def test_resize_nearest_exact_indices():
    px = np.arange(4 * 4, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(px, 2, 2)
    # floor(i * 4/2): rows/cols 0 and 2
    assert np.array_equal(out, px[[0, 2]][:, [0, 2]])


# --- the real decoder through the Spark plan --------------------------------


def test_real_decoder_decodes_image_dimensions(spark):
    # a genuine PNG round-trips through the Arrow batch and comes back with
    # true pixel dimensions — decoded by the pure-stdlib codec, no PIL
    png = encode_png((np.zeros((9, 17), dtype=np.uint8)))
    rows = [(1, "image", bytearray(png), (17, 9, None, None)),
            (2, "image", bytearray(b"not an image"), (None, None, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: (r.decoded_width, r.decoded_height, r.decoder)
           for r in decode_features(df, "real").collect()}
    assert got[1] == (17, 9, "real")
    assert got[2] == (None, None, "real")  # undecodable payload keeps the row


def test_synth_png_media_decodes_to_formula_dims(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(300)
    feats = decode_features(synth_png_media(d), decoder="real")
    rows = feats.collect()
    assert rows
    for r in rows:
        assert r.decoded_width == r.media_id % 13 + 1
        assert r.decoded_height == r.media_id % 7 + 1


def test_resize_images_real(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(120)
    resized = resize_images(synth_png_media(d), 8, 5).collect()
    assert resized
    for r in resized:
        if r.data is None:
            continue
        assert r.meta.width == 8 and r.meta.height == 5
        px = decode_png(bytes(r.data))
        assert px.shape[:2] == (5, 8)
    # and the pixel content is the nearest-neighbor resample of the source
    src = synth_png_media(d).filter(F.col("media_id") == resized[0].media_id).first()
    expect = resize_nearest(decode_png(bytes(src.data)), 8, 5)
    got = decode_png(bytes(resized[0].data))
    assert np.array_equal(got, expect)


def test_resize_tolerates_undecodable_payload(spark):
    rows = [(1, "image", bytearray(b"junk"), (None, None, None, None)),
            (2, "audio", bytearray(b"pcm"), (None, None, 16000, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(df, 4, 4).collect()
    assert len(out) == 1  # audio row filtered, junk image kept as dead-letter
    assert out[0].media_id == 1 and out[0].data is None
    assert out[0].meta.width is None


def test_png_sequence_container_roundtrip():
    from code_challenge___data_engineer___machinemax_spark.functions.png_codec import (
        encode_png_sequence,
        png_frame_offsets,
    )

    frames = [encode_png(np.full((2, 3), v, dtype=np.uint8)) for v in (0, 7, 255)]
    seq = encode_png_sequence(frames)
    offs = png_frame_offsets(seq)
    assert len(offs) == 3
    for (off, ln), f in zip(offs, frames):
        assert seq[off : off + ln] == f
    with pytest.raises(ValueError, match="truncated|trailing"):
        png_frame_offsets(seq[:-1])


def test_sampled_frame_decode_values(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
        decode_sampled_frames,
        synth_png_video,
    )

    d = load_table(spark, sf_dir, "documents").limit(90)
    out = decode_sampled_frames(synth_png_video(d), every_n=4).collect()
    assert out
    for r in out:
        doc_id, f = r.media_id, r.frame_index
        w, h = doc_id % 5 + 1, doc_id % 4 + 1
        assert (r.width, r.height) == (w, h)
        assert r.pixel_sum == ((doc_id * 7 + f * 13) % 256) * w * h
        assert f % 4 == 0
    # every video got ceil(nf/4) sampled frames
    from collections import Counter

    per = Counter(r.media_id for r in out)
    for doc_id, n in per.items():
        nf = doc_id % 24 + 1
        assert n == (nf - 1) // 4 + 1


def test_sampled_frame_decode_tolerates_corrupt_container(spark):
    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
        decode_sampled_frames,
    )

    rows = [(1, "video", bytearray(b"\x00\x00\x00\x10short"), (None, None, None, 1)),
            (2, "image", bytearray(b"x"), (None, None, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_sampled_frames(df).collect()
    # corrupt container -> ONE dead-letter row (frame -1, NULL evidence);
    # non-video rows contribute nothing
    assert [(r.media_id, r.frame_index, r.width, r.height, r.pixel_sum) for r in out] == [
        (1, -1, None, None, None)
    ]


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


def test_wav_roundtrip_and_chunk_walk():
    import struct

    from code_challenge___data_engineer___machinemax_spark.functions.wav_codec import (
        decode_wav,
        encode_wav,
        wav_info,
    )

    pcm = struct.pack("<6h", 0, 1000, -1000, 32767, -32768, 7)
    wav = encode_wav(pcm, 16000, 2)
    assert decode_wav(wav) == (16000, 2, pcm)
    assert wav_info(wav) == (16000, 2, 3)  # 6 samples / 2 channels

    # odd-length payload: encoder truncates to the 2-byte frame
    assert decode_wav(encode_wav(pcm + b"\x01", 8000, 1))[2] == pcm

    # an extra LIST chunk before data must be walked over, and an
    # odd-length chunk's pad byte respected (RIFF word alignment)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = wav[:12] + extra + wav[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav(patched) == (16000, 2, pcm)

    for bad in [b"", b"RIFFxxxx", wav[:20], b"JUNK" + wav[4:]]:
        try:
            decode_wav(bad)
            assert False, "corrupt container must raise"
        except ValueError:
            pass
    # non-PCM format tag rejected
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    float_wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    try:
        decode_wav(float_wav)
        assert False, "float WAV must raise"
    except ValueError:
        pass


def test_wav_features_dead_letter_rows(spark):
    from code_challenge___data_engineer___machinemax_spark.functions.wav_codec import (
        encode_wav,
    )
    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
        wav_features,
    )

    good = encode_wav(b"\x10\x00\xf0\xff", 8000, 1)  # samples 16, -16
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a wav")), (3, None)],
        "media_id long, data binary",
    )
    rows = {r.media_id: r for r in wav_features(df).collect()}
    assert rows[1].sample_rate == 8000 and rows[1].n_frames == 2
    assert rows[1].sum_sq == 16 * 16 * 2 and rows[1].peak == 16
    assert rows[2].sample_rate is None  # corrupt -> dead-letter NULLs
    assert rows[3].sample_rate is None


def test_wav_zero_channel_header_dead_letters():
    import struct

    from code_challenge___data_engineer___machinemax_spark.functions.wav_codec import (
        decode_wav,
    )

    # crafted fmt: tag=1, channels=0, bits=16 — must raise ValueError so
    # wav_features' dead-letter handler catches it (review finding: a
    # ZeroDivisionError would kill the whole mapInPandas task instead)
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    try:
        decode_wav(wav)
        assert False, "zero-channel fmt must raise ValueError"
    except ValueError:
        pass


def test_pcm_arrow_transport_matches_pandas(spark, sf_dir):
    """mapInArrow and mapInPandas are two transports for one operator:
    identical rows (incl. null-payload and empty-payload edges)."""
    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
        pcm_features,
        pcm_features_arrow,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = synth_media(d).filter(F.col("kind") == "audio")
    a = {r.media_id: r for r in pcm_features_arrow(media).collect()}
    p = {r.media_id: r for r in pcm_features(media).collect()}
    assert a.keys() == p.keys() and len(a) > 0
    for k in a:
        assert a[k] == p[k]

    # null payload propagates nulls through the Arrow path too
    nulled = media.withColumn(
        "data", F.when(F.col("media_id") % 2 == 0, F.col("data"))
    )
    rows = {r.media_id: r for r in pcm_features_arrow(nulled).collect()}
    for mid, r in rows.items():
        if mid % 2 != 0:
            assert r.n_samples is None and r.peak is None


def test_ahash_hand_computed_and_pairing(spark):
    # 2x2 image [[0,255],[0,255]] -> 8x8 nearest: left half 0, right half
    # 255; mean = 32*255//64 = 127 -> right-half bits set in every row:
    # hi = lo = 0xF0F0F0F0. A second identical image must pair at
    # hamming 0; an all-black image (no bit set) must not pair with them.
    import numpy as np
    import pandas as pd  # noqa: F401

    from code_challenge___data_engineer___machinemax_spark.functions.png_codec import (
        encode_png,
    )
    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
        ahash_images,
    )

    stripe = encode_png(np.array([[0, 255], [0, 255]], dtype=np.uint8))
    black = encode_png(np.zeros((3, 3), dtype=np.uint8))
    rows = [
        (1, "image", bytearray(stripe), {"width": 2, "height": 2, "sample_rate": None, "n_frames": None}),
        (2, "image", bytearray(stripe), {"width": 2, "height": 2, "sample_rate": None, "n_frames": None}),
        (3, "image", bytearray(black), {"width": 3, "height": 3, "sample_rate": None, "n_frames": None}),
    ]
    from code_challenge___data_engineer___machinemax_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: (r.ahash_hi, r.ahash_lo) for r in ahash_images(media).collect()}
    assert out[1] == (0xF0F0F0F0, 0xF0F0F0F0)
    assert out[1] == out[2]
    assert out[3] == (0, 0)
    # hamming(stripe, black) = 32 -> far apart; identical pair at 0
    h1, h3 = out[1], out[3]
    ham = bin(h1[0] ^ h3[0]).count("1") + bin(h1[1] ^ h3[1]).count("1")
    assert ham == 32
