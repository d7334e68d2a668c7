"""Multimodal plumbing: header parse round-trip, malformed-blob
handling, deterministic feature stub, and the explicit decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from el.multimodal import (
    FEATURE_DIM,
    decode_pixels,
    extract_meta,
    feature_stub,
    gen_blobs,
)


def test_meta_roundtrip_and_determinism(spark):
    blobs = gen_blobs(spark, 50).persist()
    meta = extract_meta(blobs).persist()
    assert meta.count() == 50
    assert meta.where("NOT valid").count() == 0
    assert meta.where("width < 16 OR width > 256").count() == 0
    # deterministic: regenerating yields identical metadata
    meta2 = extract_meta(gen_blobs(spark, 50))
    assert sorted(map(tuple, meta.collect())) == sorted(map(tuple, meta2.collect()))
    blobs.unpersist(); meta.unpersist()


def test_malformed_blob_flagged_not_fatal(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"NOPE")), (2, "image", None)],
        "blob_id long, media_type string, content binary",
    )
    got = {r.blob_id: r for r in extract_meta(df).collect()}
    assert not got[1].valid and got[1].width is None
    assert not got[2].valid and got[2].n_bytes == 0


def test_feature_stub_shape(spark):
    feats = feature_stub(gen_blobs(spark, 20)).persist()
    assert feats.count() == 20
    dims = feats.select(F.size("features").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [FEATURE_DIM]
    bad = feats.where(
        F.exists("features", lambda x: (x < 0) | (x > 1))
    ).count()
    assert bad == 0
    feats.unpersist()


def test_decode_pixels_matches_format_spec():
    """IMG1 decode: payload tiled row-major; pure-python reference."""
    import struct

    import numpy as np

    payload = bytes(range(7))
    content = b"IMG1" + struct.pack("<II", 5, 3) + payload
    px = decode_pixels(content)
    assert px.shape == (3, 5) and px.dtype == np.uint8
    for r in range(3):
        for c in range(5):
            assert px[r, c] == payload[(r * 5 + c) % len(payload)]


def test_decode_malformed_raises_value_error():
    import struct

    with pytest.raises(ValueError):
        decode_pixels(b"IMG1....")  # header too short
    with pytest.raises(ValueError):
        decode_pixels(b"NOPE" + b"\x00" * 20)  # bad magic
    with pytest.raises(ValueError):
        decode_pixels(b"IMG1" + struct.pack("<II", 4, 4))  # no payload
    from el.multimodal import decode_pixels_codec

    with pytest.raises(NotImplementedError):  # real codecs env-blocked
        decode_pixels_codec(b"\xff\xd8\xff")


def test_image_features_end_to_end(spark):
    """mm2 path: decode -> histogram features; distributions sum to 1,
    malformed blobs flagged not fatal, deterministic across runs."""
    from el.multimodal import image_features

    blobs = gen_blobs(spark, 30)
    bad = spark.createDataFrame(
        [(999, "image", bytearray(b"NOPE"))],
        "blob_id long, media_type string, content binary",
    )
    feats = image_features(blobs.unionByName(bad)).persist()
    assert feats.count() == 31
    assert feats.where("NOT decoded").count() == 1
    sums = feats.where("decoded").select(
        F.aggregate("features", F.lit(0.0), lambda a, x: a + x).alias("s")
    )
    assert sums.where(F.abs(F.col("s") - 1.0) > 1e-3).count() == 0
    again = sorted(map(tuple, image_features(gen_blobs(spark, 30)).collect()))
    prev = sorted(
        map(tuple, feats.where("decoded").drop("decoded").collect())
    )
    assert [(r[0], list(r[1])) for r in again] == [
        (r[0], list(r[1])) for r in prev
    ]
    feats.unpersist()


def test_resize_matches_numpy_oracle(spark):
    from el.multimodal import (
        decode_pixels, gen_blobs, resize_images, resize_pixels,
    )

    blobs = gen_blobs(spark, 20)
    raw = {r.blob_id: r.content for r in blobs.collect()}
    out = {r.blob_id: r for r in resize_images(blobs, 8, 6).collect()}
    assert set(out) == set(raw)
    for bid, r in out.items():
        assert r.valid and (r.width, r.height) == (8, 6)
        got = decode_pixels(r.content)
        want = resize_pixels(decode_pixels(raw[bid]), 8, 6)
        assert got.shape == (6, 8)
        assert (got == want).all()


def test_resize_malformed_flagged_not_crashed(spark):
    from el.multimodal import resize_images

    rows = [(1, "image", b"NOPE" + b"\x00" * 20), (2, "image", None)]
    df = spark.createDataFrame(rows, "blob_id long, media_type string, content binary")
    out = {r.blob_id: r for r in resize_images(df).collect()}
    assert not out[1].valid and out[1].content is None
    assert not out[2].valid


def test_frame_sampling_matches_direct_decode(spark):
    from el.multimodal import (
        decode_frame, decode_pixels, gen_video_blobs, sample_frames,
    )

    vids = gen_video_blobs(spark, 10, w=24, h=16, frames=10)
    raw = {r.blob_id: r.content for r in vids.collect()}
    frames = sample_frames(vids, every_k=4).collect()
    got = {(r.blob_id, r.frame_idx): r.content for r in frames}
    # frames 0, 4, 8 per blob
    assert set(i for _, i in got) == {0, 4, 8}
    assert len(got) == 30
    for (bid, idx), content in got.items():
        assert (decode_pixels(content) == decode_frame(raw[bid], idx)).all()


def test_frame_sampling_skips_malformed(spark):
    from el.multimodal import sample_frames

    rows = [(1, "video", b"XXXX" + b"\x00" * 30), (2, "video", None)]
    df = spark.createDataFrame(rows, "blob_id long, media_type string, content binary")
    assert sample_frames(df).count() == 0


def test_audio_features_match_pure_python_oracle(spark):
    import numpy as np

    from el.multimodal import audio_features, decode_samples, gen_audio_blobs

    blobs = gen_audio_blobs(spark, 8, sample_rate=4000, n_samples=1024)
    rows = {r.blob_id: r for r in audio_features(blobs, frame=128).collect()}
    raw = {r.blob_id: bytes(r.content) for r in blobs.collect()}
    assert len(rows) == 8
    for bid, content in raw.items():
        sr, x = decode_samples(content)
        r = rows[bid]
        assert r.valid and r.sample_rate == 4000
        assert r.duration_sec == 1024 / 4000
        assert abs(r.rms - float(np.sqrt(np.mean(x**2)))) < 1e-12
        assert abs(r.peak - float(np.max(np.abs(x)))) < 1e-12
        assert len(r.frame_rms) == 1024 // 128
        f0 = float(np.sqrt(np.mean(x[:128] ** 2)))
        assert abs(r.frame_rms[0] - f0) < 1e-6
        zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        assert abs(r.zcr - zc) < 1e-12


def test_audio_malformed_flagged_not_crashed(spark):
    from el.multimodal import BLOB_SCHEMA, audio_features

    bad = spark.createDataFrame(
        [
            (1, "audio", bytearray(b"AUD1")),          # truncated header
            (2, "audio", bytearray(b"IMG1" + b"\0" * 20)),  # wrong magic
        ],
        BLOB_SCHEMA,
    )
    rows = {r.blob_id: r for r in audio_features(bad).collect()}
    assert not rows[1].valid and rows[1].rms is None
    assert not rows[2].valid


def test_audio_blobs_deterministic(spark):
    from el.multimodal import gen_audio_blobs

    a = {r.blob_id: bytes(r.content) for r in gen_audio_blobs(spark, 5).collect()}
    b = {r.blob_id: bytes(r.content) for r in gen_audio_blobs(spark, 5).collect()}
    assert a == b


def test_audio_single_sample_stream_zcr_zero(spark):
    import struct

    from el.multimodal import AUD_MAGIC, BLOB_SCHEMA, audio_features

    one = AUD_MAGIC + struct.pack("<II", 8000, 1) + struct.pack("<h", -5)
    df = spark.createDataFrame([(1, "audio", bytearray(one))], BLOB_SCHEMA)
    r = audio_features(df).collect()[0]
    assert r.valid and r.zcr == 0.0 and r.frame_rms == []


def _craft_image(seed: int, w: int = 9, h: int = 8):
    import numpy as np

    r, c = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return ((r * 7 + c * 13 + seed * 53) % 251).astype(np.uint8)


def test_dhash_spark_matches_independent_reference(spark):
    import numpy as np

    from el.multimodal import dhash_images, dhash_py, encode_img1

    rows = [
        (i, "image", bytearray(encode_img1(_craft_image(i, 20 + i, 15))))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "blob_id long, media_type string, content binary"
    )
    got = {r.blob_id: r.dhash for r in dhash_images(df).collect()}
    for i in range(6):
        px = _craft_image(i, 20 + i, 15)
        # independent bit-pack reference (explicit loop, not packbits)
        small_r = (np.arange(8) * 15) // 8
        small_c = (np.arange(9) * (20 + i)) // 9
        small = px[np.ix_(small_r, small_c)]
        word = 0
        for rr in range(8):
            for cc in range(8):
                word = (word << 1) | int(small[rr, cc + 1] > small[rr, cc])
        expect = int(np.uint64(word).astype(np.int64))
        assert got[i] == expect == dhash_py(px)


def test_image_neardup_pairs_match_bruteforce_truth(spark):
    import numpy as np

    from el.multimodal import (
        dhash_py,
        encode_img1,
        image_neardup_pairs,
    )

    # 9x8 images -> the NN resize is the identity, so a single-pixel
    # retouch flips at most 2 dhash bits: a guaranteed near-dup.
    imgs = {i: _craft_image(i) for i in range(10)}
    retouched = imgs[0].copy()
    retouched[2, 3] = 255
    imgs[10] = retouched
    rows = [
        (i, "image", bytearray(encode_img1(px))) for i, px in imgs.items()
    ] + [(99, "image", bytearray(b"NOPE"))]
    df = spark.createDataFrame(
        rows, "blob_id long, media_type string, content binary"
    ).repartition(7)

    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in image_neardup_pairs(df, max_hamming=3).collect()
    }
    hashes = {i: dhash_py(px) for i, px in imgs.items()}
    truth = set()
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = bin((hashes[a] ^ hashes[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham <= 3:
                truth.add((a, b, ham))
    assert (0, 10) in {(a, b) for a, b, _ in truth}  # planted pair exists
    assert got == truth  # banding is complete at <=3 and verify exact

    # determinism across partitionings
    got1 = {
        (r.a_id, r.b_id, r.hamming)
        for r in image_neardup_pairs(df.repartition(1), max_hamming=3).collect()
    }
    assert got1 == got


def _aud1(sr: int, samples) -> bytearray:
    import struct

    import numpy as np

    from el.multimodal import AUD_MAGIC

    x = np.asarray(samples, dtype="<i2")
    return bytearray(
        AUD_MAGIC + struct.pack("<II", sr, x.size) + x.tobytes()
    )


def test_afp_spark_matches_independent_reference(spark):
    import numpy as np

    from el.multimodal import audio_fingerprints, afp_py, decode_samples

    rng_rows = []
    for i in range(5):
        # deterministic pseudo-noise, no RNG state
        x = (((np.arange(700) * (i * 7919 + 104729)) % 65536) - 32768).astype(
            "<i2"
        )
        rng_rows.append((i, "audio", _aud1(8000, x)))
    df = spark.createDataFrame(
        rng_rows, "blob_id long, media_type string, content binary"
    )
    got = {r.blob_id: r.afp for r in audio_fingerprints(df).collect()}
    for i, _, content in rng_rows:
        _, x = decode_samples(content)
        # independent reference: explicit per-frame mean-of-squares +
        # shift-or bit pack (no cumsum, no packbits)
        n_frames = 65
        edges = [(k * x.size) // n_frames for k in range(n_frames + 1)]
        energy = [
            float(np.mean(x[edges[k] : edges[k + 1]] ** 2))
            for k in range(n_frames)
        ]
        word = 0
        for k in range(64):
            word = (word << 1) | int(energy[k + 1] > energy[k])
        expect = int(np.uint64(word).astype(np.int64))
        assert got[i] == expect == afp_py(x)


def test_afp_invalid_and_short_blobs_flagged(spark):
    from el.multimodal import audio_fingerprints

    rows = [
        (1, "audio", bytearray(b"NOPE")),
        (2, "audio", _aud1(8000, list(range(10)))),  # < 65 samples
        (3, "audio", _aud1(8000, [(k * 37) % 100 - 50 for k in range(200)])),
    ]
    df = spark.createDataFrame(
        rows, "blob_id long, media_type string, content binary"
    )
    got = {r.blob_id: (r.valid, r.afp) for r in audio_fingerprints(df).collect()}
    assert got[1] == (False, None)
    assert got[2] == (False, None)
    assert got[3][0] is True and got[3][1] is not None


def test_audio_neardup_pairs_match_bruteforce_truth(spark):
    import numpy as np

    from el.multimodal import afp_py, audio_neardup_pairs, decode_samples

    streams = {}
    for i in range(8):
        streams[i] = (
            ((np.arange(2048) * (i * 2654435761 + 40503)) % 65536) - 32768
        ).astype("<i2")
    # planted near-dup: exact halving scales every frame energy by
    # ~0.25 uniformly -> envelope delta signs survive (gain invariance)
    streams[8] = (streams[0].astype(np.int32) // 2).astype("<i2")
    rows = [(i, "audio", _aud1(8000, x)) for i, x in streams.items()]
    rows.append((99, "audio", bytearray(b"NOPE")))
    df = spark.createDataFrame(
        rows, "blob_id long, media_type string, content binary"
    ).repartition(5)

    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in audio_neardup_pairs(df, max_hamming=3).collect()
    }
    hashes = {
        i: afp_py(decode_samples(bytes(_aud1(8000, x)))[1])
        for i, x in streams.items()
    }
    truth = set()
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = bin((hashes[a] ^ hashes[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham <= 3:
                truth.add((a, b, ham))
    assert (0, 8) in {(a, b) for a, b, _ in truth}  # planted pair exists
    assert got == truth  # banding complete at <=3, verify exact

    got1 = {
        (r.a_id, r.b_id, r.hamming)
        for r in audio_neardup_pairs(df.repartition(1), max_hamming=3).collect()
    }
    assert got1 == got


# ---------------------------------------------------------------------------
# mm8: video near-dup by shared frame fingerprints
# ---------------------------------------------------------------------------


def _video_ref_fps(content, every_k=4):
    import struct as _struct

    from el.multimodal import decode_frame, dhash_py

    b = bytes(content)
    n_frames = _struct.unpack("<I", b[12:16])[0]
    return {
        dhash_py(decode_frame(b, i)) for i in range(0, n_frames, every_k)
    }


def test_video_neardup_pairs_copy_truncation_and_distinct(spark):
    import struct as _struct

    from el.multimodal import gen_video_blobs, video_neardup_pairs

    base = gen_video_blobs(spark, 4)  # ids 0-3, 12 frames each
    rows = {r["blob_id"]: bytes(r["content"]) for r in base.collect()}
    b0 = rows[0]
    w, h, n_frames = _struct.unpack("<III", b0[4:16])
    # id 100: exact copy of 0; id 200: first 8 frames of 0 (a trim)
    trunc = b0[:4] + _struct.pack("<III", w, h, 8) + b0[16 : 16 + w * h * 8]
    extra = [(100, "video", b0), (200, "video", trunc)]
    blobs = base.unionByName(
        spark.createDataFrame(
            extra, "blob_id long, media_type string, content binary"
        )
    )
    got = {
        (r["a_id"], r["b_id"]): (r["n_shared"], r["n_a"], r["n_b"])
        for r in video_neardup_pairs(blobs, min_shared=2).collect()
    }
    # brute-force truth from the pure-python fingerprint sets
    fps = {bid: _video_ref_fps(c) for bid, c in rows.items()}
    fps[100], fps[200] = _video_ref_fps(b0), _video_ref_fps(trunc)
    want = {}
    ids = sorted(fps)
    for i, ai in enumerate(ids):
        for bi in ids[i + 1 :]:
            shared = len(fps[ai] & fps[bi])
            if shared >= 2:
                want[(ai, bi)] = (shared, len(fps[ai]), len(fps[bi]))
    assert got == want
    # the planted relationships specifically:
    assert got[(0, 100)][0] == 3          # exact copy: all 3 sampled fps
    assert got[(0, 200)][0] == 2          # trim: frames 0 and 4 shared
    assert got[(100, 200)][0] == 2
    assert all(a in (0, 100, 200) and b in (0, 100, 200) for a, b in got)
    # tighter threshold keeps only the exact copy
    got3 = {
        (r["a_id"], r["b_id"])
        for r in video_neardup_pairs(blobs, min_shared=3).collect()
    }
    assert got3 == {(0, 100)}


def test_video_neardup_pairs_partition_invariant_and_guard(spark):
    import pytest as _pytest

    from el.multimodal import gen_video_blobs, video_neardup_pairs

    base = gen_video_blobs(spark, 6)
    dup = base.withColumn("blob_id", F.col("blob_id") + 50)
    blobs = base.unionByName(dup)
    a = {
        tuple(r)
        for r in video_neardup_pairs(blobs.repartition(9), min_shared=1)
        .collect()
    }
    b = {
        tuple(r)
        for r in video_neardup_pairs(blobs.coalesce(1), min_shared=1)
        .collect()
    }
    assert a == b
    assert {(x, y) for x, y, *_ in a} == {(i, i + 50) for i in range(6)}
    with _pytest.raises(ValueError, match="min_shared"):
        video_neardup_pairs(blobs, min_shared=0)
