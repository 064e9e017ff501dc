"""Multimodal plumbing tests: binary payload schema, stubbed decode,
deterministic fake features, frame-sampling plan."""

import numpy as np
import pytest

from gazetteer_entity_parser_spark.operators.multimodal import (
    extract_media_features,
    fake_decode,
    frame_sample_plan,
    real_decode,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text number {i} " * (i + 1)) for i in range(9)],
        "doc_id bigint, text string",
    )
    return synthesize_media(docs)


def test_media_schema_and_modalities(spark, media):
    rows = media.collect()
    assert {r["modality"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert isinstance(r["payload"], (bytes, bytearray))
        assert r["meta"]["width"] >= 32 and r["meta"]["sample_rate"] == 16000


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"xx", "image")


def test_fake_decode_deterministic():
    f1 = fake_decode(b"hello world", "image")
    f2 = fake_decode(b"hello world", "audio")
    assert np.allclose(f1, f2)
    assert f1.shape == (16,)
    assert abs(f1.sum() - 1.0) < 1e-6
    assert fake_decode(b"", "image").sum() == 0.0


def test_extract_media_features(spark, media):
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    payloads = {r["media_id"]: r["payload"] for r in media.collect()}
    assert set(feats) == set(payloads)
    for mid, r in feats.items():
        assert r["n_bytes"] == len(payloads[mid])
        expected = fake_decode(bytes(payloads[mid]), r["modality"])
        assert np.allclose(np.array(r["features"], dtype=np.float32), expected, atol=1e-6)


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_n=10).collect()
    by_media = {}
    for r in plan:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    metas = {r["media_id"]: r["meta"]["n_frames"] for r in media.collect() if r["modality"] == "video"}
    assert set(by_media) == set(metas)
    for mid, frames in by_media.items():
        assert frames == list(range(0, metas[mid], 10))


def test_resize_media(spark):
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from gazetteer_entity_parser_spark.operators.multimodal import (
        fake_resize,
        resize_media,
        synthesize_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = synthesize_media(docs)
    resized = resize_media(media, width=16, height=8)
    rows = {r["media_id"]: r for r in resized.collect()}
    orig = {r["media_id"]: r for r in media.collect()}
    assert rows.keys() == orig.keys()
    for mid, r in rows.items():
        o = orig[mid]
        if r["modality"] == "image":
            assert len(r["payload"]) == 16 * 8
            assert r["meta"]["width"] == 16 and r["meta"]["height"] == 8
            assert bytes(r["payload"]) == fake_resize(bytes(o["payload"]), 16, 8)
        else:
            assert bytes(r["payload"]) == bytes(o["payload"])
            assert r["meta"] == o["meta"]


def test_fake_resize_deterministic_and_size_exact():
    from gazetteer_entity_parser_spark.operators.multimodal import fake_resize

    assert fake_resize(b"", 4, 4) == bytes(16)
    out = fake_resize(b"hello world", 8, 1)
    assert len(out) == 8
    assert out == fake_resize(b"hello world", 8, 1)
