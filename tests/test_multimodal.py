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
