"""Multimodal plumbing: binary columns through Arrow stages (decode is a
deterministic fake — no image libs in this container)."""

from __future__ import annotations

import hashlib

from military_entity_extraction_based_on_large_models_spark.operators import multimodal


def _media(spark):
    rows = [
        ("m1", "image", b"\x89PNG-fake-bytes-1", 0, 0, 0),
        ("m2", "image", b"\x89PNG-fake-bytes-2", 0, 0, 0),
        ("m3", "audio", None, 0, 0, 0),  # null payload → error row
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_feature_extraction_deterministic(spark):
    media = _media(spark)
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert len(feats) == 3
    assert feats["m1"]["payload_sha"] == hashlib.sha256(b"\x89PNG-fake-bytes-1").hexdigest()
    assert feats["m1"]["n_bytes"] == 17
    assert feats["m1"]["error"] is None
    # error containment, not task failure
    assert feats["m3"]["error"] is not None and feats["m3"]["payload_sha"] is None
    # determinism
    again = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert feats["m2"]["feat_0"] == again["m2"]["feat_0"]


def test_resize_stub_schema(spark):
    media = _media(spark)
    out = multimodal.resize_stub(media, 224, 224)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    assert all(r["width"] == 224 for r in out.collect())
