"""Multimodal plumbing: schema contract, Arrow batch shapes, magic
sniffing — the parts that survive a real-decoder swap."""

from __future__ import annotations

import pytest

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators import multimodal


def test_binarize_schema(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    assets = multimodal.binarize_text(docs)
    assert [f.name for f in assets.schema.fields] == [
        "asset_id",
        "payload",
        "media_type",
        "n_bytes",
        "content_md5",
    ]
    assert dict(assets.dtypes)["payload"] == "binary"
    r = assets.first()
    assert r["n_bytes"] == len(r["payload"])


def test_extract_features_batch_shape(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    out = multimodal.extract_features(multimodal.binarize_text(docs))
    rows = out.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # deterministic: same payload → same features
    again = multimodal.extract_features(multimodal.binarize_text(docs)).collect()
    assert {r["asset_id"]: r["features"] for r in rows} == {
        r["asset_id"]: r["features"] for r in again
    }


def test_sniff_media_type(spark):
    rows = [
        (1, bytes.fromhex("89504e470d0a1a0a") + b"xxxx"),
        (2, bytes.fromhex("ffd8ffe0") + b"jfif"),
        (3, b"plain text bytes"),
    ]
    df = spark.createDataFrame(rows, "asset_id: long, payload: binary")
    got = {
        r["asset_id"]: r["sniffed_type"]
        for r in multimodal.sniff_media_type(df).collect()
    }
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "application/octet-stream",
    }


def test_decode_hook_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
