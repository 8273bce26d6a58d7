"""Multimodal plumbing: schemas, batch shapes, fan-out, determinism."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def assets(spark):
    from bgg_data_warehouse_spark.multimodal import attach_fake_payload

    docs = spark.createDataFrame(
        [(1, "abcdef" * 30), (2, "zy" * 10), (3, "q")],
        "doc_id long, text string",
    )
    return attach_fake_payload(docs, "doc_id", "text")


def test_asset_schema(assets):
    assert [f.name for f in assets.schema.fields] == [
        "asset_id",
        "media_type",
        "payload",
        "meta",
    ]
    row = assets.where("asset_id = 1").collect()[0]
    assert bytes(row.payload) == b"abcdef" * 30
    assert row.meta.n_bytes == 180


def test_extract_image_features_deterministic(spark, assets):
    from bgg_data_warehouse_spark.multimodal import extract_image_features

    out1 = {r.asset_id: r for r in extract_image_features(assets).collect()}
    out2 = {r.asset_id: r for r in extract_image_features(assets).collect()}
    assert out1.keys() == {1, 2, 3}
    for k in out1:
        assert out1[k] == out2[k]
    r = out1[1]
    assert r.n_bytes == 180
    assert 1 <= r.width <= 64 and 1 <= r.height <= 64
    assert r.mean_byte == sum(b"abcdef" * 30) / 180


def test_real_decode_is_stubbed():
    from bgg_data_warehouse_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_fanout(spark, assets):
    from bgg_data_warehouse_spark.multimodal import sample_frames

    out = sample_frames(assets, every_n_bytes=64).collect()
    per_asset = {}
    for r in out:
        per_asset.setdefault(r.asset_id, []).append(r)
    assert len(per_asset[1]) == 3  # 180 bytes / 64 → 3 windows
    assert len(per_asset[2]) == 1
    assert len(per_asset[3]) == 1
    assert [f.frame_index for f in sorted(per_asset[1], key=lambda x: x.frame_index)] == [0, 1, 2]
    assert all(f.frame_hash >= 0 for f in out)
