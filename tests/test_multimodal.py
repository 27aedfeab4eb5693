"""Multimodal plumbing gates: schema, batch shape, determinism of the
stubbed decode, frame-sampling plan, and the NotImplementedError codec
boundary."""

from __future__ import annotations

import numpy as np
import pytest

from zh_ner_tf_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    fake_decode,
    frame_sample,
    gen_media,
    real_decode,
)


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(gen_media(48), MEDIA_SCHEMA)


def test_feature_extraction_schema_and_determinism(spark, media_df):
    out = extract_media_features(media_df, dim=16)
    assert [f.name for f in out.schema] == ["media_id", "n_bytes", "features"]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 48
    fixture = {t[0]: t[2] for t in gen_media(48)}
    for mid, row in rows.items():
        want = fake_decode(fixture[mid], 16)
        assert row["n_bytes"] == len(fixture[mid])
        assert np.allclose(np.array(row["features"], dtype=np.float32), want)
        assert len(row["features"]) == 16


def test_feature_extraction_partition_invariance(spark, media_df):
    a = {
        r["media_id"]: tuple(r["features"])
        for r in extract_media_features(media_df.repartition(1), dim=8).collect()
    }
    b = {
        r["media_id"]: tuple(r["features"])
        for r in extract_media_features(media_df.repartition(16), dim=8).collect()
    }
    assert a == b


def test_features_feed_similarity_search(spark, media_df):
    from pyspark.sql import functions as F

    from zh_ner_tf_spark.operators.similarity import brute_force_topk

    feats = extract_media_features(media_df, dim=16).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    queries = feats.filter("vec_id = 0").selectExpr(
        "vec_id as query_id", "embedding"
    )
    top = brute_force_topk(feats, queries, k=3).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-6


def test_frame_sampling_plan(spark, media_df):
    vids = media_df.filter("kind = 'video'")
    plan = frame_sample(vids, every_n=50)
    got = {}
    for r in plan.collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    fixture = {t[0]: t[6] for t in gen_media(48) if t[1] == "video"}
    assert set(got) == set(fixture)
    for mid, idxs in got.items():
        assert sorted(idxs) == list(range(0, fixture[mid], 50))


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00", 8)


def test_resize_media_updates_payload_and_metadata(spark):
    """resize_media keeps the schema, rewrites payload deterministically
    (pinned fake-resize values), scales payload size with target pixel
    count, and updates width/height metadata — all inside one Arrow pass."""
    from pyspark.sql import functions as F

    from zh_ner_tf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        fake_resize,
        gen_media,
        resize_media,
    )

    media = spark.createDataFrame(gen_media(12), MEDIA_SCHEMA)
    images = media.filter(F.col("kind") == "image")
    out = resize_media(images, 64, 48)
    assert out.schema == images.schema
    rows = {r["media_id"]: r for r in out.collect()}
    src = {r["media_id"]: r for r in images.collect()}
    assert rows.keys() == src.keys() and len(rows) > 0
    for mid, r in rows.items():
        want = fake_resize(bytes(src[mid]["payload"]), 64, 48)
        assert bytes(r["payload"]) == want
        assert (r["width"], r["height"]) == (64, 48)
        assert len(bytes(r["payload"])) == max(16, 64 * 48 // 1024)
    # None payload passes through as None
    none_df = spark.createDataFrame(
        [(99, "image", None, 1, 1, None, None)], MEDIA_SCHEMA
    )
    assert resize_media(none_df, 64, 48).first()["payload"] is None
