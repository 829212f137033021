"""Multimodal plumbing: schema, batch shape, deterministic stub decode."""

import numpy as np
import pytest

from sketchlib.spark.multimodal import (decode_stub, extract_features,
                                        frame_sample_plan, make_fake_media,
                                        media_metadata)


@pytest.fixture(scope="module")
def media(spark):
    df = make_fake_media(spark, n=200).cache()
    df.count()
    return df


def test_metadata_never_ships_payload(spark, media):
    meta = media_metadata(media, "media_id", "payload")
    assert meta.count() == 200
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_decode_stub_contract(spark):
    with pytest.raises(NotImplementedError, match="decode"):
        decode_stub(b"xx", "image")
    a = decode_stub(b"same-bytes", "image", fake=True)
    b = decode_stub(b"same-bytes", "image", fake=True)
    c = decode_stub(b"same-bytes", "audio", fake=True)
    assert a.shape == (64,) and a.dtype == np.float32
    assert np.array_equal(a, b)          # deterministic per payload
    assert not np.array_equal(a, c)      # kind-seeded


def test_extract_features_end_to_end(spark, media):
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 200
    assert all(len(r["feature"]) == 64 for r in feats)
    by_id = {r["media_id"]: r["feature"] for r in feats}
    again = {r["media_id"]: r["feature"]
             for r in extract_features(media, fake=True).collect()}
    assert by_id == again  # run-to-run deterministic through Spark


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_ms=5000)
    rows = plan.collect()
    vids = media.filter("kind = 'video'").count()
    assert len({r["media_id"] for r in rows}) == vids
    assert all(r["sample_ms"] % 5000 == 0 for r in rows)
