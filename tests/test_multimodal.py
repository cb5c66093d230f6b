"""Multimodal plumbing tests: the decode is a stub (no media libs in this
container, operators/multimodal.py), but the Spark-side schema, Arrow
batch flow, and 1->N frame expansion are real and verified here."""

import numpy as np
from pyspark.sql import functions as F

from logset_spark.operators import multimodal as mm


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, ""),
        (3, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_attach_binary_metadata(spark):
    media = mm.attach_binary(_docs(spark))
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[0]["n_bytes"] == len(rows[0]["payload"]) == 43
    assert rows[0]["mime"] == "image/fake"
    assert len(rows[0]["sha256"]) == 64
    assert rows[2]["n_bytes"] == 0
    assert rows[3]["payload"] is None


def test_extract_features_schema_and_determinism(spark):
    media = mm.attach_binary(_docs(spark))
    feats = mm.extract_features(media)
    assert [f.name for f in feats.schema.fields] == [
        "doc_id", "mime", "n_bytes", "features",
    ]
    got = {r["doc_id"]: r["features"] for r in feats.collect()}
    assert got[3] is None  # null payload propagates
    assert len(got[0]) == mm.N_FEATURES
    # matches the stub decoder run driver-side on the same bytes
    expect = mm._decode_payload(b"the quick brown fox jumps over the lazy dog")
    assert np.allclose(got[0], expect.round(6))
    assert abs(sum(got[0]) - 1.0) < 1e-6  # density histogram
    # rerun -> identical (determinism across Arrow batching)
    again = {r["doc_id"]: r["features"] for r in mm.extract_features(media).collect()}
    assert again == got


def test_frame_sample_expansion(spark):
    media = mm.attach_binary(_docs(spark))
    frames = mm.frame_sample(media, n_frames=4)
    pdf = frames.toPandas()
    # empty/null payloads emit no frames; others emit exactly n_frames
    assert set(pdf.doc_id) == {0, 1}
    assert pdf.groupby("doc_id").size().tolist() == [4, 4]
    assert pdf.frame_hash.str.len().eq(32).all()


def test_resize_stub_native(spark):
    media = mm.attach_binary(_docs(spark))
    out = mm.resize_stub(media, target_bytes=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_bytes"] == 10
    assert bytes(rows[0]["payload"]) == b"the quick "
    assert rows[2]["n_bytes"] == 0
    # native path: no Python stage in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
