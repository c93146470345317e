"""Multimodal plumbing tests: binary payloads through Arrow kernels."""

from __future__ import annotations

import hashlib

import pytest

from graphlite_spark.operators.multimodal import (
    decode_image_stub,
    extract_binary_meta,
    frame_sample_stub,
    resize_stub,
    with_binary_payload,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark graphs"), (3, "x")],
        "doc_id long, text string",
    )


def test_extract_binary_meta(spark, docs):
    rows = {r["doc_id"]: r for r in extract_binary_meta(with_binary_payload(docs)).collect()}
    assert rows[1]["byte_len"] == len(b"hello world")
    assert rows[1]["digest"] == hashlib.md5(b"hello world").hexdigest()


def test_decode_stub_raises_without_fake(spark, docs):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_image_stub(with_binary_payload(docs)).collect()


def test_fake_decode_resize_frames_pipeline(spark, docs):
    payload = with_binary_payload(docs)
    decoded = decode_image_stub(payload, fake=True)
    drows = {r["doc_id"]: r for r in decoded.collect()}
    assert all(16 <= r["width"] <= 1040 and r["n_frames"] >= 1 for r in drows.values())

    meta = extract_binary_meta(payload)
    resized = resize_stub(meta, 64, 64, fake=True)
    rrows = {r["doc_id"]: r for r in resized.collect()}
    assert all(r["width"] == 64 and len(r["payload"]) == 16 for r in rrows.values())

    frames = frame_sample_stub(decoded, every=8, fake=True)
    frows = frames.collect()
    got = sum(1 for r in frows if r["doc_id"] == 1)
    want = len(range(0, drows[1]["n_frames"], 8))
    assert got == want
    assert all(r["frame_idx"] % 8 == 0 for r in frows)
