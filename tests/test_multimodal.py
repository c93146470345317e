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


# ---------------------------------------------------------------------------
# REAL kernels (pure-numpy parsers — no codec libraries)
# ---------------------------------------------------------------------------

def _make_ppm(w, h, value=7):
    import numpy as np

    from graphlite_spark.operators.multimodal import _ppm_bytes

    px = np.full((h, w, 3), value, dtype=np.uint8)
    px[0, 0] = [255, 0, 0]  # a marker pixel
    return _ppm_bytes(px)


def test_decode_ppm_real(spark):
    from graphlite_spark.operators.multimodal import decode_ppm

    df = spark.createDataFrame(
        [(1, _make_ppm(10, 6)), (2, _make_ppm(3, 4, value=100))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_ppm(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_pixels"]) == (10, 6, 60)
    assert (got[2]["width"], got[2]["height"]) == (3, 4)
    # mean_r of doc 2: 11 pixels of 100 + one 255 marker
    assert abs(got[2]["mean_r"] - (100 * 11 + 255) / 12) < 1e-6


def test_resize_ppm_real_roundtrip(spark):
    from graphlite_spark.operators.multimodal import decode_ppm, resize_ppm

    df = spark.createDataFrame(
        [(1, _make_ppm(20, 12))], "doc_id long, payload binary"
    )
    resized = resize_ppm(df, target_w=5, target_h=3)
    out = decode_ppm(resized).collect()[0]
    assert (out["width"], out["height"]) == (5, 3)


def test_sample_ppm_frames_real(spark):
    from graphlite_spark.operators.multimodal import sample_ppm_frames

    video = _make_ppm(4, 4, 1) + _make_ppm(4, 4, 2) + _make_ppm(4, 4, 3) + \
        _make_ppm(4, 4, 4) + _make_ppm(4, 4, 5)
    df = spark.createDataFrame([(9, video)], "doc_id long, payload binary")
    rows = sample_ppm_frames(df, every=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert len({r["frame_digest"] for r in rows}) == 3  # distinct frames


def test_decode_wav_meta_real(spark):
    import struct

    from graphlite_spark.operators.multimodal import decode_wav_meta

    def make_wav(sr, ch, bits, n):
        data = b"\x00" * (n * ch * bits // 8)
        fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * bits // 8,
                          ch * bits // 8, bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + \
            b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    df = spark.createDataFrame(
        [(1, make_wav(16000, 1, 16, 32000)), (2, make_wav(44100, 2, 16, 44100))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_wav_meta(df).collect()}
    assert (got[1]["sample_rate"], got[1]["channels"], got[1]["n_samples"]) == (
        16000, 1, 32000)
    assert abs(got[1]["duration_s"] - 2.0) < 1e-9
    assert (got[2]["sample_rate"], got[2]["channels"]) == (44100, 2)
    assert abs(got[2]["duration_s"] - 1.0) < 1e-9


def test_encode_decode_ppm_closed_form(spark):
    import hashlib

    from graphlite_spark.operators.multimodal import decode_ppm, encode_ppm_kernel

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decode_ppm(encode_ppm_kernel(docs)).collect()}
    for i in range(20):
        d = hashlib.md5(f"text {i}".encode()).digest()
        assert got[i]["width"] == 4 + d[0] % 29
        assert got[i]["height"] == 4 + d[1] % 23


def test_png_codec_roundtrip_pure():
    """All five PNG filters reconstruct exactly (random images, no Spark);
    malformed payloads raise instead of mis-decoding."""
    import numpy as np

    from graphlite_spark.operators.multimodal import _png_decode, _png_encode

    rng = np.random.default_rng(3)
    for _ in range(10):
        h, w = int(rng.integers(1, 28)), int(rng.integers(1, 33))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, px2 = _png_decode(_png_encode(px))
        assert (w2, h2) == (w, h) and np.array_equal(px, px2)
    good = _png_encode(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
    for bad in (b"nope", good[:20], good[:-6] + b"\x00" * 6):
        with pytest.raises(ValueError):
            _png_decode(bad)


def test_encode_decode_png_closed_form(spark):
    """Spark round trip: decoded dims AND pixel digest match the encoder's
    closed form — the un-filtering is verified byte-exact through zlib."""
    import hashlib

    from graphlite_spark.operators.multimodal import decode_png, encode_png_kernel

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decode_png(encode_png_kernel(docs)).collect()}
    for i in range(20):
        d_hex = hashlib.md5(f"text {i}".encode()).hexdigest()
        w, h = 4 + int(d_hex[0:2], 16) % 29, 4 + int(d_hex[2:4], 16) % 23
        seed = bytes.fromhex(hashlib.md5(d_hex.encode()).hexdigest())
        buf = (seed * ((w * h * 3) // 16 + 1))[: w * h * 3]
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        assert got[i]["pixel_digest"] == hashlib.md5(
            buf.hex().encode()
        ).hexdigest()


def test_jpeg_codec_roundtrip_pure():
    """Baseline-JPEG codec, no Spark: block-constant grayscale images
    round-trip EXACTLY (DC-only blocks, all-ones quantization); malformed
    or non-baseline payloads raise instead of mis-decoding."""
    import numpy as np

    from graphlite_spark.operators.multimodal import (
        _jpeg_decode_gray,
        _jpeg_encode_gray,
    )

    rng = np.random.default_rng(9)
    for _ in range(8):
        by, bx = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        vals = rng.integers(0, 256, size=(by, bx), dtype=np.uint8)
        w, h, px = _jpeg_decode_gray(_jpeg_encode_gray(vals))
        assert (w, h) == (bx * 8, by * 8)
        assert np.array_equal(px, np.repeat(np.repeat(vals, 8, 0), 8, 1))
    # extremes: full DC swings incl. 0 and 255
    vals = np.array([[0, 255, 1], [254, 128, 127]], dtype=np.uint8)
    _, _, px = _jpeg_decode_gray(_jpeg_encode_gray(vals))
    assert np.array_equal(px, np.repeat(np.repeat(vals, 8, 0), 8, 1))
    good = _jpeg_encode_gray(vals)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    for bad in (b"nope", good[:30], progressive):
        with pytest.raises(ValueError):
            _jpeg_decode_gray(bad)
    # the decoder must honor the SOS table SELECTORS (Td/Ta live in the
    # component byte, not the spectral-selection byte): legally move the
    # AC table to id 1 and point the scan at it — decode must still be
    # bit-exact
    import struct

    ac_len = struct.pack(">H", 2 + 1 + 16 + 4)
    moved = good.replace(b"\xff\xc4" + ac_len + b"\x10",
                         b"\xff\xc4" + ac_len + b"\x11", 1)
    moved = moved.replace(b"\x01\x01\x00\x00\x3f\x00",
                          b"\x01\x01\x01\x00\x3f\x00", 1)
    assert moved != good
    w, h, px = _jpeg_decode_gray(moved)
    assert np.array_equal(px, np.repeat(np.repeat(vals, 8, 0), 8, 1))


def test_encode_decode_jpeg_closed_form(spark):
    """Spark round trip: decoded dims AND pixel digest match the encoder's
    closed form — earned only by real Huffman + dequant + IDCT."""
    import hashlib

    from graphlite_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_kernel,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r
           for r in decode_jpeg(encode_jpeg_kernel(docs)).collect()}
    for i in range(20):
        d_hex = hashlib.md5(f"text {i}".encode()).hexdigest()
        bx, by = 1 + int(d_hex[0:2], 16) % 3, 1 + int(d_hex[2:4], 16) % 3
        seed = hashlib.md5(d_hex.encode()).hexdigest()
        hx = "".join(
            "".join(
                seed[2 * ((r * bx + c) % 16): 2 * ((r * bx + c) % 16) + 2] * 8
                for c in range(bx)
            ) * 8
            for r in range(by)
        )
        assert (got[i]["width"], got[i]["height"]) == (bx * 8, by * 8)
        assert got[i]["n_pixels"] == bx * 8 * by * 8
        assert got[i]["pixel_digest"] == hashlib.md5(hx.encode()).hexdigest()


def test_mp4_box_parse_pure():
    """Pure-python MP4 round trip + robustness: 64-bit largesize headers,
    size==0 (to end of file), v1 mvhd, unknown boxes skipped."""
    import struct

    from graphlite_spark.operators.multimodal import (
        _mp4_build,
        _mp4_parse,
    )

    b = _mp4_build("hello world")
    m = _mp4_parse(b)
    d = hashlib.md5(b"hello world").digest()
    assert m["timescale"] == 600 * (1 + d[6] % 5)
    n = 24 + d[7] % 240
    delta = 10 + d[8] % 90
    assert m["n_samples"] == n
    # two-run stts (round 5): n1 samples at delta, the rest at delta2
    n1 = 1 + d[11] % (n - 1)
    delta2 = delta + 1 + d[12] % 30
    assert m["duration_units"] == n1 * delta + (n - n1) * delta2
    assert m["width"] == 16 * (4 + d[9] % 60)
    assert m["height"] == 16 * (3 + d[10] % 45)
    assert m["major_brand"] == "isom" and m["track_count"] == 1
    # the sample-table read is INDEPENDENT of mvhd/stsz yet must agree
    assert m["stts_entry_count"] == 2
    assert m["stts_sample_count"] == m["n_samples"]
    assert m["stts_duration_units"] == m["duration_units"]
    assert m["chunk_count"] == 1 + d[13] % 7
    assert m["first_chunk_offset"] == 64 + 8 * (d[14] % 32)

    # rebuild the same tree with a largesize mdat and a v1 mvhd
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    mvhd_v1 = box(
        b"mvhd",
        struct.pack(">I", 1 << 24)          # version 1
        + struct.pack(">QQIQ", 0, 0, 1000, 77777)
        + b"\x00" * 80,
    )
    moov = box(b"moov", mvhd_v1)
    ftyp = box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
    payload = b"\xab" * 10
    largesize_mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload))
        + payload
    )
    free = box(b"free", b"junk")            # unknown box: skipped by size
    m2 = _mp4_parse(ftyp + free + moov + largesize_mdat)
    assert m2["major_brand"] == "mp42"
    assert m2["timescale"] == 1000 and m2["duration_units"] == 77777
    assert m2["track_count"] == 0
    # size==0: box extends to EOF
    tail0 = struct.pack(">I", 0) + b"mdat" + b"\x00" * 5
    m3 = _mp4_parse(ftyp + moov + tail0)
    assert m3["timescale"] == 1000
    # truncated/overrunning size must raise, not mis-parse
    bad = struct.pack(">I", 999) + b"mdat" + b"\x00" * 4
    try:
        _mp4_parse(ftyp + bad)
        assert False, "overrun not detected"
    except ValueError:
        pass


def test_encode_decode_mp4_closed_form(spark):
    from graphlite_spark.operators.multimodal import (
        decode_mp4_meta,
        encode_mp4_kernel,
    )

    docs = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(30)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decode_mp4_meta(encode_mp4_kernel(docs)).collect()}
    for i in range(30):
        d = hashlib.md5(f"doc text {i}".encode()).digest()
        ts = 600 * (1 + d[6] % 5)
        n = 24 + d[7] % 240
        delta = 10 + d[8] % 90
        n1 = 1 + d[11] % (n - 1)
        delta2 = delta + 1 + d[12] % 30
        dur = n1 * delta + (n - n1) * delta2
        r = got[i]
        assert (r["timescale"], r["n_samples"], r["duration_units"]) == (ts, n, dur)
        assert r["duration_us"] == dur * 1_000_000 // ts
        assert r["track_count"] == 1 and r["major_brand"] == "isom"
        assert (r["stts_entry_count"], r["stts_sample_count"],
                r["stts_duration_units"]) == (2, n, dur)
        assert r["chunk_count"] == 1 + d[13] % 7
        assert r["first_chunk_offset"] == 64 + 8 * (d[14] % 32)
