"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata extracted by Arrow-batched pandas kernels over ``mapInPandas``.
The Spark-side plumbing — schema, batching, partitioning, kernel signature
— is real and tested; the *codec* step is stubbed because decode libraries
(PIL/ffmpeg) are not in this container:

* ``extract_binary_meta`` — REAL: byte length + md5 digest per payload,
  computed in the pandas kernel (hashlib md5 == SQL md5, so the oracle can
  verify it).
* ``decode_image_stub`` — STUB: raises ``NotImplementedError`` unless
  ``fake=True``, in which case it emits a deterministic fake decode
  (width/height/n_frames derived from the digest) so downstream plumbing
  and tests run end-to-end.

Batch shape: one pandas DataFrame per Arrow batch (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so payload memory per
task is bounded regardless of partition size — the property that matters
when a partition holds GBs of media at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = "doc_id long, byte_len long, digest string"
DECODE_SCHEMA = "doc_id long, width int, height int, n_frames int"


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of text — a stand-in for
    real media bytes; the pipeline treats it as opaque)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_binary_meta(docs_with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, byte_len, digest) via a vectorized mapInPandas kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return docs_with_payload.select(id_col, "payload").mapInPandas(
        kernel, schema=BINARY_META_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_digest string"


def resize_stub(
    decoded_meta: DataFrame, target_w: int = 224, target_h: int = 224,
    fake: bool = False,
) -> DataFrame:
    """(doc_id, width, height, payload) — resize step.

    STUB: real resizing needs an image codec; ``fake=True`` emits the
    target dimensions with a deterministic payload (md5 of the input
    digest + size) so the pipeline's shape survives end-to-end.  The Spark
    plumbing — grouped Arrow batches, binary out — is real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "resize requires image codecs absent from this environment"
                )
            digests = pdf["digest"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "payload": digests.map(
                        lambda d: hashlib.md5(
                            f"{d}:{target_w}x{target_h}".encode()
                        ).digest()
                    ),
                }
            )

    return decoded_meta.select("doc_id", "digest").mapInPandas(
        kernel, schema=RESIZE_SCHEMA
    )


def frame_sample_stub(
    decoded: DataFrame, every: int = 8, fake: bool = False
) -> DataFrame:
    """(doc_id, frame_idx, frame_digest) — sample every Nth frame of a
    decoded video.  STUB decode; the fan-out (one row per sampled frame,
    bounded per Arrow batch) is the real plumbing under test.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame extraction requires video codecs absent from this "
                    "environment"
                )
            rows = {"doc_id": [], "frame_idx": [], "frame_digest": []}
            for doc_id, n_frames in zip(pdf["doc_id"], pdf["n_frames"]):
                for i in range(0, int(n_frames), every):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(i)
                    rows["frame_digest"].append(
                        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows).astype(
                {"doc_id": "int64", "frame_idx": "int32"}
            )

    return decoded.select("doc_id", "n_frames").mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )


def decode_image_stub(
    docs_with_payload: DataFrame, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """(doc_id, width, height, n_frames) — decode step.

    Real decoding needs codec libraries absent from this container; the
    Spark plumbing (binary in, typed struct out, Arrow batches) is the part
    under test.  ``fake=True`` derives deterministic dimensions from the
    payload digest.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decode requires codec libraries not present "
                    "in this environment; pass fake=True for the deterministic "
                    "plumbing-test decoder"
                )
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": digests.map(lambda d: 16 + int(d[:4], 16) % 1024).astype(
                        "int32"
                    ),
                    "height": digests.map(lambda d: 16 + int(d[4:8], 16) % 1024).astype(
                        "int32"
                    ),
                    "n_frames": digests.map(lambda d: 1 + int(d[8:10], 16) % 64).astype(
                        "int32"
                    ),
                }
            )

    return docs_with_payload.select(id_col, "payload").mapInPandas(
        kernel, schema=DECODE_SCHEMA
    )
