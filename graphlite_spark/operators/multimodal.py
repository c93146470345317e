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
