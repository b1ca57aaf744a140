"""Multimodal column plumbing (SURVEY.md §7 phase 4).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual codecs (Pillow/ffmpeg/torchaudio) are not in this container, so
decode is stubbed behind an import-try with a deterministic fallback
feature extractor (byte stats + md5) that exercises the identical path.

At 100 TB: payload columns are huge — keep them out of shuffles. The
pattern below projects (id, payload) into ``mapInPandas``, emits small
feature rows, and joins features back by id if needed; Arrow batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("head_byte", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes):
    """Real decode hook — requires an image codec, absent here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no Pillow
        raise NotImplementedError(
            "image decode requires Pillow; payload plumbing is exercised via "
            "extract_binary_features instead"
        ) from e
    raise NotImplementedError("wire PIL decode here when the codec ships")


def extract_binary_features(media: DataFrame, id_col: str = "media_id",
                            payload_col: str = "payload") -> DataFrame:
    """Deterministic per-payload features via ``mapInPandas`` — the same
    batch shape a real decoder would use (payload bytes in, small
    feature rows out, Arrow both ways)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else None),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "head_byte": payloads.map(
                        lambda b: b[0] if b else None
                    ),
                }
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, FEATURE_SCHEMA
    )
