"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas (mapInPandas).

The container has no image/audio codecs, so the decode step is STUBBED
(NotImplementedError) behind a deterministic fake featurizer — but the
Spark-side plumbing is real and tested: binary column schema, metadata
struct, Arrow batch shape, mapInPandas signature, partition-preserving
iteration. Swap ``_decode_stub`` for PIL/librosa in a real deployment.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; mapInPandas
streams Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch) so
executor memory is bounded by batch size × payload size, not partition size.
Feature extraction parallelizes per-partition with zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output schema of the featurizer — fixed & declared (mapInPandas contract).
FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
])


def to_binary_payload(df: DataFrame, id_col: str, payload_col: str,
                      media_type: str = "image/fake") -> DataFrame:
    """Model a multimodal table: opaque binary + typed metadata struct
    (media_type, n_bytes) — the layout a 100 TB image/audio corpus uses."""
    binary = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("id"),
        binary.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(binary).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder entry point — intentionally unimplemented here.

    The container ships no imaging libraries; deployments override this
    with PIL.Image.open(io.BytesIO(payload)) or equivalent."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; use _decode_stub for deterministic fake features")


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': derive a (width, height) from the
    content hash so tests are reproducible without codecs."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a binary payload column.

    Input: (id, payload binary, meta struct) from ``to_binary_payload``.
    Uses mapInPandas — the pattern for any pandas/NumPy-backed multimodal
    stage (resize, frame-sample, spectrogram…)."""

    def featurize(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_decode_stub(p) for p in payloads]
            yield pd.DataFrame({
                "id": pdf["id"],
                "n_bytes": [len(p) for p in payloads],
                "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
            })

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)
