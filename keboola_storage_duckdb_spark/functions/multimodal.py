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


RESIZE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize stage: per-partition Arrow-batched map. Decode is
    stubbed (no codecs in this container) — the stub keeps the payload and
    stamps the target dims; a deployment swaps in decode → PIL.resize →
    re-encode. The Spark plumbing (schema, batching, zero shuffle) is the
    deliverable."""

    def do_resize(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            # real impl: decode_image(p) → img.resize((w, h)) → re-encode
            yield pd.DataFrame({
                "id": pdf["id"],
                "payload": pdf["payload"],
                "width": target_w,
                "height": target_h,
            })

    return df.mapInPandas(do_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_md5", T.StringType()),
])


def sample_frames(df: DataFrame, every_n: int = 10,
                  max_frames: int = 8) -> DataFrame:
    """Video frame-sampling stage: one input row fans out to ≤max_frames
    rows (id, frame_idx, frame_md5). Decode is stubbed deterministically:
    'frames' are content-hash-derived so tests reproduce without codecs.
    Pattern: mapInPandas rows-to-many — output batches need not align 1:1
    with input rows."""

    def do_sample(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                n_fake_frames = 1 + hashlib.md5(payload).digest()[2] % (
                    max_frames * every_n)
                for k, f in enumerate(range(0, n_fake_frames, every_n)):
                    if k >= max_frames:
                        break
                    ids.append(i)
                    idxs.append(f)
                    hashes.append(hashlib.md5(
                        payload + f.to_bytes(4, "little")).hexdigest())
            yield pd.DataFrame({"id": ids, "frame_idx": idxs,
                                "frame_md5": hashes})

    return df.mapInPandas(do_sample, schema=FRAME_SCHEMA)
