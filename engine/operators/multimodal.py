"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_image``/``decode_audio`` raise NotImplementedError; a
deterministic fake "decoder" stands in for tests and the oracle), but
the Spark-side plumbing is real and is the part that matters at scale:
binary column in parquet → ``mapInPandas`` with an explicit output
schema → Arrow record batches in/out, no row-at-a-time Python.

Scale notes: binary payloads ride the scan; metadata extraction is
embarrassingly parallel with zero shuffle. Real decoders drop into
``_fake_decode_meta``'s slot unchanged. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for 10 MB images
set it low (e.g. 32) so an Arrow batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine.io import load_table
from engine.registry import query
from engine.operators.textstats import DUCK_H60

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("fake_channels", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> Any:
    """Real image decode — unavailable in this container (no PIL/cv2).

    Plug a real decoder here; everything upstream (binary column,
    Arrow batching, schema) is already production-shaped.
    """
    raise NotImplementedError("image codecs not available in this environment")


def decode_audio(payload: bytes) -> Any:
    """Real audio decode — unavailable in this container (no soundfile)."""
    raise NotImplementedError("audio codecs not available in this environment")


def _h60(s: str) -> int:
    """The engine's shared 60-bit hash (same as SPARK_H60/DUCK_H60)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _fake_decode_meta(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in for a decoder: metadata derived from the
    payload checksum, so the DuckDB oracle can reproduce it exactly."""
    checksum = hashlib.md5(payload).hexdigest()
    h = _h60(checksum)
    width = h % 1920 + 1
    height = (h // 1920) % 1080 + 1
    channels = h % 3 + 1
    return len(payload), checksum, width, height, channels


def extract_blob_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column."""

    # Self-contained closure: no references to engine.* module globals,
    # so executors don't need the repo on PYTHONPATH (cloudpickle ships
    # the nested function by value).
    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hl

        import pandas as pd

        def fake_decode(payload: bytes):
            checksum = _hl.md5(payload).hexdigest()
            h = int(_hl.md5(checksum.encode("utf-8")).hexdigest()[:15], 16)
            return (
                len(payload),
                checksum,
                h % 1920 + 1,
                (h // 1920) % 1080 + 1,
                h % 3 + 1,
            )

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[blob_col]):
                n, checksum, w, h, c = fake_decode(bytes(payload))
                rows.append((int(doc_id), n, checksum, w, h, c))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "checksum",
                    "fake_width",
                    "fake_height",
                    "fake_channels",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=META_SCHEMA)


_H_CK = DUCK_H60.format(x="md5(text)")


@query(
    "multimodal_blob_meta",
    oracle=f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST({_H_CK} % 1920 + 1 AS INT) AS fake_width,
       CAST(({_H_CK} // 1920) % 1080 + 1 AS INT) AS fake_height,
       CAST({_H_CK} % 3 + 1 AS INT) AS fake_channels
FROM documents
""",
    tags=("multimodal", "pandas_udf"),
)
def multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: synthesize the binary payload
    column (UTF-8 bytes of text — stands in for image bytes), then run
    Arrow-batched mapInPandas metadata extraction. The oracle recomputes
    the same metadata in pure SQL, which checks the whole Python/Arrow
    round trip including byte fidelity."""
    docs = load_table(spark, sf_dir, "documents")
    with_blob = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_blob_meta(with_blob, "doc_id", "payload")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("char_start", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)

N_FRAMES = 4
FRAME_LEN = 32


def sample_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    n_frames: int = N_FRAMES,
    frame_len: int = FRAME_LEN,
) -> DataFrame:
    """Frame sampling over a fake 'video' payload: decode (UTF-8), take
    ``n_frames`` evenly-spaced fixed-length slices, one output row per
    frame — the 1→N ``mapInPandas`` expansion shape real video frame
    extraction uses (ffmpeg drops into the slice step unchanged)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hl

        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[blob_col]):
                content = bytes(payload).decode("utf-8")
                # Evenly-spaced frame starts over the decodable span.
                span = max(len(content) - frame_len, 0)
                for i in range(n_frames):
                    start = (span * i) // max(n_frames - 1, 1)
                    frame = content[start : start + frame_len]
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            start + 1,  # 1-based, matches SQL substring
                            _hl.md5(frame.encode("utf-8")).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "char_start", "frame_checksum"]
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=FRAME_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle=f"""
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST((greatest(length(text) - {FRAME_LEN}, 0) * i)
            // greatest({N_FRAMES} - 1, 1) + 1 AS BIGINT) AS char_start,
       md5(substring(text,
            CAST((greatest(length(text) - {FRAME_LEN}, 0) * i)
                 // greatest({N_FRAMES} - 1, 1) + 1 AS INT),
            {FRAME_LEN})) AS frame_checksum
FROM documents
CROSS JOIN (SELECT unnest(range(0, {N_FRAMES})) AS i) f
""",
    tags=("multimodal", "pandas_udf", "frames"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling from binary payloads (text bytes as
    the stand-in video): 4 frames × 32 chars, checksummed. The oracle
    recomputes every frame slice in SQL, pinning the full
    binary→decode→slice→hash round trip."""
    docs = load_table(spark, sf_dir, "documents")
    with_blob = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(with_blob, "doc_id", "payload")


@query(
    "multimodal_resize_dims",
    oracle=f"""
SELECT doc_id, fake_width, fake_height,
       CAST(greatest(fake_width * 224 // greatest(fake_width, fake_height), 1)
            AS INT) AS out_width,
       CAST(greatest(fake_height * 224 // greatest(fake_width, fake_height), 1)
            AS INT) AS out_height
FROM (
  SELECT doc_id,
         CAST({_H_CK} % 1920 + 1 AS INT) AS fake_width,
         CAST(({_H_CK} // 1920) % 1080 + 1 AS INT) AS fake_height
  FROM documents
)
""",
    tags=("multimodal", "resize"),
)
def multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-fit-224 dimension planning over the decoded metadata —
    integer math only (reproducible everywhere); a real resize kernel
    consumes (out_width, out_height) per payload in the same
    mapInPandas pass as the decoder."""
    meta = multimodal_blob_meta(spark, sf_dir)
    longest = F.greatest("fake_width", "fake_height")
    return meta.select(
        "doc_id",
        "fake_width",
        "fake_height",
        F.greatest(F.expr("fake_width * 224") / longest, F.lit(1))
        .cast("int")
        .alias("out_width"),
        F.greatest(F.expr("fake_height * 224") / longest, F.lit(1))
        .cast("int")
        .alias("out_height"),
    )
