"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched Python.

Pattern (the part that matters at 100 TB):
- media lives in a ``binary`` column next to a metadata struct — one parquet
  row group streams payload batches straight into Arrow;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  over those batches: Python touches each payload ONCE per partition in
  vectorized batches, never row-at-a-time;
- partitioning is by payload size (``repartitionByRange`` on ``media_bytes``)
  when decode cost scales with size, so no straggler partition holds all the
  4K videos.

The actual image/audio decoders are NOT available in this environment, so
``decode_features`` computes a deterministic fake (md5-derived pseudo-pixels)
behind the same schema/batch plumbing, and ``decode_image_real`` raises
``NotImplementedError`` at the exact seam where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: schema of the extracted features — fixed, so downstream plans are stable.
FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_bytes", LongType()),
    StructField("content_hash", StringType()),
    StructField("fake_width", LongType()),
    StructField("fake_height", LongType()),
])


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model a multimodal table: (id, payload binary, meta struct).

    Uses the document text UTF-8 bytes as the stand-in payload; a real
    pipeline reads the bytes column straight from parquet.
    """
    # NULL text ≡ empty payload (the repo-wide NULL-text policy): a doc
    # with no content yields b'', not a NULL that crashes the decoders
    body = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(body, "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(body).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Seam for a real decoder (PIL.Image.open → .size). Not available here."""
    raise NotImplementedError(
        "image decoding requires PIL/ffmpeg, not present in this environment; "
        "decode_features() uses the deterministic fake path instead")


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in: md5 → pseudo width/height (matches the SQL
    oracle: width = hex[0:4] % 1920, height = hex[4:8] % 1080)."""
    h = hashlib.md5(payload).hexdigest()
    return h, int(h[:4], 16) % 1920, int(h[4:8], 16) % 1080


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` streams record batches; each batch is processed
    vectorized in Python and emitted with the fixed FEATURE_SCHEMA. Swap
    ``_fake_decode`` for a real decoder without touching the plan.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "media_bytes": [len(p) for p in pdf["payload"]],
                "content_hash": [d[0] for d in decoded],
                "fake_width": [d[1] for d in decoded],
                "fake_height": [d[2] for d in decoded],
            })

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def size_balanced(df: DataFrame, bytes_col: str, partitions: int) -> DataFrame:
    """Range-partition by payload size so decode-heavy rows spread evenly —
    the anti-straggler layout for skewed media sizes."""
    return df.repartitionByRange(partitions, F.col(bytes_col))


#: schema of sampled frames: one row per (doc, frame index).
FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_offset_bytes", LongType()),
    StructField("frame_hash", StringType()),
])


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: N evenly-spaced frames per doc.

    1→N row expansion inside ``mapInPandas`` — the output iterator yields one
    frame-row batch per input batch, so the expansion never materializes a
    doc's full frame list in driver or python-worker memory. A real pipeline
    replaces ``_frame_at`` (offset slice + md5) with an ffmpeg seek-decode at
    the same seam; offsets are computed from payload length, deterministic.
    """
    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                size = len(payload)
                for i in range(n_frames):
                    off = (size * i) // n_frames
                    chunk = payload[off:off + 64]
                    rows.append((doc_id, i, off,
                                 hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.select("doc_id", "payload").mapInPandas(expand, FRAME_SCHEMA)


#: schema of audio segments: one row per (doc, segment index).
SEGMENT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("seg_idx", LongType()),
    StructField("seg_offset_bytes", LongType()),
    StructField("seg_bytes", LongType()),
    StructField("seg_hash", StringType()),
])


def segment_audio(df: DataFrame, window_bytes: int = 96,
                  hop_bytes: int = 64) -> DataFrame:
    """Audio segmentation for ASR/audio-training payloads: overlapping
    fixed-size windows every ``hop_bytes`` (segment k covers bytes
    [k·hop, k·hop+window)), the byte-domain analogue of
    :func:`sample_frames`'s frame grid and of ``chunk_documents``'s token
    windows. A payload shorter than one window yields exactly one (short)
    segment, so no document vanishes.

    Same batch-streaming ``mapInPandas`` shape as frame sampling: the 1→N
    expansion happens inside the Arrow batch iterator, and a real pipeline
    swaps the slice+md5 for an actual resample/VAD window at this seam.
    """
    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                size = len(payload)
                n_extra = max(0, -(-(size - window_bytes) // hop_bytes))
                for k in range(n_extra + 1):
                    off = k * hop_bytes
                    seg = payload[off:off + window_bytes]
                    rows.append((doc_id, k, off, len(seg),
                                 hashlib.md5(seg).hexdigest()))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in SEGMENT_SCHEMA])

    return df.select("doc_id", "payload").mapInPandas(expand, SEGMENT_SCHEMA)
