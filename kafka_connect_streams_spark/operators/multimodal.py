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


def payload_simhash(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "doc_id", bits: int = 48,
                    gram_bytes: int = 4, stride: int = 2) -> DataFrame:
    """Byte-level SimHash fingerprint of an opaque binary payload — the
    modality-agnostic near-duplicate signal of a multimodal ingest
    (re-encoded copies, shifted-metadata containers, trailing-junk
    variants of the same media stream). A REAL perceptual hash (pHash
    DCT over decoded pixels / chromaprint over decoded audio) plugs in
    at the decode seam (:func:`decode_image_real`) and feeds the SAME
    banding/verify machinery downstream; the byte-gram SimHash is the
    decoder-free stand-in computable in this environment.

    Arithmetic mirrors the text :func:`~..dedup.simhash` conventions
    exactly (48-bit md5 gram hashes, ±1 bit votes over DISTINCT grams,
    bit set iff vote sum > 0) so the oracle twin reuses the proven vote
    SQL — but the fold here is entirely IN-ROW: hex the payload, slide
    ``gram_bytes``-byte windows every ``stride`` bytes, hash each
    distinct gram ONCE (bound ``_ghs`` column — the text_repetition
    inlining lesson), then ``bits`` aggregate folds vote over the bound
    array. The corpus is scanned once with ZERO shuffles and only the
    8-byte fingerprint ever reaches an exchange (the band join in
    :func:`media_neardup`). ``bits`` must be ≤ 62 (the fingerprint
    lives in a signed bigint).
    """
    if not 0 < bits <= 62:
        raise ValueError(f"bits must be in (0, 62], got {bits}")
    gb2, st2 = gram_bytes * 2, stride * 2
    base = df.select(F.col(id_col), F.hex(F.col(payload_col)).alias("_hex"))
    n_grams = f"greatest((length(_hex) - {gb2}) div {st2} + 1, 1)"
    # Spark sequence(1, 0) DESCENDS — the greatest(..., 1) floor plus
    # the length filter below handle payloads shorter than one gram
    grams = (f"array_distinct(filter(transform(sequence(1, {n_grams}),"
             f" i -> substring(_hex, (i - 1) * {st2} + 1, {gb2})),"
             f" g -> length(g) = {gb2}))")
    hashes = (f"transform({grams}, g -> cast(conv(substring(md5(g), 1,"
              f" 12), 16, 10) as bigint))")
    votes = base.withColumn("_ghs", F.expr(hashes))
    fp = " + ".join(
        f"(CASE WHEN (aggregate(_ghs, cast(0 as bigint), (acc, h) ->"
        f" acc + (CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1"
        f" ELSE -1 END))) > 0 THEN cast({1 << b} as bigint)"
        f" ELSE cast(0 as bigint) END)"
        for b in range(bits))
    return votes.select(F.col(id_col),
                        F.expr(fp).alias("simhash"),
                        F.expr("cast(length(_hex) div 2 as bigint)")
                        .alias("n_bytes"))


def media_neardup(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", bits: int = 48,
                  bands: int = 4, max_hamming: int = 3,
                  max_bucket: int = 50) -> DataFrame:
    """Payload near-duplicate pairs via banded SimHash — the multimodal
    dedup step: candidates share at least one ``bits/bands``-bit band of
    their fingerprint, verification is the exact Hamming distance
    ``bit_count(a ^ b) <= max_hamming`` in-row. Pigeonhole guarantee:
    with ``max_hamming < bands``, any qualifying pair has a clean shared
    band, so banding is LOSSLESS for the threshold (the MinHash-LSH
    argument, made exact by SimHash's bit structure).

    Scale shape: only (id, band, band_key, simhash) rows reach the
    exchanges — fixed-width, never payload bytes; the stop-bucket cap
    (``max_bucket``, the ngram_jaccard ``max_doc_freq`` discipline)
    drops degenerate hot buckets (e.g. the all-zero fingerprint of
    empty payloads) before the self-join can go quadratic on them, and
    AQE can skew-split the surviving bucket join.

    Sizing honesty for 100 TB: ``bits``/``band_bits`` must grow with
    the corpus or expected bucket sizes (≈ N / 2^band_bits for
    near-uniform fingerprints) blow past ``max_bucket`` and the cap
    costs recall, not just compute. The defaults (48 bits, 12-bit
    bands) suit up to ~10⁶–10⁷ payloads; at corpus scale raise bits
    toward the signed-bigint ceiling (62) and band_bits with it —
    the Manku et al. (WWW'07) multi-table SimHash arrangement is the
    same plan with more/wider bands, no new machinery.
    """
    if bands <= 0 or bits % bands != 0:
        raise ValueError(
            f"bands must divide bits evenly, got bits={bits}"
            f" bands={bands}")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    fp = payload_simhash(df, payload_col, id_col, bits=bits)
    banded = fp.select(
        F.col(id_col), "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    ).withColumn(
        "band_key",
        F.expr(f"shiftright(simhash, cast(band * {band_bits} as int))"
               f" & {mask}"))
    # the banded table feeds THREE consumers (bucket cap + both join
    # legs) — unpinned, each would re-run the bits-fold fingerprint
    # over the full payload hex (4 corpus scans, measured). Pin the
    # skinny (id, fp, band, key) table once: the bm25_multiterm
    # localCheckpoint discipline — materialize ~32 B/row, never payload
    # bytes, and the final plan has zero payload scans and zero
    # Generates.
    banded = banded.localCheckpoint()
    ok = (banded.groupBy("band", "band_key")
          .agg(F.count("*").alias("_bc"))
          .filter(F.col("_bc") <= max_bucket)
          .select("band", "band_key"))
    kept = banded.join(ok, ["band", "band_key"])
    a = kept.select(F.col(id_col).alias("id_a"),
                    F.col("simhash").alias("_fa"), "band", "band_key")
    b = kept.select(F.col(id_col).alias("id_b"),
                    F.col("simhash").alias("_fb"), "band", "band_key")
    pairs = (a.join(b, ["band", "band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "_fa", "_fb").distinct())
    return (pairs
            .withColumn("hamming",
                        F.expr("cast(bit_count(_fa ^ _fb) as bigint)"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
