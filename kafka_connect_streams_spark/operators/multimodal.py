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

Decoders (r13): the uncompressed container formats parse natively in-repo —
:func:`decode_bmp` (8/24-bit BI_RGB BMP → Rec.601 luma) and
:func:`decode_wav` (RIFF/WAVE integer PCM 8/16-bit) — feeding the
integer-exact perceptual hashes :func:`phash64` (16×16 luma → 8×8
fixed-point DCT → 63-bit fingerprint) and :func:`audio_energy_fp`
(frame-energy deltas), which in turn feed :func:`fingerprint_neardup`'s
banding/verify. Entropy-coded formats (PNG/JPEG/MP3/...) still raise
``NotImplementedError`` at :func:`decode_image_real` / :func:`decode_wav` —
the exact seam where PIL/ffmpeg plug in; ``decode_features`` keeps the
deterministic md5 fake for the generic opaque-payload path.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
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


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Pure-stdlib BMP decoder → (width, height, luma rows top-down).

    Supports the uncompressed formats a re-encoding pipeline actually
    produces: 24-bit BGR and 8-bit paletted (incl. grayscale), BI_RGB
    only, bottom-up or top-down row order, 4-byte row padding per the
    public BITMAPINFOHEADER spec. Luma is integer Rec.601
    ``(299·R + 587·G + 114·B) // 1000`` so two encodings of the same
    pixels (24-bit vs 8-bit gray) decode to IDENTICAL luma and their
    perceptual hashes collide exactly — the property the near-dup tests
    pin. PNG/JPEG stay behind :func:`decode_image_real`'s
    NotImplementedError seam (entropy coding needs a real codec).
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"unsupported BMP variant (hdr={hdr_size} comp={compression} "
            f"bpp={bpp}); only uncompressed 8/24-bit BITMAPINFOHEADER")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        # a malformed header must fail loudly, not decode to an empty
        # or negative-width image that hashes silently
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        palette = [struct.unpack_from("<BBBB", payload, pal_off + 4 * i)[:3]
                   for i in range(n_colors)]  # (B, G, R)
        pal_luma = [(299 * r + 587 * g + 114 * b) // 1000
                    for b, g, r in palette]
    stride = ((width * bpp + 31) // 32) * 4
    rows: list[list[int]] = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        base = pix_off + src * stride
        if bpp == 24:
            row = [(299 * payload[base + 3 * c + 2]
                    + 587 * payload[base + 3 * c + 1]
                    + 114 * payload[base + 3 * c]) // 1000
                   for c in range(width)]
        else:
            row = [pal_luma[payload[base + c]] for c in range(width)]
        rows.append(row)
    return width, height, rows


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib RIFF/WAVE PCM decoder → (sample_rate, channels, samples).

    Walks the chunk list (tolerating extra chunks like LIST/fact),
    requires format tag 1 (integer PCM) at 8 or 16 bits, and returns
    interleaved integer samples — 16-bit as little-endian signed, 8-bit
    converted from the spec's unsigned-with-128-bias to signed, so both
    bit depths of the same waveform yield proportional integers.
    Compressed codecs raise NotImplementedError at this seam.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only integer PCM 8/16-bit supported (fmt={audio_fmt}, "
            f"bits={bits}); compressed audio needs a real codec")
    if bits == 16:
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[:2 * n]))
    else:
        samples = [b - 128 for b in data]
    return rate, channels, samples


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real-decoder seam. BMP decodes in-repo (:func:`decode_bmp`);
    PNG/JPEG would plug a PIL/ffmpeg call in here and still raise in
    this environment."""
    if payload[:2] == b"BM":
        w, h, _ = decode_bmp(payload)
        return w, h
    raise NotImplementedError(
        "PNG/JPEG decoding requires PIL/ffmpeg, not present in this "
        "environment; BMP decodes natively via decode_bmp()")


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


#: 8×16 DCT-II cosine table in 2^20 fixed point:
#: T[u][x] = round(cos(π·(2x+1)·u / 32) · 1048576). HARDCODED (not computed
#: at import) so Python, Spark SQL and the DuckDB oracle share bit-identical
#: integers forever — a libm cos() 1-ULP skew at a round() boundary can
#: never fork the three implementations. With 16×16 luma in 0..255 the
#: worst intermediate is 16·255·2^20·16·2^20 ≈ 7.2e16 < 2^63: every
#: multiply/sum stays exact int64, so the DCT — and therefore the hash —
#: is integer-exact across engines.
PHASH_DCT_T: tuple[tuple[int, ...], ...] = (
    (1048576, 1048576, 1048576, 1048576, 1048576, 1048576, 1048576, 1048576,
     1048576, 1048576, 1048576, 1048576, 1048576, 1048576, 1048576, 1048576),
    (1043527, 1003425, 924761, 810560, 665210, 494295, 304386, 102778,
     -102778, -304386, -494295, -665210, -810560, -924761, -1003425,
     -1043527),
    (1028428, 871859, 582558, 204567, -204567, -582558, -871859, -1028428,
     -1028428, -871859, -582558, -204567, 204567, 582558, 871859, 1028428),
    (1003425, 665210, 102778, -494295, -924761, -1043527, -810560, -304386,
     304386, 810560, 1043527, 924761, 494295, -102778, -665210, -1003425),
    (968758, 401273, -401273, -968758, -968758, -401273, 401273, 968758,
     968758, 401273, -401273, -968758, -968758, -401273, 401273, 968758),
    (924761, 102778, -810560, -1003425, -304386, 665210, 1043527, 494295,
     -494295, -1043527, -665210, 304386, 1003425, 810560, -102778, -924761),
    (871859, -204567, -1028428, -582558, 582558, 1028428, 204567, -871859,
     -871859, 204567, 1028428, 582558, -582558, -1028428, -204567, 871859),
    (810560, -494295, -1003425, 102778, 1043527, 304386, -924761, -665210,
     665210, 924761, -304386, -1043527, -102778, 1003425, 494295, -810560),
)

#: pHash geometry: 16×16 luma grid → 8×8 low-frequency DCT block → 63 AC
#: coefficients (DC excluded) thresholded at their lower median → a 63-bit
#: fingerprint (bit i set iff coefficient i > median), i in row-major
#: (u, v) order skipping (0, 0). Fits a signed bigint.
PHASH_GRID = 16
PHASH_BITS = 63


def box_luma_grid(rows: list[list[int]], width: int, height: int,
                  n: int = PHASH_GRID) -> list[int]:
    """Integer box-average downsample of a luma matrix to an n×n grid,
    flattened row-major. Cell (i, j) floors the mean over pixel rows
    [i·h/n, (i+1)·h/n) × cols [j·w/n, (j+1)·w/n) — every pixel belongs
    to exactly one cell, so re-encoded copies with identical pixels give
    identical grids. Requires width ≥ n and height ≥ n."""
    if width < n or height < n:
        raise ValueError(f"image {width}x{height} smaller than {n}x{n} grid")
    out = []
    for i in range(n):
        r0, r1 = i * height // n, (i + 1) * height // n
        for j in range(n):
            c0, c1 = j * width // n, (j + 1) * width // n
            s = sum(rows[r][c] for r in range(r0, r1) for c in range(c0, c1))
            out.append(s // ((r1 - r0) * (c1 - c0)))
    return out


def phash64_batch(grids) -> list[int]:
    """Vectorized pHash over a batch of flattened 16×16 luma grids
    (numpy int64 einsum — EXACT: the same 2^20 fixed-point table and
    the proven ≤7.2e16 < 2^63 bound, so no wraparound is reachable;
    pinned bit-identical to :func:`phash64` per row). This is the form
    the Arrow batch path uses — ~3k interpreted Python multiply-adds
    per row collapse into three BLAS-free integer matmuls per batch."""
    import numpy as np
    n = PHASH_GRID
    arr = np.asarray(grids, dtype=np.int64).reshape(-1, n, n)
    t = np.asarray(PHASH_DCT_T, dtype=np.int64)          # 8×16
    m = np.einsum("ux,bxy->buy", t, arr)                 # B×8×16
    d = np.einsum("buy,vy->buv", m, t).reshape(-1, 64)   # B×64
    vals = d[:, 1:]                                      # 63 AC coeffs
    med = np.sort(vals, axis=1)[:, 31:32]
    weights = (np.int64(1) << np.arange(63, dtype=np.int64))
    return [int(x) for x in ((vals > med) @ weights)]


def phash64(luma: list[int]) -> int:
    """Python reference pHash over a flattened 16×16 luma grid — the SAME
    arithmetic :func:`phash_spark_sql` / :func:`phash_duckdb_sql` spell
    relationally (parity is pinned by tests): separable integer DCT
    D = T·L·Tᵀ over :data:`PHASH_DCT_T`, lower median of the 63 AC
    coefficients, strict > threshold."""
    n = PHASH_GRID
    if len(luma) != n * n:
        raise ValueError(f"expected {n * n} luma cells, got {len(luma)}")
    t = PHASH_DCT_T
    m = [[sum(t[u][x] * luma[x * n + y] for x in range(n)) for y in range(n)]
         for u in range(8)]
    dct = [sum(m[u][y] * t[v][y] for y in range(n))
           for u in range(8) for v in range(8)]
    vals = dct[1:]
    med = sorted(vals)[31]
    return sum(1 << i for i, v in enumerate(vals) if v > med)


def phash_duckdb_sql(lum: str) -> list[tuple[str, str]]:
    """DuckDB pHash binding chain over a 256-element list expression
    ``lum`` — splice each (name, expr) as a chained CTE select; inlines
    the SAME :data:`PHASH_DCT_T` literals :func:`phash64` uses, so the
    oracle is the arithmetic twin of the Python/decode path.

    There is deliberately NO Spark-SQL dialect of this chain: Catalyst
    has no common-subexpression elimination inside higher-order-function
    lambdas and CollapseProject inlines a once-referenced column into
    the lambda body, so each binding step re-evaluates its whole input
    per lambda element — the chain's cost multiplies step by step
    (measured: the _m stage alone ran ~4 s/row; _dct over it timed out
    outright). On Spark the per-row map belongs in the Arrow decode path
    (:func:`phash_features` / the media_phash query), which is also
    where a real image decoder lives anyway.
    """
    n = PHASH_GRID
    t_lit = ("[" + ", ".join(
        "[" + ", ".join(f"{v}::BIGINT" for v in row) + "]"
        for row in PHASH_DCT_T) + "]")
    m = (f"list_transform(generate_series(0, 7), u ->"
         f" list_transform(generate_series(0, {n - 1}), y ->"
         f" cast(list_sum(list_transform(generate_series(0, {n - 1}),"
         f" x -> ({t_lit})[u + 1][x + 1] * ({lum})[x * {n} + y + 1]))"
         f" as bigint)))")
    d = ("flatten(list_transform(generate_series(0, 7), u ->"
         " list_transform(generate_series(0, 7), v ->"
         f" cast(list_sum(list_transform(generate_series(0, {n - 1}),"
         f" y -> (_m)[u + 1][y + 1] * ({t_lit})[v + 1][y + 1]))"
         " as bigint))))")
    vals = "list_slice(_dct, 2, 64)"
    med = "list_sort(_vals)[32]"
    ph = ("cast(list_sum(list_transform(generate_series(0, 62), i ->"
          " case when (_vals)[i + 1] > _med then (1::BIGINT << i)"
          " else 0::BIGINT end)) as bigint)")
    return [("_m", m), ("_dct", d), ("_vals", vals), ("_med", med),
            ("phash", ph)]


def encode_bmp_gray(rows: list[list[int]]) -> bytes:
    """Encode a luma matrix as an 8-bit paletted grayscale BMP
    (bottom-up, BI_RGB, 256-entry gray palette). The palette maps index
    i → (B, G, R) = (i, i, i), so :func:`decode_bmp`'s Rec.601 luma of
    entry i is ``(299i + 587i + 114i) // 1000 = i`` — the encode→decode
    round trip is EXACTLY the identity on luma, which is what lets the
    media_phash driver row prove the decoder under the oracle hash gate.
    """
    height, width = len(rows), len(rows[0])
    stride = (width + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    pixels = b"".join(
        bytes(rows[r]) + b"\x00" * (stride - width)
        for r in range(height - 1, -1, -1))
    pix_off = 14 + 40 + len(palette)
    header = (b"BM" + struct.pack("<IHHI", pix_off + len(pixels), 0, 0,
                                  pix_off)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                            len(pixels), 2835, 2835, 256, 0))
    return header + palette + pixels


def encode_bmp_rgb24(rows_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode an (R, G, B) pixel matrix as an uncompressed 24-bit BMP
    (bottom-up, BI_RGB, 4-byte row padding) — the other public
    uncompressed variant, used by tests to prove a bit-depth re-encode
    of the same pixels decodes to identical luma."""
    height, width = len(rows_rgb), len(rows_rgb[0])
    stride = ((width * 3 + 3) // 4) * 4
    pixels = b"".join(
        b"".join(bytes((b, g, r)) for r, g, b in rows_rgb[row])
        + b"\x00" * (stride - width * 3)
        for row in range(height - 1, -1, -1))
    pix_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", pix_off + len(pixels), 0, 0,
                                  pix_off)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


def md5_luma_grid(text: str | None) -> list[int]:
    """Deterministic synthetic 16×16 luma (flattened, 256 bytes) from a
    document's text: byte j is the (j mod 16)-th byte of
    ``md5(text || ':' || (j div 16))``. Purely a test-data synthesizer —
    it gives every engine (Python here, DuckDB via the media_phash
    oracle) the SAME pixel grid without shipping image fixtures in the
    driver's parquet."""
    base = text if isinstance(text, str) else ""
    digs = [hashlib.md5(f"{base}:{i}".encode()).hexdigest()
            for i in range(PHASH_GRID)]
    return [int(digs[j // 16][(j % 16) * 2:(j % 16) * 2 + 2], 16)
            for j in range(PHASH_GRID * PHASH_GRID)]


def media_phash_roundtrip(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """REAL perceptual hashing through a REAL container round trip, as
    one Arrow-batched map: synthesize each document's 16×16 luma
    (:func:`md5_luma_grid`), ENCODE it as an actual 8-bit grayscale BMP
    (:func:`encode_bmp_gray`), DECODE the container back
    (:func:`decode_bmp` — the seam a production pipeline fills with
    PIL/ffmpeg), box-downsample, and integer-DCT pHash (:func:`phash64`).

    The DuckDB oracle computes the pHash directly over the md5 bytes
    (:func:`phash_duckdb_sql`) with NO container leg, so a driver hash
    match proves encode→decode is the identity on luma AND the DCT
    arithmetic is engine-exact — the decoder itself sits under the
    oracle gate, not just under unit tests. Plan shape: Scan →
    Arrow-batched map (zero joins); per-row cost is a fixed ~3k int64
    multiply-adds + 16 md5, independent of corpus size, and the output
    is 16 bytes/row. Decode is CPU-bound Python, so when the scan
    yields FEWER splits than the cluster's parallelism (the small-file
    case: one parquet file = one task = one core decoding everything,
    measured 1 partition/6.9 s at sf0.1) the input is repartitioned to
    defaultParallelism first; at production split counts (100 TB =
    ~10⁵ splits ≫ cores) the branch is dead and the plan is map-only.
    Ref parity: the reference has no media path at all (SURVEY §2
    beyond-reference mandate); pHash per Zauner's public spec (DCT
    hash), integer-exact variant.
    """
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("phash", LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = PHASH_GRID
        for pdf in batches:
            ids, grids = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                lum = md5_luma_grid(text)
                grid = [lum[i * n:(i + 1) * n] for i in range(n)]
                w, h, decoded = decode_bmp(encode_bmp_gray(grid))
                ids.append(int(doc_id))
                grids.append(box_luma_grid(decoded, w, h))
            hashes = phash64_batch(grids) if grids else []
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "phash": pd.Series(hashes, dtype="int64")})

    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("_text"))
    # CPU-bound decode: spread small-file scans across the cluster. Only
    # for batch inputs — a streaming micro-batch takes its parallelism
    # from the source, and .rdd is not defined on a streaming frame
    # (the op stays a stateless stream-transparent projection there)
    if not sel.isStreaming:
        target = sel.sparkSession.sparkContext.defaultParallelism
        if sel.rdd.getNumPartitions() < target:
            sel = sel.repartition(target)
    return sel.mapInPandas(run, schema)


def phash_robustness(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     qs: tuple[int, ...] = (2, 8, 32)) -> DataFrame:
    """MEASURED re-encoding tolerance of the 63-bit pHash — the
    measured-not-claimed number (the jl_then_neardup precedent) for how
    much lossy re-encoding the fingerprint family's near-dup thresholds
    survive. Per document: the baseline pHash of its synthetic luma
    grid (:func:`md5_luma_grid`), then for each quantization severity
    ``q`` the grid is uniformly quantized to ``(p div q)·q`` — the
    deterministic integer-exact stand-in for lossy compression (coarser
    quantization bins = harsher re-encode) — pushed through the REAL
    BMP encode→decode leg (:func:`encode_bmp_gray`/:func:`decode_bmp`)
    and re-hashed. Output: one row per (doc, q) with the Hamming
    distance between the re-encoded and baseline hashes. Downstream
    aggregation (queries.q_phash_robustness) reports the distribution
    plus the within-threshold counts at the fingerprint_neardup /
    video_neardup Hamming cutoffs.

    Plan shape: Scan → Arrow-batched map, zero joins; per-row cost is
    the fixed ``(1+len(qs))`` pHash evaluations (numpy-einsum batched)
    and the fan-out the fixed ``len(qs)`` — never corpus-proportional.
    Same conditional small-scan repartition as media_phash_roundtrip.
    The quantization is integer-exact, so the DuckDB oracle twin
    (queries._phash_robustness_sql) reproduces every Hamming count
    bit-identically with NO container leg — a driver hash match proves
    the quantized-grid encode→decode identity AND the DCT arithmetic
    at every severity simultaneously.
    """
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("q", LongType()),
                         StructField("hamming", LongType())])
    qlist = list(qs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = PHASH_GRID
        for pdf in batches:
            ids, grids = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                lum = md5_luma_grid(text)
                grid = [lum[i * n:(i + 1) * n] for i in range(n)]
                ids.append(int(doc_id))
                grids.append(lum)    # baseline: no container needed —
                # media_phash already pins encode→decode identity on it
                # (flat 256, same shape box_luma_grid emits below)
                for q in qlist:
                    quant = [[(p // q) * q for p in row] for row in grid]
                    w, h, dec = decode_bmp(encode_bmp_gray(quant))
                    grids.append(box_luma_grid(dec, w, h))
            hashes = phash64_batch(grids) if grids else []
            out_ids, out_qs, out_h = [], [], []
            step = 1 + len(qlist)
            for di, doc_id in enumerate(ids):
                base = hashes[di * step]
                for qi, q in enumerate(qlist):
                    out_ids.append(doc_id)
                    out_qs.append(q)
                    out_h.append(bin(base ^ hashes[di * step + 1 + qi])
                                 .count("1"))
            yield pd.DataFrame({
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "q": pd.Series(out_qs, dtype="int64"),
                "hamming": pd.Series(out_h, dtype="int64")})

    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("_text"))
    if not sel.isStreaming:
        target = sel.sparkSession.sparkContext.defaultParallelism
        if sel.rdd.getNumPartitions() < target:
            sel = sel.repartition(target)
    return sel.mapInPandas(run, schema)


#: audio fingerprint geometry: 256 signed 16-bit PCM samples → 64 frames
#: of 4 samples → frame energies (int64-exact: |s|≤2^15 ⇒ E ≤ 2^32) →
#: 63-bit energy-delta fingerprint (bit f set iff E_f > E_{f+1}) — the
#: integer-exact simplified cousin of chromaprint's filter deltas, enough
#: to detect re-encoded copies of the same waveform. Sample synthesis
#: uses md5 digests 16..47 of the same per-document digest stream whose
#: 0..15 range feeds :func:`md5_luma_grid`.
AUDIOFP_FRAMES = 64
AUDIOFP_FRAME_LEN = 4


def md5_pcm_samples(text: str | None) -> list[int]:
    """Deterministic synthetic waveform: 256 little-endian signed int16
    samples from md5 digests 16..47 of the document's digest stream —
    the audio twin of :func:`md5_luma_grid`."""
    base = text if isinstance(text, str) else ""
    raw = b"".join(hashlib.md5(f"{base}:{i}".encode()).digest()
                   for i in range(16, 48))
    return [int.from_bytes(raw[2 * j:2 * j + 2], "little", signed=True)
            for j in range(256)]


def audio_energy_fp(samples: list[int]) -> int:
    """63-bit energy-delta fingerprint over 64 fixed frames — pure int64
    arithmetic, bit-identical in Python and the DuckDB oracle chain."""
    n = AUDIOFP_FRAMES * AUDIOFP_FRAME_LEN
    if len(samples) != n:
        raise ValueError(f"expected {n} samples, got {len(samples)}")
    fl = AUDIOFP_FRAME_LEN
    e = [sum(s * s for s in samples[fl * f:fl * f + fl])
         for f in range(AUDIOFP_FRAMES)]
    return sum(1 << f for f in range(AUDIOFP_FRAMES - 1) if e[f] > e[f + 1])


def encode_wav_pcm16(samples: list[int], rate: int = 8000,
                     channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer for 16-bit mono PCM — the container the
    tests and the media_audiofp roundtrip feed back into
    :func:`decode_wav`."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    block = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def media_audiofp_roundtrip(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """The audio twin of :func:`media_phash_roundtrip`: synthesize each
    document's PCM waveform from md5 bytes, ENCODE a real RIFF/WAVE
    container, DECODE it back through :func:`decode_wav` (the seam a
    production pipeline fills with a real codec), and fingerprint the
    decoded samples with the integer-exact energy-delta hash. The
    DuckDB oracle computes the fingerprint over the md5 bytes directly
    with NO container leg, so the driver hash match proves the WAV
    encode→decode is the identity on samples AND the fingerprint
    arithmetic is engine-exact. Same plan shape and conditional
    repartition as media_phash_roundtrip."""
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("audiofp", LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                wav = encode_wav_pcm16(md5_pcm_samples(text))
                rate, channels, decoded = decode_wav(wav)
                assert (rate, channels) == (8000, 1)
                out.append((int(doc_id), audio_energy_fp(decoded)))
            yield pd.DataFrame(out, columns=["doc_id", "audiofp"])

    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("_text"))
    # CPU-bound decode: spread small-file scans across the cluster. Only
    # for batch inputs — a streaming micro-batch takes its parallelism
    # from the source, and .rdd is not defined on a streaming frame
    # (the op stays a stateless stream-transparent projection there)
    if not sel.isStreaming:
        target = sel.sparkSession.sparkContext.defaultParallelism
        if sel.rdd.getNumPartitions() < target:
            sel = sel.repartition(target)
    return sel.mapInPandas(run, schema)


def audiofp_robustness(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       qs: tuple[int, ...] = (4, 64, 1024)) -> DataFrame:
    """MEASURED requantization tolerance of the 63-bit energy-delta
    audio fingerprint — the audio twin of :func:`phash_robustness`.
    Per document: the baseline fingerprint of its synthetic PCM
    waveform (:func:`md5_pcm_samples`), then per severity ``q`` every
    sample requantized to step ``q`` via the bias-to-unsigned spelling
    ``((s + 32768) // q) * q − 32768`` (nonnegative dividend, so
    floor == truncate in every engine; q = 4/64/1024 model 14-/10-/
    6-bit audio), pushed through the REAL RIFF/WAVE encode→decode leg
    (:func:`encode_wav_pcm16`/:func:`decode_wav`) and re-fingerprinted.
    Output: one row per (doc, q) with the Hamming distance to the
    baseline fingerprint; queries.q_audiofp_robustness aggregates the
    bounded per-severity report.

    Plan shape: Scan → Arrow-batched map, zero joins; fixed
    ``(1+len(qs))`` fingerprint evaluations per row. The requantization
    is integer-exact, so the DuckDB twin (no container leg) reproduces
    every Hamming count bit-identically — the driver hash match proves
    the quantized-sample WAV round trip is the identity AND the energy
    arithmetic is engine-exact at every severity simultaneously."""
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("q", LongType()),
                         StructField("hamming", LongType())])
    qlist = list(qs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_qs, out_h = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                smp = md5_pcm_samples(text)
                base = audio_energy_fp(smp)   # baseline: no container —
                # media_audiofp already pins encode→decode identity
                for q in qlist:
                    quant = [((s + 32768) // q) * q - 32768 for s in smp]
                    rate, channels, dec = decode_wav(
                        encode_wav_pcm16(quant))
                    assert (rate, channels) == (8000, 1)
                    out_ids.append(int(doc_id))
                    out_qs.append(q)
                    out_h.append(bin(base ^ audio_energy_fp(dec))
                                 .count("1"))
            yield pd.DataFrame({
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "q": pd.Series(out_qs, dtype="int64"),
                "hamming": pd.Series(out_h, dtype="int64")})

    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("_text"))
    if not sel.isStreaming:
        target = sel.sparkSession.sparkContext.defaultParallelism
        if sel.rdd.getNumPartitions() < target:
            sel = sel.repartition(target)
    return sel.mapInPandas(run, schema)


#: schema of decoded perceptual-hash features.
PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("phash", LongType()),
])


def phash_features(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL perceptual hashing over BMP payloads: decode
    (:func:`decode_bmp`), box-downsample to the 16×16 grid, integer-DCT
    pHash (:func:`phash64`) — the decode seam made real for the one
    container this environment can parse without codecs. Output feeds
    :func:`fingerprint_neardup` (bits=63, bands=3) exactly like
    payload_simhash feeds media_neardup."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, luma = decode_bmp(bytes(payload))
                rows.append((doc_id, w, h,
                             phash64(box_luma_grid(luma, w, h))))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in PHASH_SCHEMA])

    return df.select("doc_id", "payload").mapInPandas(extract, PHASH_SCHEMA)


def banded_fingerprint(fp: DataFrame, id_col: str = "doc_id",
                       fp_col: str = "simhash", bits: int = 48,
                       bands: int = 4) -> DataFrame:
    """Explode a bit-fingerprint column into its LSH band keys:
    one row per (id, band) carrying the fingerprint in-row (``_fpv``)
    and the band's bit slice (``band_key``). The shared banding half
    of :func:`fingerprint_neardup` and the streaming ingest gate
    (streaming/state.py incremental_fingerprint_neardup_processor) —
    factored so both consume ONE spelling of the shift/mask
    arithmetic. Pure projection + bounded explode (``bands`` rows per
    input row), stream-transparent."""
    if bands <= 0 or bits % bands != 0:
        raise ValueError(
            f"bands must divide bits evenly, got bits={bits}"
            f" bands={bands}")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    return fp.select(
        F.col(id_col), F.col(fp_col).alias("_fpv"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    ).withColumn(
        "band_key",
        F.expr(f"shiftright(_fpv, cast(band * {band_bits} as int))"
               f" & {mask}"))


def fingerprint_neardup(fp: DataFrame, id_col: str = "doc_id",
                        fp_col: str = "simhash", bits: int = 48,
                        bands: int = 4, max_hamming: int = 3,
                        max_bucket: int = 50) -> DataFrame:
    """Banded Hamming near-dup pairs over ANY precomputed bit
    fingerprint (byte SimHash, decoded pHash, chromaprint...): the
    banding/verify half of :func:`media_neardup`, factored so real
    perceptual hashes plug in without re-spelling the machinery. See
    media_neardup for the pigeonhole/lossless and sizing discussion."""
    banded = banded_fingerprint(fp, id_col, fp_col, bits, bands)
    # the banded table feeds THREE consumers (bucket cap + both join
    # legs) — unpinned, each would re-run the fingerprint fold over the
    # full payload (4 corpus scans, measured). Pin the skinny
    # (id, fp, band, key) table once: the bm25_multiterm localCheckpoint
    # discipline — materialize ~32 B/row, never payload bytes, and the
    # final plan has zero payload scans and zero Generates. eager=False
    # (r12 ADVICE) keeps plan construction lazy — no job runs at
    # DataFrame-build time; the pin materializes on first action.
    banded = banded.localCheckpoint(eager=False)
    ok = (banded.groupBy("band", "band_key")
          .agg(F.count("*").alias("_bc"))
          .filter(F.col("_bc") <= max_bucket)
          .select("band", "band_key"))
    kept = banded.join(ok, ["band", "band_key"])
    a = kept.select(F.col(id_col).alias("id_a"),
                    F.col("_fpv").alias("_fa"), "band", "band_key")
    b = kept.select(F.col(id_col).alias("id_b"),
                    F.col("_fpv").alias("_fb"), "band", "band_key")
    pairs = (a.join(b, ["band", "band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "_fa", "_fb").distinct())
    return (pairs
            .withColumn("hamming",
                        F.expr("cast(bit_count(_fa ^ _fb) as bigint)"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


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
    fp = payload_simhash(df, payload_col, id_col, bits=bits)
    return fingerprint_neardup(fp, id_col=id_col, fp_col="simhash",
                               bits=bits, bands=bands,
                               max_hamming=max_hamming,
                               max_bucket=max_bucket)


#: video geometry: a YUV4MPEG2 (Y4M) container per the public
#: yuv4mpeg(5) stream layout (mjpegtools) — an ASCII stream header
#: ``YUV4MPEG2 W.. H.. F.. ..\n`` followed by ``FRAME\n``-delimited raw
#: planar frames. Frames here are luma-only (``Cmono``), 16×16, so each
#: frame body is exactly 256 bytes. Frame f of a document synthesizes
#: its luma from md5 digests 48+16f .. 63+16f — the continuation of the
#: SAME per-document digest stream whose 0..15 range feeds
#: :func:`md5_luma_grid` (image) and 16..47 :func:`md5_pcm_samples`
#: (audio): one stream, three modalities, so the DuckDB oracles share
#: the synthesis spelling.
VIDEO_FRAMES = 4
VIDEO_DIGEST_BASE = 48


def encode_y4m(frames: list[list[list[int]]], rate: str = "25:1") -> bytes:
    """Minimal YUV4MPEG2 writer for luma-only (``Cmono``) video: every
    frame is a row-matrix of 0..255 luma values, all the same size. The
    container the tests and :func:`media_videofp_roundtrip` feed back
    into :func:`decode_y4m`."""
    if not frames:
        raise ValueError("need at least one frame")
    height, width = len(frames[0]), len(frames[0][0])
    out = [f"YUV4MPEG2 W{width} H{height} F{rate} Ip A1:1 Cmono\n"
           .encode("ascii")]
    for fr in frames:
        if len(fr) != height or any(len(r) != width for r in fr):
            raise ValueError("all frames must share one geometry")
        out.append(b"FRAME\n")
        out.append(bytes(v for row in fr for v in row))
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, list[list[list[int]]]]:
    """Pure-stdlib YUV4MPEG2 decoder → (width, height, frames), each
    frame a row-matrix of luma ints. Parses the tagged stream-header
    parameters (W/H/F/I/A/C per the public spec; unknown X tags are
    skipped), tolerates per-frame parameters after ``FRAME``, and
    requires ``Cmono`` — chroma-subsampled streams (C420/C422/C444)
    raise at this seam exactly like compressed audio does at
    :func:`decode_wav`: a production pipeline plugs ffmpeg in here."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = None
    colour = "420jpeg"  # the spec's default when no C tag is present
    for tok in payload[:nl].decode("ascii").split()[1:]:
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "C":
            colour = tok[1:]
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if colour != "mono":
        raise NotImplementedError(
            f"only Cmono (luma-only) Y4M decodes natively; C{colour} "
            "needs chroma handling via a real codec (ffmpeg seam)")
    frames, pos, body = [], nl + 1, width * height
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        # per yuv4mpeg(5) the marker is the literal FRAME followed by
        # optional space-separated parameters, then newline — a marker
        # like b"FRAMES" or b"FRAMExyz" is malformed, not parameterized
        if (fnl < 0 or payload[pos:pos + 5] != b"FRAME"
                or payload[pos + 5:pos + 6] not in (b"\n", b" ")):
            raise ValueError("malformed FRAME marker")
        raw = payload[fnl + 1:fnl + 1 + body]
        if len(raw) != body:
            raise ValueError("truncated frame body")
        frames.append([list(raw[r * width:(r + 1) * width])
                       for r in range(height)])
        pos = fnl + 1 + body
    return width, height, frames


def md5_video_lumas(text: str | None,
                    n_frames: int = VIDEO_FRAMES) -> list[list[int]]:
    """Deterministic synthetic video: frame f's flattened 16×16 luma
    takes byte j from byte (j mod 16) of
    ``md5(text || ':' || (48 + 16·f + j div 16))`` — the same
    synthesizer family as :func:`md5_luma_grid`, shifted into the
    video range of the document's digest stream."""
    base = text if isinstance(text, str) else ""
    out = []
    for f in range(n_frames):
        digs = [hashlib.md5(
            f"{base}:{VIDEO_DIGEST_BASE + 16 * f + i}".encode()).hexdigest()
            for i in range(PHASH_GRID)]
        out.append([int(digs[j // 16][(j % 16) * 2:(j % 16) * 2 + 2], 16)
                    for j in range(PHASH_GRID * PHASH_GRID)])
    return out


def media_videofp_roundtrip(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            n_frames: int = VIDEO_FRAMES) -> DataFrame:
    """The video leg of the real-container battery: synthesize each
    document's frames (:func:`md5_video_lumas`), ENCODE one actual
    YUV4MPEG2 container per document, DECODE it back
    (:func:`decode_y4m` — the ffmpeg seam), and pHash every decoded
    frame (the per-frame fingerprint a video near-dup keys on). Output
    is one row per (doc, frame): ``doc_id, frame_idx, phash``.

    The DuckDB oracle computes each frame's pHash over the md5 bytes
    directly with NO container leg, so a driver hash match proves the
    Y4M encode→decode is the identity on every frame's luma AND the DCT
    arithmetic is engine-exact — the same proof structure as
    media_phash/media_audiofp. Plan shape: Scan → Arrow-batched map
    (zero joins); fan-out is the FIXED n_frames (bounded by the frame
    sampler at ingest, never corpus-proportional), per-row cost a fixed
    n_frames·(16 md5 + one 16×16 pHash) and the output 24 bytes/row.
    Same conditional small-scan repartition as media_phash_roundtrip.
    Ref parity: the reference has no media path (SURVEY §2
    beyond-reference mandate); container per the public yuv4mpeg(5)
    layout, pHash per Zauner's DCT-hash spec, integer-exact variant.
    """
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("frame_idx", LongType()),
                         StructField("phash", LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = PHASH_GRID
        for pdf in batches:
            ids, fidx, grids = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                lumas = md5_video_lumas(text, n_frames)
                y4m = encode_y4m(
                    [[lum[i * n:(i + 1) * n] for i in range(n)]
                     for lum in lumas])
                w, h, decoded = decode_y4m(y4m)
                for f, fr in enumerate(decoded):
                    ids.append(int(doc_id))
                    fidx.append(f)
                    grids.append(box_luma_grid(fr, w, h))
            hashes = phash64_batch(grids) if grids else []
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(fidx, dtype="int64"),
                "phash": pd.Series(hashes, dtype="int64")})

    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("_text"))
    # CPU-bound decode: spread small-file scans across the cluster. Only
    # for batch inputs — a streaming micro-batch takes its parallelism
    # from the source, and .rdd is not defined on a streaming frame
    # (the op stays a stateless stream-transparent projection there)
    if not sel.isStreaming:
        target = sel.sparkSession.sparkContext.defaultParallelism
        if sel.rdd.getNumPartitions() < target:
            sel = sel.repartition(target)
    return sel.mapInPandas(run, schema)


def video_neardup(frames: DataFrame, id_col: str = "doc_id",
                  frame_col: str = "frame_idx", fp_col: str = "phash",
                  bands: int = 3, max_hamming: int = 2,
                  min_frames: int = 2, max_bucket: int = 50,
                  frame_capacity: int = 64) -> DataFrame:
    """Video near-duplicate pairs from a per-frame fingerprint table
    (the :func:`media_videofp_roundtrip` output shape): two videos are
    near-dups when at least ``min_frames`` frame pairs — ANY index
    combination, so temporal shifts and re-cuts still match — are
    within ``max_hamming`` bits of each other. This is the standard
    frame-fingerprint-voting video dedup, built entirely from the
    repo's existing banded machinery: frames get a synthetic id
    ``doc·frame_capacity + frame_idx`` and run through
    :func:`fingerprint_neardup` (63-bit pHash, ``bands`` × 21-bit bands
    — pigeonhole-lossless for ``max_hamming < bands``), then the frame
    pairs collapse to document pairs with a partial-aggregatable count.

    Scale shape: only the skinny (fid, phash, band, key) rows reach the
    exchanges (localCheckpoint-pinned inside fingerprint_neardup, zero
    re-derivations); the hot-bucket cap bounds degenerate frames (black
    frames, test cards) before the self-join can go quadratic, AQE can
    skew-split the bucket join, and the doc-pair vote is a plain
    groupBy count — map-side combinable. ``frame_capacity`` must exceed
    the per-video frame-sample count (it's a sampler bound, not a video
    length: frame sampling at ingest fixes fan-out per video).

    ID-RANGE CONTRACT: the synthetic id is ``doc·frame_capacity +
    frame``, so ``|id_col|`` must fit ``signed_int64 / frame_capacity``
    (2^57 at the default 64). Dense ingest ids satisfy this by
    construction; if video ids are 63-bit content hashes, densify them
    first (zipWithIndex-style or a dictionary join) — do NOT raise
    frame_capacity toward the hash range. Negative ids are valid: the
    collapse back to doc ids is true FLOOR division (exact in int64 via
    ``pmod``, never Spark's truncate-toward-zero ``div``, which would
    fold doc −1's low frames into doc 0), and because
    ``frame ∈ [0, frame_capacity)`` the synthetic id is monotone in
    (doc, frame), so the pair ordering invariant below holds for any
    sign.
    """
    if frame_capacity <= 0:
        raise ValueError("frame_capacity must be positive")
    fid = frames.select(
        (F.col(id_col) * frame_capacity + F.col(frame_col)).alias("_fid"),
        F.col(fp_col).alias("_fp"))
    pairs = fingerprint_neardup(fid, id_col="_fid", fp_col="_fp",
                                bits=PHASH_BITS, bands=bands,
                                max_hamming=max_hamming,
                                max_bucket=max_bucket)
    # _fid ordering equals doc ordering for cross-doc pairs (frame is a
    # non-negative remainder < capacity), so id_a's doc <= id_b's doc
    # already: no least/greatest normalization needed. Floor division
    # via the non-negative pmod remainder — exact for negative docs
    floordiv = (f"(%s - pmod(%s, {frame_capacity})) div {frame_capacity}")
    docs = pairs.select(
        F.expr(floordiv % ("id_a", "id_a")).alias("id_a"),
        F.expr(floordiv % ("id_b", "id_b")).alias("id_b"))
    return (docs.filter(F.col("id_a") != F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_matched"))
            .filter(F.col("n_matched") >= min_frames))


def video_scene_cuts(frames: DataFrame, id_col: str = "doc_id",
                     frame_col: str = "frame_idx", fp_col: str = "phash",
                     cut_threshold: int = 16) -> DataFrame:
    """Scene-change detection over a per-frame fingerprint table (the
    :func:`media_videofp_roundtrip` output shape): a cut is a frame
    whose pHash sits ``cut_threshold`` or more bits from its
    predecessor — the standard fingerprint-delta segmentation a frame
    sampler uses to pick one representative frame per scene instead of
    every k-th frame. Output: one row per frame with the Hamming
    distance to the previous frame (NULL on each video's first frame)
    and the cut flag.

    Scale shape: ONE ordered window partitioned by the video id — a
    bounded fan-in key (the sampler fixes frames-per-video at ingest;
    never corpus-proportional), so the lag window is skew-safe by
    construction; the Hamming delta is an in-row bit_count. Only
    (id, frame, fp) rows reach the exchange."""
    w = Window.partitionBy(id_col).orderBy(frame_col)
    prev = F.lag(F.col(fp_col)).over(w)
    ham = F.when(
        prev.isNotNull(),
        F.expr(f"cast(bit_count({fp_col} ^ _prev_fp) as bigint)"))
    return (frames
            .withColumn("_prev_fp", prev)
            .withColumn("ham_prev", ham)
            .withColumn(
                "is_cut",
                F.coalesce(F.col("ham_prev") >= cut_threshold,
                           F.lit(False)))
            .select(F.col(id_col), F.col(frame_col),
                    F.col(fp_col), "ham_prev", "is_cut"))
