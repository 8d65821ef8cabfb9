"""Real-decoder battery: BMP/WAV pure-stdlib decoders, the integer-exact
pHash, and the decoded-hash → banding near-dup leg.

The reference has no media path at all (SURVEY §2's beyond-reference
mandate); the public specs are BITMAPINFOHEADER/RIFF-WAVE and Zauner's
DCT-hash. What these tests pin:

- container correctness: encode→decode round trips are exact for both
  uncompressed BMP bit depths and both WAV PCM widths, bottom-up AND
  top-down row order;
- perceptual robustness: a bit-depth re-encode of the SAME pixels hashes
  IDENTICALLY, small pixel noise hashes NEAR, a 2× re-render hashes near,
  distinct images hash FAR;
- the Python pHash is the bit-exact twin of the DuckDB oracle chain that
  drives the media_phash driver row;
- decoded hashes flow through fingerprint_neardup (media_neardup's
  factored banding/verify) unchanged.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import duckdb
import pytest

from kafka_connect_streams_spark.operators.multimodal import (
    PHASH_BITS, PHASH_DCT_T, PHASH_GRID, box_luma_grid, decode_bmp,
    decode_image_real, decode_wav, encode_bmp_gray, encode_bmp_rgb24,
    fingerprint_neardup, md5_luma_grid, phash64, phash_duckdb_sql,
    phash_features)


def _grid(seed: str, n: int = PHASH_GRID, w: int | None = None,
          h: int | None = None) -> list[list[int]]:
    """Deterministic pseudo-image: md5-derived luma rows (no RNG)."""
    w, h = w or n, h or n
    out = []
    for r in range(h):
        row = []
        d = b""
        while len(d) < w:
            d += hashlib.md5(f"{seed}:{r}:{len(d)}".encode()).digest()
        out.append(list(d[:w]))
    return out


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------- BMP

def test_bmp_gray_roundtrip_is_identity():
    g = _grid("img-a")
    w, h, rows = decode_bmp(encode_bmp_gray(g))
    assert (w, h) == (PHASH_GRID, PHASH_GRID)
    assert rows == g  # palette i -> (i,i,i) makes Rec.601 luma exactly i


def test_bmp_rgb24_same_pixels_same_luma():
    """A 24-bit re-encode of the same grayscale pixels decodes to the
    IDENTICAL luma matrix — the bit-depth-change re-encode case."""
    g = _grid("img-a")
    rgb = [[(v, v, v) for v in row] for row in g]
    w, h, rows = decode_bmp(encode_bmp_rgb24(rgb))
    assert (w, h) == (PHASH_GRID, PHASH_GRID)
    assert rows == g


def test_bmp_rgb24_color_luma_is_rec601():
    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    _, _, rows = decode_bmp(encode_bmp_rgb24(px))
    assert rows == [[299 * 255 // 1000, 587 * 255 // 1000],
                    [114 * 255 // 1000,
                     (299 * 10 + 587 * 20 + 114 * 30) // 1000]]


def test_bmp_topdown_negative_height_decodes_same():
    """Top-down BMPs store rows first-to-last with a negative height;
    the decoder must return the same top-down luma either way."""
    g = _grid("img-top", w=5, h=3)
    payload = bytearray(encode_bmp_gray(g))
    # flip to top-down: negate height, reverse stored row order
    stride = (5 + 3) & ~3
    struct.pack_into("<i", payload, 22, -3)
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    pix = payload[pix_off:]
    flipped = b"".join(pix[i * stride:(i + 1) * stride]
                       for i in range(2, -1, -1))
    payload[pix_off:] = flipped
    assert decode_bmp(bytes(payload)) == (5, 3, g)


def test_bmp_row_padding_nonmultiple_of_four_width():
    g = _grid("img-pad", w=13, h=4)
    assert decode_bmp(encode_bmp_gray(g)) == (13, 4, g)
    rgb = [[(v, v, v) for v in row] for row in g]
    assert decode_bmp(encode_bmp_rgb24(rgb)) == (13, 4, g)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    # malformed dimensions fail loudly instead of hashing silently
    zero_w = bytearray(encode_bmp_gray(_grid("img-a")))
    struct.pack_into("<i", zero_w, 18, 0)
    with pytest.raises(ValueError, match="dimensions"):
        decode_bmp(bytes(zero_w))
    # RLE8-compressed header must hit the NotImplementedError seam
    payload = bytearray(encode_bmp_gray(_grid("img-a")))
    struct.pack_into("<I", payload, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(payload))


def test_decode_image_real_seam():
    g = _grid("img-a")
    assert decode_image_real(encode_bmp_gray(g)) == (PHASH_GRID, PHASH_GRID)
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


# ---------------------------------------------------------------- WAV

def test_wav_16bit_roundtrip_sample_exact():
    samples = [0, 1000, -1000, 32767, -32768] * 20
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    rate, channels, got = decode_wav(buf.getvalue())
    assert (rate, channels) == (16000, 1)
    assert got == samples


def test_wav_8bit_unsigned_bias_and_stereo():
    raw = bytes([128, 129, 127, 0, 255, 128])  # 3 stereo frames
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(1)
        wv.setframerate(8000)
        wv.writeframes(raw)
    rate, channels, got = decode_wav(buf.getvalue())
    assert (rate, channels) == (8000, 2)
    assert got == [0, 1, -1, -128, 127, 0]


def test_wav_tolerates_extra_chunks_and_rejects_compressed():
    samples = [3, -3, 7]
    data = struct.pack("<3h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    wavb = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 5 + 1
                                  + 8 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
            + b"data" + struct.pack("<I", len(data)) + data)
    assert decode_wav(wavb) == (44100, 1, samples)
    bad = wavb.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 85, 1), 1)
    with pytest.raises(NotImplementedError):
        decode_wav(bad)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


# -------------------------------------------------------------- pHash

def test_phash_bit_depth_reencode_is_identical():
    g = _grid("img-a")
    ph_gray = phash64(box_luma_grid(*_decode(encode_bmp_gray(g))))
    rgb = [[(v, v, v) for v in row] for row in g]
    ph_rgb = phash64(box_luma_grid(*_decode(encode_bmp_rgb24(rgb))))
    assert ph_gray == ph_rgb


def _decode(payload: bytes):
    w, h, rows = decode_bmp(payload)
    return rows, w, h


def test_phash_near_for_noise_far_for_distinct():
    g = _grid("img-a", w=64, h=48)
    noisy = [row[:] for row in g]
    for r in range(0, 48, 7):          # sparse ±2 luma perturbation
        for c in range(0, 64, 11):
            noisy[r][c] = min(255, noisy[r][c] + 2)
    other = _grid("img-b", w=64, h=48)
    ph = phash64(box_luma_grid(g, 64, 48))
    ph_noisy = phash64(box_luma_grid(noisy, 64, 48))
    ph_other = phash64(box_luma_grid(other, 64, 48))
    assert hamming(ph, ph_noisy) <= 6
    assert hamming(ph, ph_other) >= 16


def test_phash_rerender_scale_is_near():
    """The same image rendered at 2× (pixel replication) box-averages to
    the identical 16×16 grid — hash-identical."""
    g = _grid("img-a", w=32, h=32)
    big = []
    for row in g:
        wide = [v for v in row for _ in range(2)]
        big.extend([wide, wide])
    assert phash64(box_luma_grid(g, 32, 32)) == \
        phash64(box_luma_grid(big, 64, 64))


def test_phash_rejects_too_small_and_wrong_len():
    with pytest.raises(ValueError):
        box_luma_grid(_grid("x", w=8, h=8), 8, 8)
    with pytest.raises(ValueError):
        phash64([0] * 100)


def test_phash_matches_duckdb_oracle_chain():
    """The Python pHash (the decode path's arithmetic) is bit-identical
    to the DuckDB chain the media_phash driver row verifies against —
    same hardcoded PHASH_DCT_T, same median convention."""
    texts = ["hello world", "", "the quick brown fox", "hello world",
             "ünïcode ok"]
    py = [phash64(md5_luma_grid(t)) for t in texts]
    con = duckdb.connect()
    con.execute(
        "create table docs as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)")
    lum = ("list_transform(generate_series(0, 255), j -> ('0x' || "
           "substr(_digs[(j // 16) + 1], (j % 16) * 2 + 1, 2))::BIGINT)")
    sql = ("WITH s0 AS (SELECT doc_id, "
           "list_transform(generate_series(0, 15), "
           "i -> md5(coalesce(text, '') || ':' || i)) AS _digs FROM docs), "
           f"s1 AS (SELECT doc_id, {lum} AS _lum FROM s0)")
    prev = "s1"
    for k, (name, expr) in enumerate(phash_duckdb_sql("_lum")):
        sql += f", t{k} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"t{k}"
    got = [r[1] for r in con.sql(
        sql + f" SELECT doc_id, phash FROM {prev} ORDER BY doc_id"
    ).fetchall()]
    assert got == py
    # duplicate texts collide exactly; the unicode doc is distinct
    assert py[0] == py[3] and len(set(py)) == 4


def test_phash64_batch_is_bit_identical_to_reference():
    """The vectorized numpy batch form (the Arrow path's hot loop) must
    equal the pure-Python reference bit-for-bit on every grid —
    including degenerate flat images (all AC coefficients equal the
    median ⇒ zero bits set) and full-range values."""
    from kafka_connect_streams_spark.operators.multimodal import (
        phash64_batch)
    grids = [md5_luma_grid(t) for t in
             ["a", "b", "", "hello world", "zz"]]
    grids.append([0] * 256)
    grids.append([255] * 256)
    grids.append(list(range(256)))
    assert phash64_batch(grids) == [phash64(g) for g in grids]


def test_phash_dct_table_is_the_committed_fixed_point():
    """Regression pin on the hardcoded table: spot values + symmetry
    (row 0 is the DC constant; row 4 has the ±period-8 structure)."""
    assert PHASH_DCT_T[0] == (1048576,) * 16
    assert PHASH_DCT_T[1][0] == 1043527 and PHASH_DCT_T[1][15] == -1043527
    # u=4 is cos(π(2x+1)/8): period-8 antisymmetric block, repeated twice
    assert PHASH_DCT_T[4] == (968758, 401273, -401273, -968758,
                              -968758, -401273, 401273, 968758) * 2
    # every AC row sums to zero exactly (the fixed-point rounding is
    # symmetric), so a constant image has zero AC energy → stable hash
    assert all(sum(r) == 0 for r in PHASH_DCT_T[1:])
    assert len(PHASH_DCT_T) == 8 and all(len(r) == 16 for r in PHASH_DCT_T)


# ---------------------------------------------------- audio fingerprint

def test_encode_wav_roundtrip_and_audiofp_parity():
    """The repo's own WAV writer round-trips sample-exact through
    decode_wav, and the energy-delta fingerprint over the decoded
    samples equals the DuckDB oracle chain computed from the md5 bytes
    directly — the identity the media_audiofp driver row hash-verifies."""
    from kafka_connect_streams_spark.operators.multimodal import (
        audio_energy_fp, encode_wav_pcm16, md5_pcm_samples)
    texts = ["hello world", "", "the quick brown fox", "hello world"]
    py = []
    for t in texts:
        smp = md5_pcm_samples(t)
        rate, channels, decoded = decode_wav(encode_wav_pcm16(smp))
        assert (rate, channels) == (8000, 1) and decoded == smp
        py.append(audio_energy_fp(decoded))
    assert py[0] == py[3] and len(set(py)) == 3
    import kafka_connect_streams_spark.queries as Q
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)")
    got = [r[1] for r in con.sql(
        Q.ORACLE["media_audiofp"] + " ORDER BY doc_id").fetchall()]
    assert got == py


def test_audiofp_invariant_under_amplitude_scaling():
    """Energy deltas compare RATIOS of frame energies implicitly: a
    uniform gain (s → 2s, no clipping) scales every energy by 4 and
    flips no comparison — re-encoded-at-different-volume copies of the
    same waveform fingerprint identically. A genuinely different
    waveform does not."""
    from kafka_connect_streams_spark.operators.multimodal import (
        audio_energy_fp, md5_pcm_samples)
    smp = [s // 4 for s in md5_pcm_samples("track-a")]  # headroom for 2x
    assert audio_energy_fp([2 * s for s in smp]) == audio_energy_fp(
        [s for s in smp])
    other = [s // 4 for s in md5_pcm_samples("track-b")]
    assert audio_energy_fp(other) != audio_energy_fp(smp)
    import pytest
    with pytest.raises(ValueError):
        audio_energy_fp(smp[:100])


# ------------------------------------------- decoded hash → banding

def test_phash_features_and_banding_end_to_end(spark):
    """The full real-decoder near-dup leg: BMP fixtures → Arrow-batched
    decode+pHash (phash_features) → fingerprint_neardup banding/verify
    (bits=63, bands=3 ⇒ lossless for hamming ≤ 2). The 24-bit re-encode
    of image A must pair with its 8-bit original at hamming 0; the two
    distinct images must not pair."""
    g_a = _grid("img-a", w=48, h=32)
    g_b = _grid("img-b", w=48, h=32)
    g_c = _grid("img-c", w=48, h=32)
    payloads = [
        (1, encode_bmp_gray(g_a)),
        (2, encode_bmp_rgb24([[(v, v, v) for v in row] for row in g_a])),
        (3, encode_bmp_gray(g_b)),
        (4, encode_bmp_gray(g_c)),
    ]
    df = spark.createDataFrame(payloads, "doc_id bigint, payload binary")
    feats = phash_features(df)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[1]["phash"] == rows[2]["phash"]
    assert 0 <= rows[1]["phash"] < (1 << PHASH_BITS)
    assert rows[1]["width"] == 48 and rows[1]["height"] == 32
    pairs = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in fingerprint_neardup(
            feats, id_col="doc_id", fp_col="phash",
            bits=PHASH_BITS, bands=3, max_hamming=2,
            max_bucket=50).collect())
    assert (1, 2, 0) in pairs
    assert all({a, b} == {1, 2} for a, b, _ in pairs)


def test_media_roundtrips_are_stream_transparent(spark, tmp_path):
    """The decode paths are stateless Arrow maps, so the SAME operator
    functions run unchanged on a streaming DataFrame (append mode, no
    watermark, no state) and emit rows identical to the batch run over
    the same files — the stream-transparency dividend the projection
    curation ops already have, extended to the real-decoder legs. (The
    small-file repartition branch is batch-only: a streaming micro-batch
    takes its parallelism from the source.)"""
    from kafka_connect_streams_spark.operators.multimodal import (
        media_audiofp_roundtrip, media_phash_roundtrip,
        media_videofp_roundtrip)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = tmp_path / "in"
    src.mkdir()
    docs.coalesce(2).write.parquet(str(src / "a"))
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    for i, op in enumerate([media_phash_roundtrip, media_audiofp_roundtrip,
                        media_videofp_roundtrip]):
        batch = {tuple(r) for r in op(docs, "text", "doc_id").collect()}
        name = f"media_stp{i}"
        q = (op(stream, "text", "doc_id")
             .writeStream.format("memory").queryName(name)
             .outputMode("append").start())
        try:
            q.processAllAvailable()
            got = {tuple(r)
                   for r in spark.sql(f"SELECT * FROM {name}").collect()}
        finally:
            q.stop()
        assert got == batch, op.__name__


def test_media_neardup_unchanged_by_banding_refactor(spark):
    """media_neardup delegates to fingerprint_neardup now; the planted
    duplicate-payload case from the r12 battery must behave identically
    (same pairs, same validation errors)."""
    from kafka_connect_streams_spark.operators.multimodal import (
        media_neardup)
    data = [(1, b"shared-payload-bytes-0123456789"),
            (2, b"shared-payload-bytes-0123456789"),
            (3, b"completely different media bits")]
    df = spark.createDataFrame(data, "doc_id bigint, payload binary")
    got = sorted((r.id_a, r.id_b, r.hamming)
                 for r in media_neardup(df, "payload", "doc_id",
                                        bits=48, bands=4, max_hamming=3,
                                        max_bucket=50).collect())
    assert got == [(1, 2, 0)]
    with pytest.raises(ValueError):
        media_neardup(df, "payload", "doc_id", bits=48, bands=5)


# ---------------------------------------------------------------- Y4M

def _frames(*seeds: str) -> list[list[list[int]]]:
    return [_grid(s) for s in seeds]


def test_y4m_roundtrip_is_identity():
    from kafka_connect_streams_spark.operators.multimodal import (
        decode_y4m, encode_y4m)
    fr = _frames("v-f0", "v-f1", "v-f2", "v-f3")
    w, h, dec = decode_y4m(encode_y4m(fr))
    assert (w, h) == (PHASH_GRID, PHASH_GRID)
    assert dec == fr  # frame order AND every luma byte preserved


def test_y4m_header_variants_parse():
    """Unknown X metadata tags are skipped and per-frame parameters
    after FRAME are tolerated, per the public yuv4mpeg(5) layout."""
    from kafka_connect_streams_spark.operators.multimodal import (
        decode_y4m)
    fr = _grid("v-hdr")
    body = bytes(v for row in fr for v in row)
    payload = (b"YUV4MPEG2 W16 H16 F30000:1001 It A1:1 Cmono Xfoo=bar\n"
               + b"FRAME Ip\n" + body)
    w, h, dec = decode_y4m(payload)
    assert (w, h) == (16, 16) and dec == [fr]


def test_y4m_rejects_chroma_and_malformed():
    from kafka_connect_streams_spark.operators.multimodal import (
        decode_y4m, encode_y4m)
    fr = _grid("v-bad")
    body = bytes(v for row in fr for v in row)
    # chroma-subsampled streams are the ffmpeg seam, like compressed WAV
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W16 H16 F25:1 C420\n" + b"FRAME\n" + body)
    # the spec default (no C tag) is 420jpeg — also the seam
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W16 H16 F25:1\n" + b"FRAME\n" + body)
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a y4m")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 F25:1 Cmono\n")  # missing W/H
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W16 H16 Cmono\n" + b"FRAME\n"
                   + body[:100])  # truncated frame body
    with pytest.raises(ValueError):
        encode_y4m([_grid("a"), _grid("b", w=8, h=8)])  # mixed geometry
    with pytest.raises(ValueError):
        encode_y4m([])


def test_md5_video_lumas_extend_the_digest_stream():
    """Frame f of document d reads digests 48+16f..63+16f of the SAME
    per-document stream the image (0..15) and audio (16..47) legs read
    — pinned against a direct md5 spelling so the three oracles can
    never drift apart; NULL text synthesizes as the empty string."""
    from kafka_connect_streams_spark.operators.multimodal import (
        md5_video_lumas)
    lums = md5_video_lumas("hello world")
    assert len(lums) == 4 and all(len(l) == 256 for l in lums)
    for f in (0, 3):
        dig = hashlib.md5(f"hello world:{48 + 16 * f}".encode()).hexdigest()
        assert lums[f][:16] == [int(dig[j * 2:j * 2 + 2], 16)
                                for j in range(16)]
    assert lums[0] != md5_luma_grid("hello world")  # disjoint ranges
    assert md5_video_lumas(None) == md5_video_lumas("")


def test_media_videofp_container_identity(spark):
    """The operator's Y4M encode→decode→pHash equals pHashing the
    synthesized luma directly — the container leg is the identity —
    and NULL text flows through the same empty-string convention."""
    from kafka_connect_streams_spark.operators.multimodal import (
        md5_video_lumas, media_videofp_roundtrip)
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "the quick brown fox")],
        "doc_id bigint, text string")
    got = {(r.doc_id, r.frame_idx): r.phash
           for r in media_videofp_roundtrip(docs, "text", "doc_id")
           .collect()}
    assert len(got) == 12
    for doc_id, text in [(1, "hello world"), (2, None), (3, "the quick"
                                                            " brown fox")]:
        for f, lum in enumerate(md5_video_lumas(text)):
            assert got[(doc_id, f)] == phash64(lum), (doc_id, f)


def test_media_videofp_matches_duckdb_oracle():
    """The registered video oracle (no container leg) is bit-identical
    to the Python path on a planted corpus — the same lockstep pin
    test_phash_matches_duckdb_oracle_chain gives the image leg."""
    from kafka_connect_streams_spark.operators.multimodal import (
        md5_video_lumas)
    from kafka_connect_streams_spark.queries import ORACLE
    texts = ["hello world", "", "hello world", "ünïcode ok"]
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)")
    got = {(r[0], r[1]): r[2]
           for r in con.sql(ORACLE["media_videofp"]).fetchall()}
    assert len(got) == 16
    for i, t in enumerate(texts):
        for f, lum in enumerate(md5_video_lumas(t)):
            assert got[(i, f)] == phash64(lum), (i, f)


def test_video_neardup_votes_frame_matches(spark):
    """Doc pairs need >= min_frames frame pairs within max_hamming bits:
    exact duplicates match on all 4 frames; a 2-frame overlap passes at
    min_frames=2; a single-frame overlap does not; a frame 3 bits away
    fails the exact verify even when banding surfaces it."""
    from kafka_connect_streams_spark.operators.multimodal import (
        video_neardup)
    base = [int.from_bytes(hashlib.md5(f"fp{k}".encode()).digest()[:8],
                           "big") >> 1 for k in range(8)]
    rows = []
    rows += [(1, f, base[f]) for f in range(4)]
    rows += [(2, f, base[f]) for f in range(4)]          # exact dup of 1
    rows += [(3, 0, base[0]), (3, 1, base[1]),
             (3, 2, base[6]), (3, 3, base[7])]           # 2-frame overlap
    rows += [(4, 0, base[0]), (4, 1, base[4]),
             (4, 2, base[5]), (4, 3, base[3] ^ 0b111)]   # 1 exact + 1 far
    frames = spark.createDataFrame(
        rows, "doc_id bigint, frame_idx bigint, phash bigint")
    got = sorted((r.id_a, r.id_b, r.n_matched)
                 for r in video_neardup(frames).collect())
    assert got == [(1, 2, 4), (1, 3, 2), (2, 3, 2)]
    # temporal shift: the same hash at DIFFERENT indices still matches
    sh = spark.createDataFrame(
        [(1, 0, base[0]), (1, 1, base[1]),
         (2, 2, base[0]), (2, 3, base[1])],
        "doc_id bigint, frame_idx bigint, phash bigint")
    assert [(r.id_a, r.id_b, r.n_matched)
            for r in video_neardup(sh).collect()] == [(1, 2, 2)]


def test_media_phash_relational_oracle_pin():
    """The REGISTERED media_phash oracle — the n_frames=1 relational
    spelling (_phash_relational_sql(1, 0)) — is bit-identical to
    phash64(md5_luma_grid(t)) on a planted corpus. The lambda-chain pin
    (test_phash_matches_duckdb_oracle_chain) and the n_frames=4 pin
    (test_media_videofp_matches_duckdb_oracle) leave the n_frames=1
    branch (frame_sel omission, digest_base=0) otherwise covered only
    at the driver gate (r13 ADVICE)."""
    from kafka_connect_streams_spark.queries import ORACLE
    texts = ["hello world", "", "hello world", "ünïcode ok",
             "the quick brown fox"]
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)")
    got = dict(con.sql(ORACLE["media_phash"]).fetchall())
    assert len(got) == 5
    for i, t in enumerate(texts):
        assert got[i] == phash64(md5_luma_grid(t)), i
    # single-frame output shape: no frame_idx column leaks through
    assert [d[0] for d in con.sql(
        ORACLE["media_phash"]).description] == ["doc_id", "phash"]


def test_y4m_rejects_bad_frame_marker():
    """FRAME must be followed by newline or a space-separated parameter
    list per yuv4mpeg(5) — b'FRAMES'/b'FRAMExyz' markers are malformed,
    not parameterized (r13 ADVICE)."""
    from kafka_connect_streams_spark.operators.multimodal import (
        decode_y4m)
    fr = _grid("v-marker")
    body = bytes(v for row in fr for v in row)
    hdr = b"YUV4MPEG2 W16 H16 F25:1 Cmono\n"
    with pytest.raises(ValueError):
        decode_y4m(hdr + b"FRAMES\n" + body)
    with pytest.raises(ValueError):
        decode_y4m(hdr + b"FRAMExyz Ip\n" + body)
    # the two legitimate spellings still parse
    assert decode_y4m(hdr + b"FRAME\n" + body)[2] == [fr]
    assert decode_y4m(hdr + b"FRAME Ip\n" + body)[2] == [fr]


def test_video_neardup_negative_doc_ids(spark):
    """The synthetic-id collapse is true floor division: doc −1's
    frames (fids −64..−61) must come back as doc −1, never fold into
    doc 0 (truncate-toward-zero would send fid −63 to 0 — r13 ADVICE),
    and the pair ordering invariant holds across the sign boundary."""
    from kafka_connect_streams_spark.operators.multimodal import (
        video_neardup)
    base = [int.from_bytes(hashlib.md5(f"nfp{k}".encode()).digest()[:8],
                           "big") >> 1 for k in range(4)]
    rows = [(-1, f, base[f]) for f in range(4)]
    rows += [(2, f, base[f]) for f in range(4)]  # exact dup of doc -1
    rows += [(0, 0, base[0] ^ (1 << 40) ^ (1 << 50))]  # far from all
    frames = spark.createDataFrame(
        rows, "doc_id bigint, frame_idx bigint, phash bigint")
    got = [(r.id_a, r.id_b, r.n_matched)
           for r in video_neardup(frames).collect()]
    assert got == [(-1, 2, 4)]


def test_video_scene_cuts_lag_semantics(spark):
    """Cut = frame >= threshold bits from its predecessor; each video's
    first frame has NULL ham_prev and is never a cut; videos do not
    leak into each other's windows."""
    from kafka_connect_streams_spark.operators.multimodal import (
        video_scene_cuts)
    rows = [(1, 0, 0b1111), (1, 1, 0b1110), (1, 2, 0b11110000),
            (2, 0, 0b11110000)]
    frames = spark.createDataFrame(
        rows, "doc_id bigint, frame_idx bigint, phash bigint")
    got = {(r.doc_id, r.frame_idx): (r.ham_prev, r.is_cut)
           for r in video_scene_cuts(frames, cut_threshold=4).collect()}
    assert got[(1, 0)] == (None, False)
    assert got[(1, 1)] == (1, False)
    assert got[(1, 2)] == (7, True)      # 0b1110 ^ 0b11110000: 7 bits
    assert got[(2, 0)] == (None, False)  # doc 2 sees no doc-1 frames


# ------------------------------------------------- pHash robustness eval

def _py_phash_robustness(text: str, qs=(2, 8, 32)) -> dict[int, int]:
    """Pure-Python reference for one doc: baseline pHash of the raw
    grid, then per severity quantize → REAL BMP encode→decode →
    box-downsample → re-hash → Hamming."""
    n = PHASH_GRID
    lum = md5_luma_grid(text)
    base = phash64(lum)
    grid = [lum[i * n:(i + 1) * n] for i in range(n)]
    out = {}
    for q in qs:
        quant = [[(p // q) * q for p in row] for row in grid]
        w, h, dec = decode_bmp(encode_bmp_gray(quant))
        out[q] = hamming(base, phash64(box_luma_grid(dec, w, h)))
    return out


def test_phash_robustness_operator_matches_python(spark):
    """The Arrow-batched operator (baseline from the flat grid, every
    quantized severity through the container round trip, numpy-einsum
    batch hash) is bit-identical to the pure-Python per-doc reference
    on every (doc, q) cell."""
    from kafka_connect_streams_spark.operators.multimodal import (
        phash_robustness)
    texts = ["hello world", "", "the quick brown fox", "ünïcode ok",
             "zz", "hello world"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    got = {(r.doc_id, r.q): r.hamming
           for r in phash_robustness(df).collect()}
    assert len(got) == len(texts) * 3
    for i, t in enumerate(texts):
        for q, hm in _py_phash_robustness(t).items():
            assert got[(i, q)] == hm, (i, q)
    # identical texts perturb identically at every severity
    assert all(got[(0, q)] == got[(5, q)] for q in (2, 8, 32))


def test_phash_robustness_q1_is_lossless(spark):
    """q=1 quantization is the identity, so the whole perturb→encode→
    decode→downsample→rehash chain must return Hamming 0 for every doc
    — isolating the container leg from the measurement: any nonzero
    Hamming at real severities is the quantization's doing, never the
    codec's."""
    from kafka_connect_streams_spark.operators.multimodal import (
        phash_robustness)
    df = spark.createDataFrame(
        [(0, "hello world"), (1, ""), (2, "the quick brown fox")],
        "doc_id bigint, text string")
    rows = phash_robustness(df, qs=(1,)).collect()
    assert len(rows) == 3 and all(r.hamming == 0 for r in rows)


def test_phash_robustness_oracle_pin():
    """The REGISTERED phash_robustness oracle (no container leg — pure
    quantized-luma DCT in DuckDB) reproduces the pure-Python aggregate
    report exactly on a planted corpus, severity by severity, including
    the two near-dup-threshold counts and the output column order."""
    from kafka_connect_streams_spark.queries import ORACLE
    texts = ["hello world", "", "hello world", "ünïcode ok",
             "the quick brown fox", "zz"]
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)")
    got = {r[0]: r[1:] for r in con.sql(
        ORACLE["phash_robustness"]).fetchall()}
    per_doc = [_py_phash_robustness(t) for t in texts]
    for q in (2, 8, 32):
        hs = [d[q] for d in per_doc]
        assert got[q] == (len(hs), sum(hs), max(hs),
                          sum(1 for h in hs if h <= 3),
                          sum(1 for h in hs if h <= 2)), q
    assert [d[0] for d in con.sql(
        ORACLE["phash_robustness"]).description] == [
        "q", "n_docs", "sum_hamming", "max_hamming",
        "within_fp", "within_video"]


# -------------------------------------------- audio fingerprint robustness

def _py_audiofp_robustness(text: str, qs=(4, 64, 1024)) -> dict[int, int]:
    """Pure-Python reference for one doc: baseline energy-delta
    fingerprint of the raw waveform, then per severity requantize →
    REAL WAV encode→decode → re-fingerprint → Hamming."""
    from kafka_connect_streams_spark.operators.multimodal import (
        audio_energy_fp, encode_wav_pcm16, md5_pcm_samples)
    smp = md5_pcm_samples(text)
    base = audio_energy_fp(smp)
    out = {}
    for q in qs:
        quant = [((s + 32768) // q) * q - 32768 for s in smp]
        rate, channels, dec = decode_wav(encode_wav_pcm16(quant))
        assert (rate, channels) == (8000, 1)
        out[q] = hamming(base, audio_energy_fp(dec))
    return out


def test_audiofp_robustness_operator_matches_python(spark):
    """The Arrow-batched operator is bit-identical to the pure-Python
    per-doc reference on every (doc, q) cell; identical texts perturb
    identically."""
    from kafka_connect_streams_spark.operators.multimodal import (
        audiofp_robustness)
    texts = ["hello world", "", "the quick brown fox", "ünïcode ok",
             "zz", "hello world"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    got = {(r.doc_id, r.q): r.hamming
           for r in audiofp_robustness(df).collect()}
    assert len(got) == len(texts) * 3
    for i, t in enumerate(texts):
        for q, hm in _py_audiofp_robustness(t).items():
            assert got[(i, q)] == hm, (i, q)
    assert all(got[(0, q)] == got[(5, q)] for q in (4, 64, 1024))


def test_audiofp_robustness_q1_is_lossless(spark):
    """q=1 requantization is the identity, so the perturb→WAV→decode→
    refingerprint chain must return Hamming 0 for every doc — isolating
    the container leg from the measurement."""
    from kafka_connect_streams_spark.operators.multimodal import (
        audiofp_robustness)
    df = spark.createDataFrame(
        [(0, "hello world"), (1, ""), (2, "the quick brown fox")],
        "doc_id bigint, text string")
    rows = audiofp_robustness(df, qs=(1,)).collect()
    assert len(rows) == 3 and all(r.hamming == 0 for r in rows)


def test_audiofp_robustness_oracle_pin():
    """The REGISTERED audiofp_robustness oracle (no container leg)
    reproduces the pure-Python aggregate report exactly on a planted
    corpus, severity by severity, including the threshold counts and
    column order."""
    from kafka_connect_streams_spark.queries import ORACLE
    texts = ["hello world", "", "hello world", "ünïcode ok",
             "the quick brown fox", "zz"]
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)")
    got = {r[0]: r[1:] for r in con.sql(
        ORACLE["audiofp_robustness"]).fetchall()}
    per_doc = [_py_audiofp_robustness(t) for t in texts]
    for q in (4, 64, 1024):
        hs = [d[q] for d in per_doc]
        assert got[q] == (len(hs), sum(hs), max(hs),
                          sum(1 for h in hs if h <= 3),
                          sum(1 for h in hs if h == 0)), q
    assert [d[0] for d in con.sql(
        ORACLE["audiofp_robustness"]).description] == [
        "q", "n_docs", "sum_hamming", "max_hamming",
        "within_fp", "exact_matches"]
