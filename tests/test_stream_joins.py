"""Windowed stream-stream join matrix against the reference's golden trace.

Input: the 15-record interleaved sequence with null values
(AbstractJoinIntegrationTest.java:100-116, via FIXTURES.md §3), all sharing
key 0, timestamps 1 ms apart, join window ±10 s.

Expected final matched sets (FIXTURES.md §3):
- inner: all 16 pairs {A,B,C,D}×{a,b,c,d}
- left/outer: same 16 pairs; the reference ALSO emits eager `A-null` before
  `a` arrives — our engine emits null-padded rows only for records that
  EXPIRE unmatched (documented semantic refinement, SURVEY.md §7.3 #1), and
  every lettered record here eventually matches.
- chained inner (L⋈R)⋈R: 64 triples.

Streams close their windows only when the watermark advances past them, so
the harness appends a far-future flush record and runs a second
availableNow round on the same checkpoint before asserting.
"""

from __future__ import annotations

import json

import pytest

from kafka_connect_streams_spark.streaming.joins import chained_join, windowed_join

#: (side, value, ts_offset_ms) — AbstractJoinIntegrationTest.java:100-116
TRACE = [
    ("L", None, 0), ("R", None, 1), ("L", "A", 2), ("R", "a", 3),
    ("L", "B", 4), ("R", "b", 5), ("L", None, 6), ("R", None, 7),
    ("L", "C", 8), ("R", "c", 9), ("R", None, 10), ("L", None, 11),
    ("R", None, 12), ("R", "d", 13), ("L", "D", 14),
]
BASE_MS = 1_700_000_000_000
FLUSH_MS = BASE_MS + 3_600_000  # +1h: pushes the watermark past every window


def _write_side(path, side: str, with_flush: bool):
    rows = [r for r in TRACE if r[0] == side]
    path.mkdir(parents=True, exist_ok=True)
    fname = "flush.json" if with_flush else "part-0.json"
    with open(path / fname, "w") as f:
        if with_flush:
            f.write(json.dumps(
                {"key": 999, "value": f"__flush_{side}__", "ts_ms": FLUSH_MS}) + "\n")
        else:
            for _, v, off in rows:
                f.write(json.dumps(
                    {"key": 0, "value": v, "ts_ms": BASE_MS + off}) + "\n")


def _stream(spark, path):
    raw = (spark.readStream
           .schema("key bigint, value string, ts_ms bigint")
           .json(str(path)))
    return raw.selectExpr("key", "value",
                          "timestamp_micros(ts_ms * 1000) AS ts")


def _run_join(spark, tmp_path, how: str, chained: bool = False):
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _write_side(ldir, "L", with_flush=False)
    _write_side(rdir, "R", with_flush=False)

    def start():
        join_fn = chained_join if chained else windowed_join
        joined = join_fn(_stream(spark, ldir), _stream(spark, rdir),
                         window_ms=10_000, watermark="1 second", how=how)
        return (joined.writeStream
                .format("parquet")
                .option("path", str(out))
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True)
                .start())

    q = start()
    q.awaitTermination(120)
    # advance the event-time watermark so outer-join state expires
    _write_side(ldir, "L", with_flush=True)
    _write_side(rdir, "R", with_flush=True)
    q = start()
    q.awaitTermination(120)

    rows = spark.read.parquet(str(out)).collect()
    return [r for r in rows
            if (r.l_value or "").find("__flush") < 0
            and (r.r_value or "").find("__flush") < 0]


ALL_PAIRS = {f"{l}-{r}" for l in "ABCD" for r in "abcd"}


def test_inner_join_final_set(spark, tmp_path):
    rows = _run_join(spark, tmp_path, "inner")
    assert {r.joined_value for r in rows} == ALL_PAIRS
    assert len(rows) == 16


def test_left_join_final_set(spark, tmp_path):
    rows = _run_join(spark, tmp_path, "leftOuter")
    # every lettered record matches within the window → no X-null survivors
    assert {r.joined_value for r in rows} == ALL_PAIRS


def test_outer_join_final_set(spark, tmp_path):
    rows = _run_join(spark, tmp_path, "fullOuter")
    assert {r.joined_value for r in rows} == ALL_PAIRS


def test_left_join_emits_expired_unmatched(spark, tmp_path):
    """A left record whose window expires with no match MUST surface as
    X-null — this is where our refinement and the reference agree."""
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    ldir.mkdir(); rdir.mkdir()
    with open(ldir / "part-0.json", "w") as f:
        f.write(json.dumps({"key": 1, "value": "lonely", "ts_ms": BASE_MS}) + "\n")
    with open(rdir / "part-0.json", "w") as f:
        f.write(json.dumps({"key": 2, "value": "other", "ts_ms": BASE_MS}) + "\n")

    def start():
        joined = windowed_join(_stream(spark, ldir), _stream(spark, rdir),
                               window_ms=10_000, watermark="1 second",
                               how="leftOuter")
        return (joined.writeStream.format("parquet")
                .option("path", str(out))
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True).start())

    q = start(); q.awaitTermination(120)
    with open(ldir / "flush.json", "w") as f:
        f.write(json.dumps({"key": 9, "value": "zz", "ts_ms": FLUSH_MS}) + "\n")
    with open(rdir / "flush.json", "w") as f:
        f.write(json.dumps({"key": 8, "value": "zz", "ts_ms": FLUSH_MS}) + "\n")
    q = start(); q.awaitTermination(120)

    vals = {r.joined_value for r in spark.read.parquet(str(out)).collect()}
    assert "lonely-null" in vals


def test_left_join_per_batch_emission_trace(spark, tmp_path):
    """Per-batch emission discipline for the left join — the closest Spark
    analogue of the reference's per-record asserts
    (AbstractJoinIntegrationTest.java:183-223).

    The reference emits an EAGER ``A-null`` that may later be superseded by
    ``A-a``; Spark's update-mode contract is stricter: a null-padded row is
    emitted (a) only after the watermark proves no match can arrive, and
    (b) exactly once. This trace test pins both halves of that refinement
    (SURVEY.md §7.3 #1): no transient retraction ever reaches the sink.
    """
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    ckpt = tmp_path / "ckpt"
    ldir.mkdir(), rdir.mkdir()
    with open(ldir / "part-0.json", "w") as f:
        f.write(json.dumps({"key": 1, "value": "lonely", "ts_ms": BASE_MS}) + "\n")
        f.write(json.dumps({"key": 3, "value": "A", "ts_ms": BASE_MS}) + "\n")
    with open(rdir / "part-0.json", "w") as f:
        f.write(json.dumps({"key": 3, "value": "a", "ts_ms": BASE_MS + 1}) + "\n")

    trace: list[tuple[int, int, list[str]]] = []  # (run, batch_id, values)

    def run(run_no: int):
        joined = windowed_join(_stream(spark, ldir), _stream(spark, rdir),
                               window_ms=10_000, watermark="1 second",
                               how="leftOuter")

        def sink(batch_df, batch_id):
            vals = [r.joined_value for r in batch_df.collect()]
            trace.append((run_no, batch_id, sorted(vals)))

        q = (joined.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run(1)
    run1_vals = [v for rn, _, vs in trace if rn == 1 for v in vs]
    # the matched pair emits as soon as both sides arrive...
    assert "A-a" in run1_vals
    # ...but no eager null-padding: the unmatched row is withheld until the
    # watermark proves no partner can arrive
    assert "lonely-null" not in run1_vals

    # advance event time far past the join window, then drain again
    with open(ldir / "flush.json", "w") as f:
        f.write(json.dumps({"key": 9, "value": "zz", "ts_ms": FLUSH_MS}) + "\n")
    with open(rdir / "flush.json", "w") as f:
        f.write(json.dumps({"key": 8, "value": "zz", "ts_ms": FLUSH_MS}) + "\n")
    run(2)

    all_vals = [v for _, _, vs in trace for v in vs]
    assert all_vals.count("lonely-null") == 1, (
        f"null-padded row must emit exactly once, after expiry: {trace}")
    assert all_vals.count("A-a") == 1, (
        f"matched row must never be re-emitted on expiry: {trace}")


def test_outer_join_per_batch_emission_trace(spark, tmp_path):
    """fullOuter twin of the left-join trace: the unmatched RIGHT row's
    null-padded form (null-orphan) must also appear only after watermark
    expiry and exactly once."""
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    ckpt = tmp_path / "ckpt"
    ldir.mkdir(), rdir.mkdir()
    with open(ldir / "part-0.json", "w") as f:
        f.write(json.dumps({"key": 3, "value": "A", "ts_ms": BASE_MS}) + "\n")
    with open(rdir / "part-0.json", "w") as f:
        f.write(json.dumps({"key": 3, "value": "a", "ts_ms": BASE_MS + 1}) + "\n")
        f.write(json.dumps({"key": 4, "value": "orphan", "ts_ms": BASE_MS}) + "\n")

    trace: list[list[str]] = []

    def run():
        joined = windowed_join(_stream(spark, ldir), _stream(spark, rdir),
                               window_ms=10_000, watermark="1 second",
                               how="fullOuter")

        def sink(batch_df, _bid):
            trace.append(sorted(r.joined_value for r in batch_df.collect()))

        q = (joined.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    flat1 = [v for vs in trace for v in vs]
    assert "A-a" in flat1 and "null-orphan" not in flat1
    with open(ldir / "flush.json", "w") as f:
        f.write(json.dumps({"key": 9, "value": "zz", "ts_ms": FLUSH_MS}) + "\n")
    with open(rdir / "flush.json", "w") as f:
        f.write(json.dumps({"key": 8, "value": "zz", "ts_ms": FLUSH_MS}) + "\n")
    run()
    flat = [v for vs in trace for v in vs]
    assert flat.count("null-orphan") == 1, trace
    assert flat.count("A-a") == 1, trace


@pytest.mark.slow
def test_chained_join_triples(spark, tmp_path):
    rows = _run_join(spark, tmp_path, "inner", chained=True)
    triples = {r.joined_value for r in rows}
    assert triples == {f"{l}-{r1}-{r2}" for l in "ABCD"
                       for r1 in "abcd" for r2 in "abcd"}
    assert len(rows) == 64


def test_stream_table_join_enriches(spark, tmp_path):
    """Stream-static join: each micro-batch hash-joins against the latest
    dimension snapshot (KSQL STREAM ⋈ TABLE capability, SURVEY.md §2.3)."""
    from kafka_connect_streams_spark.streaming.joins import stream_table_join

    sdir = tmp_path / "stream"
    sdir.mkdir()
    with open(sdir / "part-0.json", "w") as f:
        for i, key in enumerate([10, 20, 10, 30]):
            f.write(json.dumps({"key": key, "value": f"e{i}",
                                "ts_ms": BASE_MS + i}) + "\n")
    dim = spark.createDataFrame(
        [(10, "ten"), (20, "twenty")], "key bigint, name string")

    enriched = stream_table_join(_stream(spark, sdir), dim, key="key")
    q = (enriched.writeStream.format("memory")
         .queryName("stream_table_join_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql(
        "SELECT value, name FROM stream_table_join_out").collect()
    got = {(r.value, r.name) for r in rows}
    assert got == {("e0", "ten"), ("e1", "twenty"), ("e2", "ten")}
