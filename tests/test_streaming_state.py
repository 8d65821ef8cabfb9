"""Custom stateful operators + streaming dedup + update-mode changelog, and
the full DatabaseWordCount end-to-end pipeline (entry point 1 parity).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_connect_streams_spark.sources.sinks import parquet_upsert_writer
from kafka_connect_streams_spark.sources.table_poll import (TablePollSource,
                                                            parquet_dir_reader)
from kafka_connect_streams_spark.streaming.state import (running_count,
                                                         streaming_dedup)
from kafka_connect_streams_spark.operators.aggregations import word_count

CORPUS = [
    "To be, or not to be,--that is the question:--",
    "Whether 'tis nobler in the mind to suffer",
    "The slings and arrows of outrageous fortune",
    "Or to take arms against a sea of troubles,",
]
GOLDEN = {"to": 4, "be": 2, "or": 2, "not": 1, "that": 1, "is": 1,
          "the": 3, "question": 1, "whether": 1}


def test_running_count_stateful_operator(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for k in ["x", "y", "x", "x"]:
            f.write(json.dumps({"key": k}) + "\n")
    stream = spark.readStream.schema("key string").json(str(src))
    q = (running_count(stream).writeStream
         .format("memory").queryName("rc").outputMode("update").start())
    try:
        q.processAllAvailable()
        got = {r.key: r.cnt for r in spark.sql("SELECT * FROM rc").collect()}
        assert got == {"x": 3, "y": 1}
        # second batch updates only the touched key (changelog emission)
        with open(src / "b.json", "w") as f:
            f.write(json.dumps({"key": "y"}) + "\n")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM rc").collect()
    finally:
        q.stop()
    # update-mode memory sink appends changed rows; latest y row shows 2
    latest = {}
    for r in rows:
        latest[r.key] = r.cnt
    assert latest["y"] == 2 and latest["x"] == 3


def test_streaming_dedup_drops_in_window_duplicates(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000_000
    with open(src / "a.json", "w") as f:
        for i, (k, off) in enumerate([("a", 0), ("a", 1000), ("b", 2000)]):
            f.write(json.dumps({"k": k, "ts_ms": base + off}) + "\n")
    stream = (spark.readStream.schema("k string, ts_ms long").json(str(src))
              .selectExpr("k", "timestamp_micros(ts_ms*1000) AS ts"))
    out = streaming_dedup(stream, ["k"], watermark="1 minute")
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM dd").collect()
    finally:
        q.stop()
    assert sorted(r.k for r in rows) == ["a", "b"]


def test_database_wordcount_end_to_end(spark, tmp_path):
    """Entry point 1 parity (DatabaseWordCount.countWords, examples/
    DatabaseWordCount.java:53-140): poll an external table incrementally →
    flatMap/groupBy/count → upsert latest counts into an output table.

    Golden counts from DatabaseWordCountTest.java:118-126.
    """
    table, outdir = tmp_path / "wc_input", tmp_path / "wc_output"
    ckpt = str(tmp_path / "ckpt")

    # the JDBC input table (id, lines) — DatabaseWordCountTest.java:58-60
    spark.createDataFrame(list(enumerate(CORPUS[:2])), "id bigint, lines string") \
        .write.mode("overwrite").parquet(str(table))

    src = TablePollSource(parquet_dir_reader(str(table)),
                          mode="incrementing", inc_col="id", checkpoint=ckpt)
    sink = parquet_upsert_writer(str(outdir), ["word"])

    state = {"rows": []}

    def deliver(batch, epoch):
        new = batch.collect()
        if not new:
            return
        state["rows"].extend(new)
        everything = spark.createDataFrame(state["rows"], batch.schema)
        counts = word_count(everything, "lines")
        sink(counts, epoch)

    # batch 1: first two lines
    b = src.poll(spark); deliver(b, 0); src.commit(b)
    # "new rows appear in the table" → incremental poll picks up only them
    spark.createDataFrame(list(enumerate(CORPUS)), "id bigint, lines string") \
        .write.mode("overwrite").parquet(str(table))
    b = src.poll(spark)
    assert sorted(r.id for r in b.collect()) == [2, 3]
    deliver(b, 1); src.commit(b)

    got = {r.word: r.cnt for r in spark.read.parquet(str(outdir)).collect()}
    for w, n in GOLDEN.items():
        assert got.get(w) == n, f"{w}: {got.get(w)} != {n}"


class TestIncrementalDedupStream:
    """Streaming ingestion dedup against all history (epoch-partitioned
    fingerprint index), including the cross-run and replay-once legs."""

    def _write_docs(self, path, rows):
        import json as _json
        with open(path, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def test_history_dedup_across_two_runs_and_replay(self, spark, tmp_path):
        from kafka_connect_streams_spark.streaming.state import (
            incremental_dedup_processor, start_incremental_dedup)
        src = tmp_path / "in"; src.mkdir()
        index = str(tmp_path / "index"); out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def run():
            stream = spark.readStream.schema("doc_id long, text string") \
                .json(str(src))
            q = start_incremental_dedup(stream, "text", "doc_id",
                                        index, out, ckpt)
            q.awaitTermination(120)

        # run 1: two docs + an in-batch near-copy (same token set)
        self._write_docs(src / "a.json", [
            (1, "alpha beta gamma"), (2, "delta epsilon"),
            (3, "gamma beta alpha")])          # dup of 1 (canonical tokens)
        run()
        kept = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert kept == {1, 2}

        # run 2 (new query, same checkpoint): history dup + a new doc
        self._write_docs(src / "b.json", [
            (4, "beta gamma alpha"),           # dup of doc 1 across runs
            (5, "zeta eta")])
        run()
        kept = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert kept == {1, 2, 5}
        idx = spark.read.parquet(index)
        assert idx.count() == idx.select("fingerprint").distinct().count() == 3

        # replay: re-execute the LAST epoch with the same epoch id — the
        # driver's foreachBatch contract after a crash-before-commit. The
        # index/output must not gain duplicates, and the epoch's survivors
        # must be re-published (not self-vetoed by its own index write).
        last_epoch = max(r.epoch for r in idx.collect())
        batch2 = spark.createDataFrame(
            [(4, "beta gamma alpha"), (5, "zeta eta")],
            "doc_id long, text string")
        proc = incremental_dedup_processor("text", "doc_id", index, out)
        proc(batch2, last_epoch)
        kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert kept == [1, 2, 5]
        idx = spark.read.parquet(index)
        assert idx.count() == 3

    def test_index_compaction_preserves_dedup_decisions(self, spark,
                                                        tmp_path):
        """compact_dedup_index folds old epoch partitions into epoch=-1:
        same fingerprint set, fewer partitions, and a subsequent batch
        still dedupes against the compacted history identically."""
        from kafka_connect_streams_spark.streaming.state import (
            compact_dedup_index, incremental_dedup_processor)
        index = str(tmp_path / "index"); out = str(tmp_path / "out")
        proc = incremental_dedup_processor("text", "doc_id", index, out)
        mk = lambda rows: spark.createDataFrame(rows,
                                                "doc_id long, text string")
        proc(mk([(1, "alpha beta")]), 0)
        proc(mk([(2, "gamma delta")]), 1)
        proc(mk([(3, "epsilon")]), 2)
        before = {r.fingerprint for r in
                  spark.read.parquet(index).collect()}
        n = compact_dedup_index(spark, index, upto_epoch=3)
        assert n == 3
        idx = spark.read.parquet(index)
        assert {r.fingerprint for r in idx.collect()} == before
        assert {r.epoch for r in idx.collect()} == {-1}
        # history dedup still works against the compacted base
        proc(mk([(4, "beta alpha"),      # dup of doc 1
                 (5, "zeta")]), 3)
        kept = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert kept == {1, 2, 3, 5}

    def test_compaction_refuses_uncommitted_epochs(self, spark, tmp_path):
        """r12 ADVICE: the committed-epoch CONTRACT is enforced in code
        when the caller passes the stream's checkpoint — folding an
        epoch past the commits log raises instead of silently setting
        up replay data loss; folding at/below it proceeds. Both
        compactors go through the same validator."""
        import pytest

        from kafka_connect_streams_spark.streaming.state import (
            compact_dedup_index, compact_neardup_index,
            incremental_dedup_processor)
        index = str(tmp_path / "index")
        out = str(tmp_path / "out")
        ckpt = tmp_path / "ckpt" / "commits"
        ckpt.mkdir(parents=True)
        (ckpt / "0").write_text("v1")
        (ckpt / "1").write_text("v1")   # last committed epoch = 1
        proc = incremental_dedup_processor("text", "doc_id", index, out)
        mk = lambda rows: spark.createDataFrame(
            rows, "doc_id long, text string")
        proc(mk([(1, "alpha")]), 0)
        proc(mk([(2, "beta")]), 1)
        proc(mk([(3, "gamma")]), 2)     # written but NOT committed
        with pytest.raises(ValueError, match="committed"):
            compact_dedup_index(spark, index, upto_epoch=3,
                                checkpoint_dir=str(tmp_path / "ckpt"))
        with pytest.raises(ValueError, match="committed"):
            compact_neardup_index(spark, index, upto_epoch=3,
                                  checkpoint_dir=str(tmp_path / "ckpt"))
        # folding only committed epochs is allowed and correct
        n = compact_dedup_index(spark, index, upto_epoch=2,
                                checkpoint_dir=str(tmp_path / "ckpt"))
        assert n == 2
        idx = spark.read.parquet(index)
        assert {r.epoch for r in idx.collect()} == {-1, 2}


def test_sessionize_emits_completed_sessions(spark, tmp_path):
    """Custom stateful sessionization: sessions close gap_s after their
    last event (event-time timeout driven by the watermark) or when a
    later event arrives past the gap; each completed session is emitted
    exactly once with its span and count."""
    from kafka_connect_streams_spark.streaming.state import sessionize

    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000_000

    def write(name, rows):
        with open(src / name, "w") as f:
            for k, off_s in rows:
                f.write(json.dumps({"key": k,
                                    "ts_ms": base + off_s * 1000}) + "\n")

    write("a.json", [("a", 0), ("a", 5), ("b", 3)])
    stream = (spark.readStream.schema("key string, ts_ms long")
              .json(str(src))
              .selectExpr("key", "timestamp_micros(ts_ms*1000) AS ts"))
    out = sessionize(stream, gap_s=30, watermark="5 seconds")
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        # a second burst for "a" far past the gap closes session 1 by gap;
        # the big timestamp also drags the watermark forward
        write("b.json", [("a", 200)])
        q.processAllAvailable()
        # one more batch so the event-time timeout (watermark > last+gap)
        # can flush b's session and a's second session
        write("c.json", [("c", 400)])
        q.processAllAvailable()
        write("d.json", [("c", 600)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess").collect()
    finally:
        q.stop()
    got = {(r.key, r.session_start_ms - base, r.session_end_ms - base,
            r.n_events) for r in rows}
    assert ("a", 0, 5_000, 2) in got          # closed by the gap arrival
    assert ("b", 3_000, 3_000, 1) in got      # closed by event-time timeout
    assert ("a", 200_000, 200_000, 1) in got  # closed by timeout later


def test_sessionize_state_survives_restart(spark, tmp_path):
    """The sessionizer's per-key state must survive a query restart from
    the same checkpoint: an open session extended AFTER the restart flushes
    as ONE session spanning both runs — the KTable-store recovery contract
    (reference state stores restore from the changelog; here the state
    store restores from the checkpoint). Output goes to a parquet sink —
    the memory sink does not support checkpoint recovery."""
    from kafka_connect_streams_spark.streaming.state import sessionize

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    base = 1_700_000_000_000

    def write(name, rows):
        with open(src / name, "w") as f:
            for k, off_s in rows:
                f.write(json.dumps({"key": k,
                                    "ts_ms": base + off_s * 1000}) + "\n")

    def start():
        stream = (spark.readStream.schema("key string, ts_ms long")
                  .json(str(src))
                  .selectExpr("key", "timestamp_micros(ts_ms*1000) AS ts"))
        return (sessionize(stream, gap_s=30, watermark="5 seconds")
                .writeStream.format("parquet")
                .option("path", str(out))
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "ck")).start())

    write("a.json", [("a", 0)])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart from the same checkpoint; extend the still-open session,
    # then push the watermark past its gap so it flushes
    write("b.json", [("a", 10)])
    write("c.json", [("z", 500)])
    q = start()
    try:
        q.processAllAvailable()
        write("d.json", [("z", 900)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(str(out)).collect()
    got = {(r.key, r.session_start_ms - base, r.session_end_ms - base,
            r.n_events) for r in rows}
    # ONE session for "a" spanning both runs: state restored, then merged
    assert ("a", 0, 10_000, 2) in got, got


def test_sessionize_splits_intra_batch_gaps(spark, tmp_path):
    """A file-source replay delivers a key's WHOLE history in one
    micro-batch; events separated by more than gap_s inside that batch
    must still split into distinct sessions (one mega-session per key is
    wrong — session_window semantics don't depend on batch boundaries)."""
    from kafka_connect_streams_spark.streaming.state import sessionize

    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000_000

    def write(name, rows):
        with open(src / name, "w") as f:
            for k, off_s in rows:
                f.write(json.dumps({"key": k,
                                    "ts_ms": base + off_s * 1000}) + "\n")

    # one file = one batch: three gap-separated bursts for "a" (written
    # out of order — the sessionizer must sort before splitting), plus a
    # singleton for "b"
    write("a.json", [("a", 100), ("a", 105), ("a", 0), ("a", 5),
                     ("a", 300), ("b", 7)])
    stream = (spark.readStream.schema("key string, ts_ms long")
              .json(str(src))
              .selectExpr("key", "timestamp_micros(ts_ms*1000) AS ts"))
    out = sessionize(stream, gap_s=30, watermark="5 seconds")
    q = (out.writeStream.format("memory").queryName("sess_intra")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        # push the watermark past 300s + gap so the trailing sessions flush
        write("b.json", [("a", 500)])
        q.processAllAvailable()
        write("c.json", [("a", 900)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_intra").collect()
    finally:
        q.stop()
    got = {(r.key, r.session_start_ms - base, r.session_end_ms - base,
            r.n_events) for r in rows}
    assert ("a", 0, 5_000, 2) in got, got        # split inside batch 1
    assert ("a", 100_000, 105_000, 2) in got, got
    assert ("a", 300_000, 300_000, 1) in got, got
    assert ("b", 7_000, 7_000, 1) in got, got


def test_sessionize_early_segment_does_not_swallow_open_session(spark,
                                                                tmp_path):
    """Out-of-order data within the watermark may arrive BEFORE the stored
    open session's start; if it's separated from the stored session by more
    than the gap it must become its own session, not merge — and it is
    HELD in state until the watermark passes its close (hold-until-
    watermark, the built-in session_window append contract), not flushed
    at the batch boundary."""
    from kafka_connect_streams_spark.streaming.state import sessionize

    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000_000

    def write(name, rows):
        with open(src / name, "w") as f:
            for k, off_s in rows:
                f.write(json.dumps({"key": k,
                                    "ts_ms": base + off_s * 1000}) + "\n")

    # batch 1 opens a session at 100s
    write("a.json", [("a", 100)])
    stream = (spark.readStream.schema("key string, ts_ms long")
              .json(str(src))
              .selectExpr("key", "timestamp_micros(ts_ms*1000) AS ts"))
    # huge watermark delay so the 96s event in batch 2 is NOT dropped
    out = sessionize(stream, gap_s=2, watermark="1000 seconds")
    q = (out.writeStream.format("memory").queryName("sess_early")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        # batch 2: an event BEFORE the stored session, gap-separated (2s
        # gap; 96 -> 100 is 4s apart) plus an extension at 101s
        write("b.json", [("a", 96), ("a", 101)])
        q.processAllAvailable()
        # nothing may flush yet: the watermark (≈ 101s - 1000s) has not
        # passed any segment's close — eager batch-boundary flush would
        # wrongly emit the 96s singleton here
        early = spark.sql("SELECT * FROM sess_early").collect()
        assert early == [], early
        # drag the watermark past both segments' closes (needs events at
        # ≥ 96+2+1000s); two more batches so the wm advance is visible to
        # the timeout path
        write("c.json", [("a", 2000)])
        q.processAllAvailable()
        write("d.json", [("a", 4000)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_early").collect()
    finally:
        q.stop()
    got = {(r.key, r.session_start_ms - base, r.session_end_ms - base,
            r.n_events) for r in rows}
    # the early singleton flushed alone; the 100..101 session separately
    assert ("a", 96_000, 96_000, 1) in got, got
    assert ("a", 100_000, 101_000, 2) in got, got
    assert not any(s == 96_000 and e > 96_000 for _, s, e, _ in got), got


def test_streaming_heavy_hitters_bounds_and_superset(spark, tmp_path):
    """MG candidates over two micro-batches: every true heavy hitter is
    present, the per-word MG bounds bracket the exact count, and shard
    state stays ≤ k entries regardless of vocabulary size."""
    from collections import Counter

    from kafka_connect_streams_spark.streaming.state import (
        streaming_heavy_hitters)

    src = tmp_path / "in"
    src.mkdir()
    # skewed vocabulary: 'hot' dominates, long tail of singletons
    batch_a = ["hot hot hot warm tail%d" % i for i in range(20)]
    batch_b = ["hot warm warm tail%d" % (100 + i) for i in range(20)]
    with open(src / "a.json", "w") as f:
        for t in batch_a:
            f.write(json.dumps({"text": t}) + "\n")
    stream = spark.readStream.schema("text string").json(str(src))
    k = 5
    out = streaming_heavy_hitters(stream, "text", k=k, shards=4)
    q = (out.writeStream.format("memory").queryName("shh")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        with open(src / "b.json", "w") as f:
            for t in batch_b:
                f.write(json.dumps({"text": t}) + "\n")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM shh").collect()
    finally:
        q.stop()
    exact = Counter(w for t in batch_a + batch_b for w in t.split())
    # latest emission per (shard, word)
    latest = {}
    for r in rows:
        latest[(r.shard, r.word)] = r
    by_word = {}
    for (_, w), r in latest.items():
        by_word[w] = r
    n_total = sum(exact.values())
    # true heavy hitters (> n/(k+1) of even the TOTAL stream) survive
    for w, c in exact.items():
        if c > n_total / (k + 1):
            assert w in by_word, f"true heavy hitter {w} evicted"
    for w, r in by_word.items():
        assert r.cnt_lb <= exact[w] <= r.cnt_ub, (w, r, exact[w])
        # MG decrement bound: ub - lb = dec ≤ shard_n/(k+1)
        assert r.cnt_ub - r.cnt_lb <= r.shard_n / (k + 1)
    # state boundedness: ≤ k candidates per shard in the final emission
    from collections import defaultdict
    per_shard = defaultdict(int)
    for (s, _w) in latest:
        per_shard[s] += 1
    assert per_shard and all(v <= k for v in per_shard.values())


def test_streaming_distinct_kmv_estimates_and_bounded_state(spark,
                                                            tmp_path):
    """Shard KMV sketches over two micro-batches: merging the shard
    sketches (union, keep k smallest — the kmv_report merge) estimates
    the global distinct count within the KMV bound, with state ≤
    shards × k regardless of the distinct count."""
    import hashlib

    from kafka_connect_streams_spark.streaming.state import (
        streaming_distinct_kmv)

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(1500):
            f.write(json.dumps({"e": i}) + "\n")
    stream = spark.readStream.schema("e long").json(str(src))
    k, shards = 64, 4
    out = streaming_distinct_kmv(stream, "e", k=k, shards=shards)
    q = (out.writeStream.format("memory").queryName("skmv")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        with open(src / "b.json", "w") as f:
            for i in range(1000, 2500):  # 500 repeats + 1000 fresh
                f.write(json.dumps({"e": i}) + "\n")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM skmv").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        latest[r.shard] = r
    assert all(len(r.kmins) <= k for r in latest.values())
    merged = sorted(set().union(*[r.kmins for r in latest.values()]))[:k]
    M = 1 << 48
    est = (len(merged) if len(merged) < k
           else (k - 1) * M // merged[-1])
    exact = 2500
    assert abs(est - exact) <= exact * 4 / (k - 1) ** 0.5, (est, exact)
    # hash parity with the batch sketch path: same md5-48 elements
    h0 = int(hashlib.md5(b"0").hexdigest()[:12], 16)
    assert any(h0 in r.kmins for r in latest.values()) or h0 > merged[-1]


def test_streaming_heavy_hitters_state_survives_restart(spark, tmp_path):
    """The MG shard summaries must survive a query restart from the same
    checkpoint: counts accumulated before the restart keep counting after
    it (the KTable-store recovery contract — state restores from the
    checkpoint, not from replaying the whole stream)."""
    from kafka_connect_streams_spark.streaming.state import (
        streaming_heavy_hitters)

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"

    def start():
        stream = spark.readStream.schema("text string").json(str(src))
        return (streaming_heavy_hitters(stream, "text", k=5, shards=2,
                                        output_mode="append")
                .writeStream.format("parquet")
                .option("path", str(out))
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .start())

    with open(src / "a.json", "w") as f:
        for _ in range(10):
            f.write(json.dumps({"text": "hot warm"}) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(src / "b.json", "w") as f:
        for _ in range(7):
            f.write(json.dumps({"text": "hot"}) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(str(out)).collect()
    latest = {}
    for r in rows:  # keep the highest count seen per word (last emission)
        if r.word not in latest or r.cnt_lb > latest[r.word]:
            latest[r.word] = r.cnt_lb
    # 10 pre-restart + 7 post-restart: only correct if state was restored
    assert latest.get("hot") == 17, latest
    assert latest.get("warm") == 10, latest


def test_streaming_candidates_cover_batch_heavy_hitters(spark, tmp_path):
    """Cross-surface invariant: on the same corpus, the streaming MG
    shard candidates must be a superset of the batch-exact heavy
    hitters (the batch pass is the periodic verifier a production
    pipeline runs over the stream's candidate set)."""
    from kafka_connect_streams_spark.operators.frequency import (
        heavy_hitters_exact)
    from kafka_connect_streams_spark.streaming.state import (
        streaming_heavy_hitters)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    k = 40
    batch_hh = {r.word for r in
                heavy_hitters_exact(docs, "text", k).collect()}
    assert batch_hh  # non-trivial corpus

    src = tmp_path / "in"
    src.mkdir()
    docs.coalesce(1).write.json(str(src / "a"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .json(str(src / "a")))
    out = streaming_heavy_hitters(stream, "text", k=k, shards=4)
    q = (out.writeStream.format("memory").queryName("xhh")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        cands = {r.word for r in spark.sql("SELECT word FROM xhh").collect()}
    finally:
        q.stop()
    missing = batch_hh - cands
    assert not missing, missing


def test_streaming_cms_cells_match_batch_sketch(spark, tmp_path):
    """The stream-built CMS must be cell-identical to the batch sketch
    over the same corpus — bounded keys (d×w) make the sketch a native
    streaming aggregation with no custom state."""
    from kafka_connect_streams_spark.operators.frequency import (
        count_min_sketch)
    from kafka_connect_streams_spark.streaming.state import streaming_cms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    batch = {(r.row, r.bucket): r.counter
             for r in count_min_sketch(docs, "text").collect()}

    src = tmp_path / "in"
    src.mkdir()
    docs.coalesce(2).write.json(str(src / "a"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .json(str(src / "a")))
    q = (streaming_cms(stream, "text")
         .writeStream.format("memory").queryName("scms")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(r.row, r.bucket): r.counter for r in
               spark.sql("SELECT * FROM scms").collect()}
    finally:
        q.stop()
    assert got == batch
    assert len(got) <= 4 * 512  # bounded key space, vocabulary-free


class TestIncrementalNeardupStream:
    """Streaming ingestion NEAR-dup against all history (epoch-partitioned
    band + signature index): history near-dups dropped, band-collision
    false positives verified away, replay-once convergence."""

    def _write_docs(self, path, rows):
        import json as _json
        with open(path, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def test_neardup_across_runs_and_replay(self, spark, tmp_path):
        from kafka_connect_streams_spark.streaming.state import (
            incremental_neardup_processor, start_incremental_neardup)

        base = ("the quick brown fox jumps over the lazy dog again and "
                "again until the very end of the line")
        # suffix-append variant: shares every original shingle, so its
        # signature provably band-collides (est_jaccard 0.938 under the
        # fixed md5 hash family — deterministic, no RNG)
        near = base + " extra tail words"
        other = ("completely different words entirely unrelated content "
                 "nothing shared with anything else at all here")
        src = tmp_path / "in"
        src.mkdir()
        index, out = str(tmp_path / "idx"), str(tmp_path / "out")
        ckpt = str(tmp_path / "ck")

        def run():
            stream = (spark.readStream
                      .schema("doc_id long, text string").json(str(src)))
            q = start_incremental_neardup(
                stream, "text", "doc_id", index, out, ckpt)
            q.awaitTermination(120)

        # run 1: two distinct docs survive
        self._write_docs(src / "a.json", [(1, base), (2, other)])
        run()
        got1 = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert got1 == {1, 2}

        # run 2 (same checkpoint → only the new file, next epoch): a
        # near-dup of doc 1 drops against HISTORY; an in-batch near pair
        # keeps only the earlier id
        fresh = ("some brand new sentence with plenty of novel words "
                 "never seen before in any earlier document body")
        fresh_near = fresh + " extra tail words"
        self._write_docs(src / "b.json",
                         [(3, near), (4, fresh), (5, fresh_near)])
        run()
        got2 = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert 3 not in got2, "history near-dup must be dropped"
        assert 4 in got2 and 5 not in got2, "in-batch pair keeps min id"
        assert got2 == {1, 2, 4}

        # replay the LAST epoch with the same content and epoch id (the
        # foreachBatch crash-before-commit contract): output and index
        # must converge, not gain duplicates or self-veto survivors
        last_epoch = max(r.epoch for r in
                         spark.read.parquet(out).select("epoch").collect())
        replay = spark.createDataFrame(
            [(3, near), (4, fresh), (5, fresh_near)],
            "doc_id long, text string")
        proc = incremental_neardup_processor(
            "text", "doc_id", index, out)
        proc(replay, last_epoch)
        got3 = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert got3 == got2, "replayed epoch must converge, not duplicate"
        sigs = spark.read.parquet(f"{index}/sigs")
        assert sigs.count() == sigs.select("doc_id").distinct().count() == 3

    def test_neardup_chain_greedy_first_wins(self, spark, tmp_path):
        """Transitive chain A~B~C (A<B<C, A≁C) in ONE batch: greedy
        first-wins in id order keeps A and C — B drops against A, and C's
        only verified partner (B) did not survive, so C survives, exactly
        as if the docs had arrived one per micro-batch (ADVICE r6: the
        old pairwise rule dropped every id_b, so C was lost)."""
        from kafka_connect_streams_spark.streaming.state import (
            incremental_neardup_processor)
        A = ("the quick brown fox jumps over the lazy dog again and "
             "again until the very end of the line")
        B = A + " extra tail words"
        # shares B's suffix region only: est(A,B)=0.938, est(B,C)=0.625,
        # no verified (A,C) pair — deterministic under the md5 family
        C = ("jumps over the lazy dog again and again until the very "
             "end of the line extra tail words and some novel padding")
        index = str(tmp_path / "idx"); out = str(tmp_path / "out")
        proc = incremental_neardup_processor("text", "doc_id", index, out)
        proc(spark.createDataFrame([(1, A), (2, B), (3, C)],
                                   "doc_id long, text string"), 0)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1, 3}, kept
        # the index holds exactly the survivors
        sigs = spark.read.parquet(f"{index}/sigs")
        assert {r.doc_id for r in sigs.select("doc_id").collect()} == {1, 3}

    def test_neardup_history_dropped_doc_does_not_drop_partner(
            self, spark, tmp_path):
        """A doc dropped against HISTORY must not drop its in-batch
        near-partner: sequential ingest never adds a history-dup to the
        index, so a later doc similar only to it survives."""
        from kafka_connect_streams_spark.streaming.state import (
            incremental_neardup_processor)
        base = ("the quick brown fox jumps over the lazy dog again and "
                "again until the very end of the line")
        near = base + " extra tail words"          # ~ base (0.938)
        # ~ near (0.625) but not ~ base: survives once near is dropped
        chain = ("jumps over the lazy dog again and again until the very "
                 "end of the line extra tail words and some novel padding")
        index = str(tmp_path / "idx"); out = str(tmp_path / "out")
        proc = incremental_neardup_processor("text", "doc_id", index, out)
        proc(spark.createDataFrame([(1, base)],
                                   "doc_id long, text string"), 0)
        proc(spark.createDataFrame([(2, near), (3, chain)],
                                   "doc_id long, text string"), 1)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1, 3}, kept

    def test_neardup_index_compaction(self, spark, tmp_path):
        """compact_neardup_index folds old epoch partitions of BOTH index
        tables into epoch=-1: same rows, fewer partitions, and a later
        batch still near-dedupes against the compacted history; a replay
        of the post-compaction epoch converges."""
        from kafka_connect_streams_spark.streaming.state import (
            compact_neardup_index, incremental_neardup_processor)
        base = ("the quick brown fox jumps over the lazy dog again and "
                "again until the very end of the line")
        other = ("completely different words entirely unrelated content "
                 "nothing shared with anything else at all here")
        near = base + " extra tail words"
        index = str(tmp_path / "idx"); out = str(tmp_path / "out")
        proc = incremental_neardup_processor("text", "doc_id", index, out)
        mk = lambda rows: spark.createDataFrame(rows,
                                                "doc_id long, text string")
        proc(mk([(1, base)]), 0)
        proc(mk([(2, other)]), 1)
        bands_before = {(r.band, r.band_key, r.doc_id) for r in
                        spark.read.parquet(f"{index}/bands")
                        .select("band", "band_key", "doc_id").collect()}
        n = compact_neardup_index(spark, index, upto_epoch=2)
        assert n == 2
        for sub in ("bands", "sigs"):
            t = spark.read.parquet(f"{index}/{sub}")
            assert {r.epoch for r in t.select("epoch").collect()} == {-1}
        bands_after = {(r.band, r.band_key, r.doc_id) for r in
                       spark.read.parquet(f"{index}/bands")
                       .select("band", "band_key", "doc_id").collect()}
        assert bands_after == bands_before, "reads must be unchanged"
        # history near-dedup still works against the compacted base
        proc(mk([(3, near), (4, "zeta eta theta iota kappa")]), 2)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1, 2, 4}, kept
        # replaying the post-compaction epoch converges (no self-veto)
        proc(mk([(3, near), (4, "zeta eta theta iota kappa")]), 2)
        kept2 = {r.doc_id for r in
                 spark.read.parquet(out).select("doc_id").collect()}
        assert kept2 == kept
        sigs = spark.read.parquet(f"{index}/sigs")
        assert sigs.count() == sigs.select("doc_id").distinct().count() == 3


class TestIncrementalFingerprintNeardup:
    """The media twin of TestIncrementalNeardup (VERDICT r13 Next #5):
    a media stream near-dedupes against ALL history through the
    epoch-partitioned fingerprint index, same replay-once contract."""

    @staticmethod
    def _bmp(seed: str) -> bytearray:
        """Deterministic BMP payload: md5-derived luma grid (the
        test_media_decode _grid recipe), real container encode."""
        import hashlib

        from kafka_connect_streams_spark.operators.multimodal import (
            PHASH_GRID, encode_bmp_gray)
        n = PHASH_GRID
        grid = []
        for r in range(n):
            d = b""
            while len(d) < n:
                d += hashlib.md5(f"{seed}:{r}:{len(d)}".encode()).digest()
            grid.append(list(d[:n]))
        return bytearray(encode_bmp_gray(grid))

    def test_media_stream_dedupes_across_runs_and_replay(
            self, spark, tmp_path):
        """End-to-end media path: BMP payloads stream in, decode +
        pHash as a stream-transparent projection (phash_features), the
        fingerprint gate drops history dups and in-batch later ids;
        restart reuses the checkpoint; a replayed epoch converges."""
        from kafka_connect_streams_spark.operators.multimodal import (
            phash_features)
        from kafka_connect_streams_spark.streaming.state import (
            incremental_fingerprint_neardup_processor,
            start_incremental_fingerprint_neardup)
        src = tmp_path / "in"
        src.mkdir()
        index, out = str(tmp_path / "idx"), str(tmp_path / "out")
        ckpt = str(tmp_path / "ck")

        def feed(rows):
            (spark.createDataFrame(rows, "doc_id long, payload binary")
             .coalesce(1).write.mode("append").parquet(str(src)))

        def run():
            stream = (spark.readStream
                      .schema("doc_id long, payload binary")
                      .parquet(str(src)))
            q = start_incremental_fingerprint_neardup(
                phash_features(stream), "phash", "doc_id",
                index, out, ckpt)
            q.awaitTermination(120)

        # run 1: two distinct images survive
        feed([(1, self._bmp("img-a")), (2, self._bmp("img-b"))])
        run()
        got1 = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert got1 == {1, 2}

        # run 2 (same checkpoint → next epoch): doc 3 re-sends img-a's
        # bytes (pHash identical → history dup); docs 4/5 are an
        # in-batch identical pair → greedy keeps the earlier id
        feed([(3, self._bmp("img-a")), (4, self._bmp("img-c")),
              (5, self._bmp("img-c"))])
        run()
        got2 = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert 3 not in got2, "history media dup must be dropped"
        assert 4 in got2 and 5 not in got2, "in-batch pair keeps min id"
        assert got2 == {1, 2, 4}

        # replay the LAST epoch with the same content and epoch id (the
        # foreachBatch crash-before-commit contract): must converge
        last_epoch = max(r.epoch for r in
                         spark.read.parquet(out).select("epoch").collect())
        replay = phash_features(spark.createDataFrame(
            [(3, self._bmp("img-a")), (4, self._bmp("img-c")),
             (5, self._bmp("img-c"))], "doc_id long, payload binary"))
        proc = incremental_fingerprint_neardup_processor(
            "phash", "doc_id", index, out)
        proc(replay, last_epoch)
        got3 = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert got3 == got2, "replayed epoch must converge, not duplicate"
        bandtbl = spark.read.parquet(f"{index}/bands")
        assert ({r.doc_id for r in
                 bandtbl.select("doc_id").distinct().collect()}
                == {1, 2, 4}), "index holds exactly the survivors"

    def test_hamming_chain_greedy_first_wins(self, spark, tmp_path):
        """Transitive Hamming chain A~B~C (A<B<C, A≁C) in ONE batch:
        B drops against A, C survives because its only verified partner
        (B) did not survive — direct fingerprints, bits=63/bands=3/
        max_hamming=2 (two flipped bits always leave one band intact,
        so banding is pigeonhole-lossless here)."""
        from kafka_connect_streams_spark.streaming.state import (
            incremental_fingerprint_neardup_processor)
        fp_a = 0x123456789ABCDE
        fp_b = fp_a ^ 1                          # h(A,B)=1
        fp_c = fp_b ^ (1 << 62) ^ (1 << 30)      # h(B,C)=2, h(A,C)=3
        index = str(tmp_path / "idx"); out = str(tmp_path / "out")
        proc = incremental_fingerprint_neardup_processor(
            "fp", "doc_id", index, out)
        proc(spark.createDataFrame(
            [(1, fp_a), (2, fp_b), (3, fp_c)],
            "doc_id long, fp long"), 0)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1, 3}, kept

    def test_history_dropped_media_does_not_drop_partner(
            self, spark, tmp_path):
        """A fingerprint dropped against HISTORY must not veto its
        in-batch near-partner — sequential-ingest semantics, same as
        the text gate."""
        from kafka_connect_streams_spark.streaming.state import (
            incremental_fingerprint_neardup_processor)
        fp_a = 0x0F0F0F0F0F0F0F
        fp_b = fp_a ^ 1                          # ~ history A
        fp_c = fp_b ^ (1 << 62) ^ (1 << 30)      # ~ B only
        index = str(tmp_path / "idx"); out = str(tmp_path / "out")
        proc = incremental_fingerprint_neardup_processor(
            "fp", "doc_id", index, out)
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, fp long")
        proc(mk([(1, fp_a)]), 0)
        proc(mk([(2, fp_b), (3, fp_c)]), 1)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1, 3}, kept

    def test_fingerprint_index_compaction(self, spark, tmp_path):
        """compact_dedup_index folds the single bands table verbatim
        (epoch=-1 base): later batches still dedupe against compacted
        history and a post-compaction replay converges."""
        from kafka_connect_streams_spark.streaming.state import (
            compact_dedup_index,
            incremental_fingerprint_neardup_processor)
        fp_a, fp_x = 0x5A5A5A5A5A5A5A, 0x26C826C826C826
        index = str(tmp_path / "idx"); out = str(tmp_path / "out")
        proc = incremental_fingerprint_neardup_processor(
            "fp", "doc_id", index, out)
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, fp long")
        proc(mk([(1, fp_a)]), 0)
        proc(mk([(2, fp_x)]), 1)
        rows_before = {(r.band, r.band_key, r.doc_id) for r in
                       spark.read.parquet(f"{index}/bands")
                       .select("band", "band_key", "doc_id").collect()}
        n = compact_dedup_index(spark, f"{index}/bands", upto_epoch=2)
        assert n == len(rows_before)  # 3 band rows per doc
        t = spark.read.parquet(f"{index}/bands")
        assert {r.epoch for r in t.select("epoch").collect()} == {-1}
        rows_after = {(r.band, r.band_key, r.doc_id) for r in
                      t.select("band", "band_key", "doc_id").collect()}
        assert rows_after == rows_before, "reads must be unchanged"
        proc(mk([(3, fp_a ^ 2), (4, 0x3333333333CC33)]), 2)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1, 2, 4}, kept
        proc(mk([(3, fp_a ^ 2), (4, 0x3333333333CC33)]), 2)  # replay
        kept2 = {r.doc_id for r in
                 spark.read.parquet(out).select("doc_id").collect()}
        assert kept2 == kept


def test_throttle_rate_limits_per_key(spark, tmp_path):
    """Leading-edge per-key throttle: first event emits, events inside
    the min-interval are suppressed (and counted on the next emission),
    state survives across micro-batches."""
    from kafka_connect_streams_spark.streaming.state import throttle

    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000_000

    def write(name, rows):
        with open(src / name, "w") as f:
            for k, off_s in rows:
                f.write(json.dumps({"key": k,
                                    "ts_ms": base + off_s * 1000}) + "\n")

    # batch 1: a@0 emits; a@10, a@20 suppressed (interval 60s);
    # b@5 emits
    write("a.json", [("a", 0), ("a", 10), ("a", 20), ("b", 5)])
    stream = (spark.readStream.schema("key string, ts_ms long")
              .json(str(src))
              .selectExpr("key", "timestamp_micros(ts_ms*1000) AS ts"))
    out = throttle(stream, min_interval_s=60, watermark="5 seconds")
    q = (out.writeStream.format("memory").queryName("thr")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        # batch 2: a@50 still inside (20+60? no — inside 0+60) suppressed;
        # a@70 emits carrying 3 suppressed (10, 20, 50)
        write("b.json", [("a", 50), ("a", 70)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM thr").collect()
    finally:
        q.stop()
    got = {(r.key, r.emitted_ms - base, r.suppressed) for r in rows}
    assert ("a", 0, 0) in got, got
    assert ("b", 5_000, 0) in got, got
    assert ("a", 70_000, 3) in got, got
    assert len(got) == 3, got


def test_throttle_evicts_idle_keys_and_flushes_pending(spark, tmp_path):
    """Round-7 verdict #3: once the watermark passes last_emit +
    min_interval an idle key's state must evict (bounded state on
    unbounded key cardinality), flushing a non-zero pending suppressed
    count as one accounting row at the last emitted timestamp."""
    import json

    from kafka_connect_streams_spark.streaming.state import throttle

    src = tmp_path / "in"
    src.mkdir()
    base = 1_700_000_000_000

    def write(name, rows):
        with open(src / name, "w") as f:
            for k, off_s in rows:
                f.write(json.dumps({"key": k,
                                    "ts_ms": base + off_s * 1000}) + "\n")

    # a@0 emits, a@10 suppressed (pending=1); b@0 emits (pending=0)
    write("a.json", [("a", 0), ("a", 10), ("b", 0)])
    stream = (spark.readStream.schema("key string, ts_ms long")
              .json(str(src))
              .selectExpr("key", "timestamp_micros(ts_ms*1000) AS ts"))
    out = throttle(stream, min_interval_s=60, watermark="5 seconds")
    q = (out.writeStream.format("memory").queryName("thr_evict")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        # advance the watermark far past a/b's horizon (0+60s)...
        write("b.json", [("c", 300)])
        q.processAllAvailable()
        # ...and run one more batch so the expired timers fire
        write("c.json", [("d", 310)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM thr_evict").collect()
        n_state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    got = {(r.key, r.emitted_ms - base, r.suppressed) for r in rows}
    assert ("a", 0, 0) in got, got          # original emission
    assert ("a", 0, 1) in got, got          # eviction flush of pending=1
    # b had nothing pending -> evicts silently (no flush row)
    assert not any(k == "b" and s > 0 for k, _, s in got), got
    # a and b are gone from the store; c/d (and possibly not-yet-expired
    # timers) remain
    assert n_state <= 2, n_state


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """The stream-built HLL register table must be cell-identical to
    the batch sketch over the same corpus (shared hash + max-fold), the
    key space must stay bounded regardless of distinct count, and a
    replayed (at-least-once) delivery must not move a single register —
    max() absorbs duplicates."""
    from kafka_connect_streams_spark.operators.frequency import (
        _hll_hash60, hll_registers_from_hashed)
    from kafka_connect_streams_spark.streaming.state import streaming_hll

    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select(F.col("l_returnflag").alias("flag"),
                  F.col("l_orderkey").alias("okey")))
    batch_hashed = (li.select(F.col("flag").cast("string").alias("s"),
                              F.col("okey").cast("string").alias("e"))
                    .distinct()
                    .withColumn("h", _hll_hash60(F.col("e"))))
    batch = {(r.s, r.reg): r.m_reg for r in
             hll_registers_from_hashed(batch_hashed).collect()}

    src = tmp_path / "in"
    src.mkdir()
    li.coalesce(2).write.json(str(src / "a"))
    # replayed copy of the same rows: at-least-once delivery
    li.coalesce(1).write.json(str(src / "b"))
    stream = (spark.readStream.schema("flag string, okey long")
              .json(str(src / "*")))
    q = (streaming_hll(stream, "flag", "okey")
         .writeStream.format("memory").queryName("shll")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(r.s, r.reg): r.m_reg for r in
               spark.sql("SELECT * FROM shll").collect()}
    finally:
        q.stop()
    assert got == batch
    assert len(got) <= 3 * 256  # bounded: ≤ m registers per set, forever


def test_streaming_quantile_sketch_matches_batch(spark, tmp_path):
    """The stream-built histogram sketch must be cell-identical to the
    batch sketch over the same corpus (shared bucket arithmetic), the
    key space must stay bounded by |groups| x |buckets| regardless of
    row count, and folding estimates from the stream-built sketch must
    give the SAME answers as from the batch one — the mergeable-sketch
    contract, quantile edition."""
    from kafka_connect_streams_spark.operators.frequency import (
        quantile_from_sketch, quantile_sketch)
    from kafka_connect_streams_spark.streaming.state import (
        streaming_quantile_sketch)

    o = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
         .where(F.col("o_totalprice").isNotNull())
         .select(F.col("o_orderpriority").alias("g"),
                 F.expr("cast(cast(o_totalprice as decimal(18,2)) * 100"
                        " as bigint)").alias("v")))
    batch = {(r.g, r.bucket): r.c for r in
             quantile_sketch(o, "g", "v", width=50000).collect()}

    src = tmp_path / "in"
    src.mkdir()
    o.coalesce(2).write.json(str(src / "a"))
    stream = (spark.readStream.schema("g string, v long")
              .json(str(src / "*")))
    q = (streaming_quantile_sketch(stream, "g", "v", width=50000)
         .writeStream.format("memory").queryName("sqsk")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(r.g, r.bucket): r.c for r in
               spark.sql("SELECT * FROM sqsk").collect()}
    finally:
        q.stop()
    assert got == batch
    est_stream = {(r.g, r.pct): (r.n, r.est_lo, r.est_hi) for r in
                  quantile_from_sketch(spark.sql("SELECT * FROM sqsk"),
                                       width=50000).collect()}
    est_batch = {(r.g, r.pct): (r.n, r.est_lo, r.est_hi) for r in
                 quantile_from_sketch(
                     quantile_sketch(o, "g", "v", width=50000),
                     width=50000).collect()}
    assert est_stream == est_batch


def test_streaming_quantile_sketch_survives_restart(spark, tmp_path):
    """Bucket counts accumulated before a restart keep counting after
    it (state restores from the checkpoint, not from replaying the
    stream): 10 pre-restart + 7 post-restart rows in the same bucket
    must emit c=17 after the restarted batch."""
    from kafka_connect_streams_spark.streaming.state import (
        streaming_quantile_sketch)

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"

    def start():
        stream = (spark.readStream.schema("g string, v long")
                  .json(str(src)))
        sk = streaming_quantile_sketch(stream, "g", "v", width=100)
        return (sk.writeStream
                .foreachBatch(lambda df, eid: df.write.mode("append")
                              .parquet(str(out)))
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .start())

    with open(src / "a.json", "w") as f:
        for _ in range(10):
            f.write(json.dumps({"g": "x", "v": 250}) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(src / "b.json", "w") as f:
        for _ in range(7):
            f.write(json.dumps({"g": "x", "v": 270}) + "\n")
        f.write(json.dumps({"g": "y", "v": 50}) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    latest = {}
    for r in spark.read.parquet(str(out)).collect():
        latest[(r.g, r.bucket)] = max(r.c,
                                      latest.get((r.g, r.bucket), 0))
    assert latest[("x", 2)] == 17, latest   # restored 10 + new 7
    assert latest[("y", 0)] == 1, latest


def test_streaming_cluster_quota_matches_batch_even_under_replay(
        spark, tmp_path):
    """The stream-built per-cluster quota sample must be row-identical
    to the batch operator over the same corpus (same pre-trained
    codebook, same min-k membership and ranks), and a FULL replay of
    the source must change nothing — min-k over a set absorbs
    re-deliveries, the streaming_hll story."""
    from kafka_connect_streams_spark import queries as Q
    from kafka_connect_streams_spark.streaming.state import (
        streaming_cluster_quota)
    from kafka_connect_streams_spark.operators.similarity import (
        kmeans_coarse_centroids)

    sf_dir = "/root/testdata/sf0.001"
    batch = {(r.list, r.vec_id): r.rank_in_list
             for r in Q.q_cluster_balanced_sample(spark, sf_dir).collect()}
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select(F.col("vec_id").alias("id"), "embedding"))
    coarse = kmeans_coarse_centroids(emb, n_lists=8, iters=3)

    src = tmp_path / "in"
    src.mkdir()
    emb.coalesce(2).write.parquet(str(src / "a"))
    stream = (spark.readStream
              .schema("id long, embedding array<float>")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (streaming_cluster_quota(stream, coarse, quota=8)
         .writeStream.format("memory").queryName("scq")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        # at-least-once: replay the whole corpus, drain again
        emb.coalesce(1).write.mode("append").parquet(str(src / "a"))
        q.processAllAvailable()
        got = {(r.list, r.vec_id): r.rank_in_list
               for r in spark.sql(
                   "SELECT DISTINCT * FROM scq").collect()}
    finally:
        q.stop()
    assert got == batch


def test_streaming_cluster_quota_survives_restart(spark, tmp_path):
    """Members admitted before a restart keep their seats after it
    (state restores from the checkpoint): the post-restart membership
    is the min-k over BOTH phases' ids."""
    import hashlib

    from kafka_connect_streams_spark.streaming.state import (
        streaming_cluster_quota)

    coarse = [[0, 0], [10000, 10000]]
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"

    def start():
        stream = (spark.readStream.schema("id long, embedding array<float>")
                  .json(str(src)))
        return (streaming_cluster_quota(stream, coarse, quota=2)
                .writeStream
                .foreachBatch(lambda df, eid: df
                              .withColumn("_restarted",
                                          F.lit(eid >= 1))
                              .write.mode("append").parquet(str(out)))
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .start())

    def row(i, near):
        v = [0.0001 * i, 0.0] if near == 0 else [1.0, 1.0 - 0.0001 * i]
        return json.dumps({"id": i, "embedding": v})

    with open(src / "a.json", "w") as f:
        for i in (1, 2, 3):
            f.write(row(i, 0) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(src / "b.json", "w") as f:
        for i in (4, 5):
            f.write(row(i, 0) + "\n")
        f.write(row(6, 1) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want0 = sorted((hashlib.md5(str(i).encode()).hexdigest(), i)
                   for i in (1, 2, 3, 4, 5))[:2]
    # judge by the POST-RESTART emission only — the pre-restart epoch
    # legitimately wrote different (partial-knowledge) ranks for the
    # same members, and parquet read order is arbitrary
    rows = [r for r in spark.read.parquet(str(out)).collect()
            if r._restarted]
    final0 = {r.vec_id: r.rank_in_list for r in rows if r.list == 0}
    # the post-restart membership is exactly the min-k over BOTH phases
    assert final0 == {vid: rank
                      for rank, (_, vid) in enumerate(want0, start=1)}, \
        (rows, want0)
    assert any(r.list == 1 and r.vec_id == 6 and r.rank_in_list == 1
               for r in rows)


def test_streaming_token_budget_matches_batch_even_under_replay(
        spark, tmp_path):
    """The stream-enforced per-source token budget must be row-identical
    (cum_tok included) to batch token_budget_sample over the same
    corpus, and a FULL replay of the source must change nothing — the
    kept prefix is a set keyed by (hash, id, n_tok), so at-least-once
    re-delivery is absorbed. Judged per the update-mode idiom: each
    stratum's FINAL-epoch emission only (earlier epochs legitimately
    carry partial-knowledge cum sums)."""
    from kafka_connect_streams_spark.operators.text import (
        token_budget_sample)
    from kafka_connect_streams_spark.streaming.state import (
        streaming_token_budget)

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = {(r.source, r.doc_id): (r.n_tok, r.cum_tok)
             for r in token_budget_sample(
                 docs, "text", "doc_id", "source", budget=700).collect()}

    src = tmp_path / "in"
    src.mkdir()
    docs.coalesce(2).write.parquet(str(src / "a"))
    out = tmp_path / "out"
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (streaming_token_budget(stream, "text", "doc_id",
                                "source", budget=700)
         .writeStream
         .foreachBatch(lambda df, eid: df.withColumn("eid", F.lit(eid))
                       .write.mode("append").parquet(str(out)))
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        # at-least-once: replay the whole corpus, drain again
        docs.coalesce(1).write.mode("append").parquet(str(src / "a"))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(str(out)).collect()
    last = {}
    for r in rows:
        last.setdefault(r.stratum, 0)
        last[r.stratum] = max(last[r.stratum], r.eid)
    got = {(r.stratum, r.id): (r.n_tok, r.cum_tok)
           for r in rows if r.eid == last[r.stratum]}
    assert got == batch


def test_streaming_token_budget_remembers_evicted_mass(spark, tmp_path):
    """r12 review regression: an EVICTED document's token mass must
    keep counting against every later-hash arrival (the eviction-floor
    state field). Delivery order A (kept) → Z (evicted, over budget) →
    W (hash after Z): without the floor, Z's 10 tokens were forgotten
    and W was kept at cum 8; batch truth evicts W (cum over ALL docs =
    18 > 10). Also: replaying evicted Z afterwards changes nothing."""
    import hashlib

    from kafka_connect_streams_spark.streaming.state import (
        streaming_token_budget)

    # ids 27, 6, 19 sort in exactly this (md5(id), id) order
    A, Z, W = 27, 6, 19
    order = sorted([A, Z, W],
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                  i))
    assert order == [A, Z, W]
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"

    def row(i, words):
        return json.dumps({"doc_id": i, "text": " ".join(["w"] * words),
                           "source": "s"})

    stream = (spark.readStream
              .schema("doc_id long, text string, source string")
              .json(str(src)))
    q = (streaming_token_budget(stream, "text", "doc_id", "source",
                                budget=10)
         .writeStream
         .foreachBatch(lambda df, eid: df.withColumn("eid", F.lit(eid))
                       .write.mode("append").parquet(str(out)))
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        for phase, (i, words) in enumerate([(A, 6), (Z, 10), (W, 2),
                                            (Z, 10)]):   # last = replay
            with open(src / f"p{phase}.json", "w") as f:
                f.write(row(i, words) + "\n")
            q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(str(out)).collect()
    final_eid = max(r.eid for r in rows)
    got = {r.id: r.cum_tok for r in rows if r.eid == final_eid}
    # batch truth over {A, Z, W}: cum(A)=6 kept; cum(Z)=16 evict;
    # cum(W)=18 evict — W must NOT ride in on Z's forgotten mass
    assert got == {A: 6}, got


def test_streaming_token_budget_survives_restart(spark, tmp_path):
    """Budget decisions made before a restart restore from the
    checkpoint: a post-restart doc with an earlier hash position must
    push a pre-restart doc past the budget, and the final emission is
    the budget prefix over BOTH phases' documents."""
    import hashlib

    from kafka_connect_streams_spark.streaming.state import (
        streaming_token_budget)

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"

    def start():
        stream = (spark.readStream
                  .schema("doc_id long, text string, source string")
                  .json(str(src)))
        return (streaming_token_budget(stream, "text", "doc_id",
                                       "source", budget=6)
                .writeStream
                .foreachBatch(lambda df, eid: df
                              .withColumn("eid", F.lit(eid))
                              .write.mode("append").parquet(str(out)))
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .start())

    def row(i, words):
        return json.dumps({"doc_id": i, "text": " ".join(["w"] * words),
                           "source": "s"})

    with open(src / "a.json", "w") as f:
        for i in (1, 2, 3, 4):
            f.write(row(i, 2) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(src / "b.json", "w") as f:
        for i in (5, 6):
            f.write(row(i, 2) + "\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # sequential reference over all six docs in (md5(id), id) order
    order = sorted((hashlib.md5(str(i).encode()).hexdigest(), i)
                   for i in (1, 2, 3, 4, 5, 6))
    want, cum = {}, 0
    for h, i in order:
        cum += 2
        if cum > 6:
            break
        want[i] = cum
    rows = spark.read.parquet(str(out)).collect()
    final_eid = max(r.eid for r in rows)
    got = {r.id: r.cum_tok for r in rows if r.eid == final_eid}
    assert got == want, (got, want, order)


def test_streaming_decontaminate_matches_batch_decision(spark, tmp_path):
    """The stream-side per-training-row flag must be the exact transpose
    of the batch decision: train row t is contaminated iff some eval
    vector shares t's hyperplane bucket with quantized cosine >= 0.4
    (floor-e6 >= 400000 is the same predicate — 0.4e6 is an integer).
    Stateless: append mode, no watermark, no state store; a full replay
    re-emits identical flags."""
    from pyspark.sql import functions as F

    from kafka_connect_streams_spark.operators.similarity import (
        _cosine, _dot, _qvecs, hyperplane_signatures)
    from kafka_connect_streams_spark.streaming.filters import (
        streaming_decontaminate)

    sf_dir = "/root/testdata/sf0.001"
    vecs = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), "embedding"))
    is_eval = F.col("id") % 50 == 0
    ev_df, tr_df = vecs.filter(is_eval), vecs.filter(~is_eval)

    # batch truth, per TRAIN row: bucket-local exact cosine >= 0.4
    sig = hyperplane_signatures(vecs, "id", "embedding", planes=8)
    e = sig.filter(is_eval).select(F.col("id").alias("id_e"), "bucket")
    t = sig.filter(~is_eval).select(F.col("id").alias("id_t"), "bucket")
    cand = F.broadcast(e).join(t, "bucket").select("id_e", "id_t")
    ve = _qvecs(ev_df, "id", "embedding", "id_e", "_ve", "ne")
    vt = _qvecs(tr_df, "id", "embedding", "id_t", "_vt", "nt")
    pairs = (cand.join(F.broadcast(ve), "id_e").join(vt, "id_t")
             .withColumn("cosine", _cosine(_dot(F.col("_ve"),
                                                F.col("_vt")),
                                           F.col("ne"), F.col("nt"))))
    want_flagged = {r.id_t for r in pairs
                    .filter(F.col("cosine") >= 0.4)
                    .select("id_t").distinct().collect()}
    n_train = tr_df.count()

    src = tmp_path / "in"
    src.mkdir()
    tr_df.coalesce(2).write.parquet(str(src / "a"))
    stream = (spark.readStream
              .schema("id long, embedding array<float>")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (streaming_decontaminate(stream, ev_df, planes=8)
         .writeStream.format("memory").queryName("sdec")
         .outputMode("append").start())     # stateless: append, no watermark
    try:
        q.processAllAvailable()
        # at-least-once: full replay re-emits identical flags
        tr_df.coalesce(1).write.mode("append").parquet(str(src / "a"))
        q.processAllAvailable()
        rows = spark.sql("SELECT DISTINCT id, contaminated, "
                         "n_eval_candidates FROM sdec").collect()
    finally:
        q.stop()
    got = {r.id: r.contaminated for r in rows}
    assert len(got) == len(rows) == n_train, "replay must change nothing"
    assert {i for i, c in got.items() if c} == want_flagged
    # candidate counts are bucket-local, never |eval|
    n_eval = ev_df.count()
    assert all(r.n_eval_candidates <= n_eval for r in rows)


def test_streaming_decontaminate_ngram_matches_batch_decision(spark,
                                                              tmp_path):
    """Per-training-row n-gram contamination counts on the stream must
    equal the exact transpose of the batch shingle logic: for train doc
    t, n_contaminated = |distinct 5-grams of t that occur in any eval
    doc| — computed in the test with the batch shingles operator. The
    Bloom bitmap is a fast path only; the output is exact."""
    from pyspark.sql import functions as F

    from kafka_connect_streams_spark.operators.dedup import shingles
    from kafka_connect_streams_spark.streaming.filters import (
        streaming_decontaminate_ngram)

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_eval = F.col("doc_id") % 50 == 0
    ev_df, tr_df = docs.filter(is_eval), docs.filter(~is_eval)

    sh = shingles(docs, "text", "doc_id", n=5)
    ev_sh = (sh.join(ev_df.select("doc_id"), "doc_id", "left_semi")
             .select("shingle").distinct())
    want = {r.doc_id: r.n
            for r in sh.join(tr_df.select("doc_id"), "doc_id", "left_semi")
            .join(ev_sh, "shingle", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}

    src = tmp_path / "in"
    src.mkdir()
    tr_df.coalesce(2).write.parquet(str(src / "a"))
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (streaming_decontaminate_ngram(stream, ev_df, "text", "doc_id")
         .writeStream.format("memory").queryName("sngram")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT DISTINCT doc_id, n_grams, "
                         "n_contaminated, contaminated "
                         "FROM sngram").collect()
    finally:
        q.stop()
    got = {r.doc_id: r.n_contaminated for r in rows if r.n_contaminated}
    assert got == want
    flagged = {r.doc_id for r in rows if r.contaminated}
    assert flagged == set(want)
    assert len(rows) == tr_df.count()


def test_projection_curation_ops_are_stream_transparent(spark, tmp_path):
    """The narrow curation surface — quality scoring, language id,
    Gopher rules, repetition signals — is built from pure projections,
    so the SAME operator functions run unchanged on a streaming
    DataFrame (append mode, no watermark, no state) and emit rows
    identical to the batch run over the same files. This is the design
    dividend of keeping filters/scorers shuffle-free: stream adoption
    is free, per operator, with no streaming twin to maintain."""
    from pyspark.sql import functions as F

    from kafka_connect_streams_spark.operators.text import (
        gopher_rules, language_id, quality_score, repetition_signals)

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = tmp_path / "in"
    src.mkdir()
    docs.coalesce(2).write.parquet(str(src / "a"))
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    for i, op in enumerate([quality_score, language_id, gopher_rules,
                            repetition_signals]):
        batch = {tuple(r) for r in op(docs, "text", "doc_id").collect()}
        name = f"stp{i}"
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


def test_payload_simhash_is_stream_transparent(spark, tmp_path):
    """The multimodal fingerprint joins the stream-transparency story:
    payload_simhash is a pure in-row fold (zero shuffles), so the SAME
    function runs unchanged on a streaming leg and fingerprints every
    arriving payload identically to batch — the input a streaming media
    near-dup gate needs (the banding/verify join stays batch-side;
    media_neardup's localCheckpoint is not a streaming construct)."""
    from pyspark.sql import functions as F  # noqa: F401

    from kafka_connect_streams_spark.operators.multimodal import (
        attach_payload, payload_simhash)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(200))
    src = tmp_path / "in"
    src.mkdir()
    docs.coalesce(2).write.parquet(str(src / "a"))
    batch = {(r.doc_id, r.simhash, r.n_bytes)
             for r in payload_simhash(
                 attach_payload(docs, "text", "doc_id")).collect()}
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (payload_simhash(attach_payload(stream, "text", "doc_id"))
         .writeStream.format("memory").queryName("payload_fp")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {(r.doc_id, r.simhash, r.n_bytes)
               for r in spark.sql("SELECT * FROM payload_fp").collect()}
    finally:
        q.stop()
    assert got == batch


def test_streaming_decontaminate_fingerprint_matches_batch(spark,
                                                           tmp_path):
    """The exact and MinHash-LSH stream-side flags must be the precise
    transposes of the batch decisions: train doc t is exact-contaminated
    iff its canonical fingerprint appears in the eval set, and
    near-contaminated iff any of its 4 band keys lands in an eval band
    bucket — both truths recomputed in-test with the batch operators."""
    from pyspark.sql import functions as F

    from kafka_connect_streams_spark.operators.dedup import (
        banded_signatures, minhash_signatures_wide, shingles)
    from kafka_connect_streams_spark.operators.text import fingerprint
    from kafka_connect_streams_spark.streaming.filters import (
        streaming_decontaminate_fingerprint)

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_eval = F.col("doc_id") % 50 == 0
    ev_df, tr_df = docs.filter(is_eval), docs.filter(~is_eval)

    fp = fingerprint(docs, "text", "doc_id").select("doc_id",
                                                    "fingerprint")
    ev_fps = {r.fingerprint
              for r in fp.filter(is_eval).collect()}
    want_exact = {r.doc_id for r in fp.filter(~is_eval).collect()
                  if r.fingerprint in ev_fps}
    banded = banded_signatures(
        minhash_signatures_wide(shingles(docs, "text", "doc_id", n=3),
                                "doc_id", k=16),
        "doc_id", bands=4, rows=4)
    ev_buckets = {(r.band, r.band_key)
                  for r in banded.filter(is_eval).collect()}
    want_near = {r.doc_id for r in banded.filter(~is_eval).collect()
                 if (r.band, r.band_key) in ev_buckets}

    src = tmp_path / "in"
    src.mkdir()
    tr_df.coalesce(2).write.parquet(str(src / "a"))
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (streaming_decontaminate_fingerprint(stream, ev_df,
                                             "text", "doc_id")
         .writeStream.format("memory").queryName("sfpd")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT doc_id, contaminated_exact, "
                         "near_contaminated FROM sfpd").collect()
    finally:
        q.stop()
    assert len(rows) == tr_df.count()
    assert {r.doc_id for r in rows if r.contaminated_exact} == want_exact
    assert {r.doc_id for r in rows if r.near_contaminated} == want_near
    # note: exact ⊄ near in general — exact matches the canonical token
    # SET (order/repetition-insensitive), while MinHash shingles are
    # sequence-sensitive, so a reordered duplicate can be exact-only


import pytest  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_W = st.sampled_from(["a", "b", "c", "dd", "eee"])
_DOC = st.lists(_W, min_size=0, max_size=10).map(" ".join)


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_DOC, min_size=2, max_size=8))
def test_streaming_ngram_filter_matches_python_reference(spark, docs):
    """The stream-side n-gram filter is a stateless projection, so it
    property-tests on a batch frame: per-train-doc contaminated-gram
    counts must equal a pure-Python first-principles computation
    (distinct n-grams of the doc ∩ the union of eval docs' n-grams),
    across dense-collision corpora incl. empty docs and tiny pools —
    proving the Bloom fast path never changes the exact answer."""
    import re

    from kafka_connect_streams_spark.streaming.filters import (
        streaming_decontaminate_ngram)

    def gramset(text, n=3):
        toks = [t for t in re.split(r"\W+", text.lower()) if t]
        gs = {" ".join(toks[j:j + n])
              for j in range(max(len(toks) - n + 1, 1))}
        return {g for g in gs if g}

    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    ev = df.filter(F.col("doc_id") % 2 == 0)
    tr = df.filter(F.col("doc_id") % 2 == 1)
    ev_grams = set().union(*(gramset(d) for i, d in enumerate(docs)
                             if i % 2 == 0)) if docs else set()
    got = {r.doc_id: (r.n_grams, r.n_contaminated, r.contaminated)
           for r in streaming_decontaminate_ngram(
               tr, ev, "text", "doc_id", n=3).collect()}
    for i, d in enumerate(docs):
        if i % 2 == 0:
            continue
        gs = gramset(d)
        hit = len(gs & ev_grams)
        assert got[i] == (len(gs), hit, hit > 0), (d, got[i])


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_DOC, min_size=2, max_size=8))
def test_streaming_fingerprint_filter_matches_batch_machinery(spark,
                                                              docs):
    """The in-row MinHash fold (array_min over seed-transformed gram
    hashes) must produce band keys byte-identical to the batch
    banded_signatures path, and the exact leg must match canonical
    fingerprints — across random corpora incl. reordered duplicates
    and zero-shingle docs."""
    from kafka_connect_streams_spark.operators.dedup import (
        banded_signatures, minhash_signatures_wide, shingles)
    from kafka_connect_streams_spark.operators.text import fingerprint
    from kafka_connect_streams_spark.streaming.filters import (
        streaming_decontaminate_fingerprint)

    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    ev = df.filter(F.col("doc_id") % 2 == 0)
    tr = df.filter(F.col("doc_id") % 2 == 1)
    fp = fingerprint(df, "text", "doc_id").select("doc_id", "fingerprint")
    ev_fps = {r.fingerprint for r in
              fp.filter(F.col("doc_id") % 2 == 0).collect()}
    want_exact = {r.doc_id for r in
                  fp.filter(F.col("doc_id") % 2 == 1).collect()
                  if r.fingerprint in ev_fps}
    banded = banded_signatures(
        minhash_signatures_wide(shingles(df, "text", "doc_id", n=3),
                                "doc_id", k=16),
        "doc_id", bands=4, rows=4)
    ev_b = {(r.band, r.band_key) for r in
            banded.filter(F.col("doc_id") % 2 == 0).collect()}
    want_near = {r.doc_id for r in
                 banded.filter(F.col("doc_id") % 2 == 1).collect()
                 if (r.band, r.band_key) in ev_b}
    out = streaming_decontaminate_fingerprint(tr, ev, "text",
                                              "doc_id").collect()
    assert {r.doc_id for r in out if r.contaminated_exact} == want_exact
    assert {r.doc_id for r in out if r.near_contaminated} == want_near


class TestNeardupOPHSignature:
    def test_oph_gate_dedupes_and_replays_once(self, spark, tmp_path):
        """The one-permutation signature drops into the streaming gate
        unchanged (signature="oph"): the same planted near-dup chain
        dedupes identically (chain semantics + history leg), and an
        epoch replay converges — the exactly-once contract is
        signature-family-independent."""
        from kafka_connect_streams_spark.streaming.state import (
            incremental_neardup_processor)
        A = ("the quick brown fox jumps over the lazy dog again and "
             "again until the very end of the line")
        B = A + " extra tail words"
        index = str(tmp_path / "idx"); out = str(tmp_path / "out")
        proc = incremental_neardup_processor(
            "text", "doc_id", index, out, signature="oph")
        proc(spark.createDataFrame([(1, A), (2, B)],
                                   "doc_id long, text string"), 0)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1}, kept
        # history leg: a later epoch's near-copy of A drops too
        proc(spark.createDataFrame([(3, A + " more tail")],
                                   "doc_id long, text string"), 1)
        kept = {r.doc_id for r in
                spark.read.parquet(out).select("doc_id").collect()}
        assert kept == {1}, kept
        # replay epoch 1 byte-identically: output converges (no dupes,
        # no flips)
        proc(spark.createDataFrame([(3, A + " more tail")],
                                   "doc_id long, text string"), 1)
        kept = list(spark.read.parquet(out).select("doc_id").collect())
        assert {r.doc_id for r in kept} == {1} and len(kept) == 1
        # OPH band keys differ from classic minhash keys — the
        # family-consistency contract the docstring pins
        from kafka_connect_streams_spark.operators.dedup import (
            banded_signatures, minhash_signatures_wide,
            oph_signatures_wide, shingles)
        df = spark.createDataFrame([(1, A)], "doc_id long, text string")
        sh = shingles(df, "text", "doc_id", 3)
        kc = {(r.band, r.band_key) for r in banded_signatures(
            minhash_signatures_wide(sh, "doc_id", 16), "doc_id").collect()}
        ko = {(r.band, r.band_key) for r in banded_signatures(
            oph_signatures_wide(sh, "doc_id", 16), "doc_id").collect()}
        assert kc.isdisjoint(ko)
