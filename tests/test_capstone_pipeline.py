"""Capstone integration: every layer of the engine composed in ONE flow.

filebroker topic (the in-sandbox broker contract) → native streaming read →
converter chain (PERMISSIVE JSON decode) → KSQL CSAS (the reference's SQL
entry point) → curation gate (gopher_rules, a pure projection that runs
unchanged on the streaming leg) → native exactly-once DataSource sink
(Arrow put + epoch manifests). The assertions walk the whole chain: rows
survive or drop per the gate, the sink's manifests account for every row,
and the KSQL relation is queryable mid-pipeline — the "a user of the
reference could switch" proof, end to end.

The second capstone (r11 verdict #4) is the STREAMING CURATION stack: all
four stream-side decontamination filters + the gopher and linear-quality
gates + the stateful token-budget stage composed into ONE streaming query
over a live broker leg, exactly-once epoch sink, batch-parity against the
same stack fused as a batch plan — what a production ingest actually runs.
"""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F


class TestCapstonePipeline:
    def test_broker_to_ksql_to_gate_to_exactly_once_sink(self, spark,
                                                         tmp_path):
        from pyspark.sql.types import _parse_datatype_string

        from kafka_connect_streams_spark.operators.text import gopher_rules
        from kafka_connect_streams_spark.sources import filebroker as fb
        from kafka_connect_streams_spark.sources.kafka import decode_records
        from kafka_connect_streams_spark.sources.python_datasink import (
            register as register_sink)
        from kafka_connect_streams_spark.sql.ksql import KsqlContext

        # 1. produce documents (and one corrupt record) to a broker topic
        broker = fb.FileBroker(str(tmp_path / "broker"))
        broker.create_topic("docs", partitions=2)
        p = broker.producer()
        docs = [
            (0, "short one"),                                   # gate-drops
            (1, " ".join(f"w{i}" for i in range(40))),          # survives
            (2, " ".join(["spam"] * 50)),                       # gate-drops
            (3, " ".join(f"v{i}" for i in range(30))),          # survives
        ]
        for i, text in docs:
            p.send("docs", json.dumps({"doc_id": i, "text": text}),
                   key=str(i), timestamp_ms=1_700_000_000_000 + i)
        p.send("docs", "NOT JSON AT ALL", key="bad",
               timestamp_ms=1_700_000_000_999)
        p.flush()

        # 2. stream + converter chain + KSQL registration and CSAS
        fb.register(spark)
        register_sink(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root)
               .option("subscribe", "docs").load())
        decoded = decode_records(
            raw, _parse_datatype_string("doc_id bigint, text string"))
        ctx = KsqlContext(spark, resolver=lambda t: decoded)
        ctx.sql("""CREATE STREAM docs_s (DOC_ID bigint, TEXT varchar)
                   WITH (kafka_topic='docs', value_format='JSON',
                         key='doc_id')""")
        staged = ctx.sql(
            "CREATE STREAM staged AS SELECT doc_id, text FROM docs_s")

        # 3. curation gate on the LIVE leg, kept rows only
        gated = (gopher_rules(staged, "text", "doc_id")
                 .filter("keep").select("doc_id", "n_tokens"))
        assert gated.isStreaming

        # 4. exactly-once native sink
        out = tmp_path / "curated"
        out.mkdir()
        q = (gated.writeStream.format("table_sink")
             .option("path", str(out))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert q.exception() is None

        # 5. the chain end-to-end: survivors only, corrupt record skipped
        back = spark.read.parquet(str(out))
        assert sorted(r.doc_id for r in back.collect()) == [1, 3]
        manifests = glob.glob(str(out / "_commits" / "*.json"))
        assert manifests
        assert sum(json.load(open(m))["rows"] for m in manifests) == 2


def _curation_gate_stack(df, ev_text_df, ev_vec_df):
    """The full stateless curation gate stack — all four
    decontamination modes, then the Gopher rule gate, then the linear
    quality gate. Works identically on a batch frame and a streaming
    leg (every stage is a pure projection); the struct-id idiom
    (`_row`) carries (doc_id, text, source) through the gates, which
    project their id column and drop everything else."""
    from kafka_connect_streams_spark.operators.text import (
        gopher_rules, linear_classifier_score)
    from kafka_connect_streams_spark.streaming.filters import (
        streaming_decontaminate, streaming_decontaminate_fingerprint,
        streaming_decontaminate_ngram)

    f = streaming_decontaminate_ngram(df, ev_text_df, n=5) \
        .withColumnRenamed("contaminated", "ngram_contaminated")
    f = streaming_decontaminate_fingerprint(f, ev_text_df)
    f = streaming_decontaminate(f, ev_vec_df, id_col="doc_id",
                                vec_col="embedding") \
        .withColumnRenamed("contaminated", "emb_contaminated")
    clean = f.filter(
        "NOT ngram_contaminated AND NOT contaminated_exact "
        "AND NOT near_contaminated AND NOT emb_contaminated")
    packed = clean.withColumn(
        "_row", F.struct("doc_id", "text", "source"))
    gated = (gopher_rules(packed, "text", "_row")
             .filter("keep").select("_row.*"))
    packed2 = gated.withColumn(
        "_row", F.struct("doc_id", "text", "source"))
    return (linear_classifier_score(packed2, "text", "_row")
            .filter("label = 'keep'").select("_row.*"))


class TestStreamingCurationCapstone:
    BUDGET = 90

    def _fixture(self):
        """Planted contamination per mode + gate-droppers + clean docs.
        Vocabularies are disjoint between the planted cases so each doc
        trips exactly the intended filter(s)."""
        ev_texts = [
            (100, "alpha beta gamma delta epsilon zeta eta theta"),
            (101, "one two three four five six seven eight nine ten"),
            (102, "lorem ipsum dolor sit amet consectetur adipiscing"
                  " elit sed do"),
        ]
        e1 = [0.5, 0.1, -0.3, 0.7, 0.2, -0.6, 0.4, 0.05]
        ev_vecs = [
            (100, [0.9, 0.0, 0.1, 0.0, -0.2, 0.0, 0.3, 0.0]),
            (101, e1),
            (102, [-0.4, 0.6, 0.0, 0.2, 0.0, 0.1, -0.5, 0.0]),
        ]
        far = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]  # cos 0 to all evals
        mk = " ".join
        docs = [
            # planted drops, one per mode
            (0, ev_texts[0][1], "s1", far),              # exact fingerprint
            (1, "aa bb one two three four five six cc dd ee ff", "s1",
             far),                                        # shared 5-gram
            (2, "lorem ipsum dolor sit amet consectetur adipiscing"
                " elit sed magna", "s1", far),            # MinHash near-dup
            (3, mk(f"q{i}" for i in range(20)), "s1", e1),  # embedding hit
            (4, "tiny", "s1", far),                       # gopher: too short
            (5, mk(["crawl"] * 60), "s2", far),           # gopher: top-token
            # clean survivors: 40 distinct tokens each (over gopher's
            # length floor) with vocabularies whose deterministic
            # hashed-feature weights sum POSITIVE (the linear gate)
            (6, mk(f"ga{i}" for i in range(40)), "s1", far),
            (7, mk(f"gg{i}" for i in range(40)), "s1", far),
            (8, mk(f"gi{i}" for i in range(40)), "s1", far),
            (9, mk(f"gj{i}" for i in range(40)), "s2", far),
            (10, mk(f"gk{i}" for i in range(40)), "s2", far),
            (11, mk(f"gp{i}" for i in range(40)), "s2", far),
        ]
        return ev_texts, ev_vecs, docs

    def test_broker_to_filters_to_budget_to_exactly_once_sink(
            self, spark, tmp_path):
        """broker → PERMISSIVE decode (corrupt record skipped) → four
        decontamination filters → gopher gate → linear gate → stateful
        per-source token budget → idempotent epoch-partitioned sink,
        ONE streaming query (the filters/gates are stateless
        projections; the budget is the single stateful operator, inside
        Spark's supported surface). Final per-stratum emission must be
        row-identical (cum_tok included) to the fused BATCH stack +
        token_budget_sample over the same fixture, and a full broker
        replay must change nothing (at-least-once absorbed)."""
        from pyspark.sql.types import _parse_datatype_string

        from kafka_connect_streams_spark.operators.text import (
            token_budget_sample)
        from kafka_connect_streams_spark.sources import filebroker as fb
        from kafka_connect_streams_spark.sources.kafka import decode_records
        from kafka_connect_streams_spark.streaming.state import (
            streaming_token_budget)

        ev_texts, ev_vecs, docs = self._fixture()
        ev_text_df = spark.createDataFrame(ev_texts,
                                           "doc_id long, text string")
        ev_vec_df = spark.createDataFrame(
            ev_vecs, "doc_id long, embedding array<double>")
        batch_df = spark.createDataFrame(
            docs, "doc_id long, text string, source string,"
                  " embedding array<double>")

        # ---- batch truth: fused gate stack + batch budget sampler ----
        gated_b = _curation_gate_stack(batch_df, ev_text_df, ev_vec_df)
        survivors = sorted(r.doc_id for r in gated_b.collect())
        # the planted contamination/gate drops all fired; enough clean
        # docs survive for the budget stage to have work to do
        assert not {0, 1, 3, 4, 5} & set(survivors)
        assert len(survivors) >= 4, survivors
        batch_final = {(r.source, r.doc_id): (r.n_tok, r.cum_tok)
                       for r in token_budget_sample(
                           gated_b, "text", "doc_id", "source",
                           budget=self.BUDGET).collect()}
        assert batch_final and len(batch_final) < len(survivors), (
            "budget must actually cut", batch_final, survivors)

        # ---- live leg: broker → decode → the same stack → budget ----
        broker = fb.FileBroker(str(tmp_path / "broker"))
        broker.create_topic("ingest", partitions=2)

        def produce():
            p = broker.producer()
            for i, text, source, vec in docs:
                p.send("ingest",
                       json.dumps({"doc_id": i, "text": text,
                                   "source": source, "embedding": vec}),
                       key=str(i),
                       timestamp_ms=1_700_000_000_000 + i)
            p.send("ingest", "corrupt{not json", key="bad",
                   timestamp_ms=1_700_000_000_999)
            p.flush()

        produce()
        fb.register(spark)
        raw = (spark.readStream.format("filebroker")
               .option("path", broker.root)
               .option("subscribe", "ingest").load())
        decoded = decode_records(raw, _parse_datatype_string(
            "doc_id bigint, text string, source string,"
            " embedding array<double>"))
        gated_s = _curation_gate_stack(decoded, ev_text_df, ev_vec_df)
        assert gated_s.isStreaming
        budgeted = streaming_token_budget(gated_s, "text", "doc_id",
                                          "source", budget=self.BUDGET)

        out = tmp_path / "curated"

        def deliver(df, eid):
            # idempotent epoch commit: a replayed epoch dynamically
            # overwrites its own partition — the repo's exactly-once
            # sink contract (incremental_dedup_processor precedent)
            (df.withColumn("epoch", F.lit(eid))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch").parquet(str(out)))

        q = (budgeted.writeStream.foreachBatch(deliver)
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            q.processAllAvailable()
            produce()              # full at-least-once replay
            q.processAllAvailable()
        finally:
            q.stop()

        # ---- parity: final-epoch emission per stratum == batch ----
        rows = spark.read.parquet(str(out)).collect()
        last = {}
        for r in rows:
            last[r.stratum] = max(last.get(r.stratum, 0), r.epoch)
        got = {(r.stratum, r.id): (r.n_tok, r.cum_tok)
               for r in rows if r.epoch == last[r.stratum]}
        assert got == batch_final, (got, batch_final)
