"""Capstone integration: every layer of the engine composed in ONE flow.

filebroker topic (the in-sandbox broker contract) → native streaming read →
converter chain (PERMISSIVE JSON decode) → KSQL CSAS (the reference's SQL
entry point) → curation gate (gopher_rules, a pure projection that runs
unchanged on the streaming leg) → native exactly-once DataSource sink
(Arrow put + epoch manifests). The assertions walk the whole chain: rows
survive or drop per the gate, the sink's manifests account for every row,
and the KSQL relation is queryable mid-pipeline — the "a user of the
reference could switch" proof, end to end.
"""

from __future__ import annotations

import glob
import json


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
