"""PII detection/masking battery (operators/pii.py).

What these pin:
- detector counts equal Python ``re`` ground truth on a planted corpus
  of positives, near-miss negatives, and overlap traps;
- the masking ORDER contract: an email whose local part is a dotted
  quad redacts as ONE ``[EMAIL]`` token, never an ``[IPV4]`` crumb;
- residual re-detection over masked text is zero (measured, the same
  column the driver row hashes);
- the Spark enrichment spelling (attach_contacts) and its DuckDB twin
  (queries._pii_enrich_sql) are byte-identical — the pin that makes
  the pii_report / pii_mask driver rows meaningful;
- both operators are zero-Exchange single-stage projections.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from kafka_connect_streams_spark.operators.pii import (
    PII_MASK_ORDER, PII_PATTERNS, PII_TOKENS, attach_contacts, pii_detect,
    pii_mask)

#: planted corpus: (text, expected email/ipv4/phone counts)
CORPUS = [
    ("reach me at alice@example.com or bob.smith+x@mail.example.org",
     2, 0, 0),
    ("server 10.1.2.3 and 192.168.100.200 are up", 0, 2, 0),
    ("call 555-123-4567 now", 0, 0, 1),
    ("mixed: a@b.co, 8.8.8.8, 555-000-1111", 1, 1, 1),
    # near-miss negatives: no TLD, bare @, 3-3-3 phone, 3-part dotted
    ("a@b and 1.2.3 and 123-456-789 and user at example dot com",
     0, 0, 0),
    ("", 0, 0, 0),
    (None, 0, 0, 0),
    # overlap trap: dotted-quad local part — counts as BOTH email and
    # ipv4 (independent detectors), masks as ONE [EMAIL]
    ("weird 10.1.2.3@example.com address", 1, 1, 0),
]


def _rows(spark):
    return spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CORPUS)],
        "doc_id bigint, text string")


def test_pii_detect_counts_match_python_re(spark):
    got = {r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.has_pii)
           for r in pii_detect(_rows(spark)).collect()}
    for i, (t, em, ip, ph) in enumerate(CORPUS):
        raw = t or ""
        exp = tuple(len(re.findall(PII_PATTERNS[k], raw))
                    for k in PII_MASK_ORDER)
        assert exp == (em, ip, ph), (i, "fixture self-check")
        assert got[i] == (em, ip, ph, (em + ip + ph) > 0), i


def test_pii_mask_order_and_residual(spark):
    got = {r.doc_id: (r.masked, r.residual)
           for r in pii_mask(_rows(spark)).collect()}
    # every residual is zero — redaction leaves nothing detectable
    assert all(res == 0 for _, res in got.values())
    # order contract: the dotted-quad email is ONE [EMAIL], no crumbs
    assert got[7][0] == "weird [EMAIL] address"
    assert got[3][0] == "mixed: [EMAIL], [IPV4], [PHONE]"
    assert got[4][0] == CORPUS[4][0]          # negatives untouched
    assert got[6][0] == ""                    # NULL → empty, not null
    # python re twin of the sequential mask
    for i, (t, *_) in enumerate(CORPUS):
        masked = t or ""
        for k in PII_MASK_ORDER:
            masked = re.sub(PII_PATTERNS[k], PII_TOKENS[k].replace(
                "\\", "\\\\"), masked)
        assert got[i][0] == masked, i


def test_attach_contacts_matches_duckdb_twin(spark):
    """The Spark enrichment column expression and the oracle's SQL
    spelling produce byte-identical text for every document —
    including the NULL-text and empty-text rows."""
    from kafka_connect_streams_spark.queries import _pii_enrich_sql
    texts = [t for t, *_ in CORPUS] + ["hello world", "zz"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    got = {r.doc_id: r.text for r in attach_contacts(df).collect()}
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ", ".join(
            f"({i}, " + ("NULL" if t is None else "'" + t.replace(
                "'", "''") + "'") + ")"
            for i, t in enumerate(texts))
        + ") t(doc_id, text)")
    want = dict(con.sql(_pii_enrich_sql() + " ORDER BY doc_id").fetchall())
    assert got == want
    # the synthesizer actually plants each class somewhere, and leaves
    # at least one document untouched — mixed positives and negatives
    joined = "\n".join(got.values())
    assert "@example" in joined and " Call 555-" in joined \
        and " Host 10." in joined
    assert any(got[i] == (t or "") for i, t in enumerate(texts))


def test_pii_ops_are_zero_exchange(spark):
    """Both operators compile to a single whole-stage-codegen projection
    over the scan — no Exchange, no Python, stream-transparent."""
    df = _rows(spark)
    for op in (pii_detect, pii_mask):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, op.__name__
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_pii_ops_are_stream_transparent(spark, tmp_path):
    """Stateless zero-shuffle projections run unchanged on a streaming
    DataFrame (append mode, no watermark, no state) and emit rows
    identical to the batch run over the same files — the streaming
    ingest path redacts PII with the SAME operator call (the
    media-roundtrip stream-transparency precedent)."""
    from kafka_connect_streams_spark.operators.pii import attach_contacts
    docs = (spark.read
            .parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    src = tmp_path / "in"
    src.mkdir()
    docs.coalesce(2).write.parquet(str(src / "a"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    for i, op in enumerate([pii_detect, pii_mask]):
        batch = {tuple(r)
                 for r in op(attach_contacts(docs)).collect()}
        name = f"pii_stp{i}"
        q = (op(attach_contacts(stream))
             .writeStream.format("memory").queryName(name)
             .outputMode("append").start())
        try:
            q.processAllAvailable()
            got = {tuple(r)
                   for r in spark.sql(f"SELECT * FROM {name}").collect()}
        finally:
            q.stop()
        assert got == batch, op.__name__
        assert len(got) == docs.count()
