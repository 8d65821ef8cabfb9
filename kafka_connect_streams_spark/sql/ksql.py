"""KSQL-style DDL front end: CREATE STREAM / CSAS over the Spark catalog.

Reference surface (the KSQL 5.1 subset the integration tests exercise,
SURVEY.md §2 / DatabaseSelectAndProjectIntTest.java + StreamsSelectAndProjectIntTest.java):

- ``CREATE STREAM s (COL TYPE, ...) WITH (kafka_topic='t', value_format='JSON',
  key='col')`` — register a named, schema-ful stream over a topic/table
  (StreamsSelectAndProjectIntTest.java:327-344)
- ``CREATE STREAM out AS SELECT ... FROM s WHERE ...`` (CSAS) with optional
  ``WITH (timestamp='col', value_format=...)``
  (DatabaseSelectAndProjectIntTest.java:252-255, :174-208)
- implicit ``ROWKEY``/``ROWTIME`` pseudo-columns on every stream

Everything after registration IS Spark SQL: the MetaStore is the session
catalog, parse/analyze/optimize is Catalyst (the reference delegates the same
way — its KSQL engine compiles to a Streams topology; ours compiles to a
Spark plan). This front end only handles the KSQL-specific DDL dialect and
pseudo-column injection; queries run through ``spark.sql`` untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KSQL_TYPES = {
    "bigint": "bigint", "int": "int", "integer": "int", "varchar": "string",
    "string": "string", "double": "double", "boolean": "boolean",
}

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(STREAM|TABLE)\s+(\w+)\s*\((?P<cols>.*?)\)\s*"
    r"WITH\s*\((?P<props>.*?)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)
_CSAS_RE = re.compile(
    r"^\s*CREATE\s+(STREAM|TABLE)\s+(\w+)\s*"
    r"(?:WITH\s*\((?P<props>.*?)\)\s*)?AS\s+(?P<select>SELECT\b.*?);?\s*$",
    re.IGNORECASE | re.DOTALL)
_WINDOW_RE = re.compile(
    r"\bWINDOW\s+(?P<kind>TUMBLING|HOPPING|SESSION)\s*\((?P<spec>[^)]*)\)",
    re.IGNORECASE)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(\w+)\s+(?P<select>SELECT\b.*?);?\s*$",
    re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(
    r"^\s*DROP\s+(STREAM|TABLE)\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*$",
    re.IGNORECASE)
_SHOW_RE = re.compile(
    r"^\s*(?:SHOW|LIST)\s+(STREAMS|TABLES)\s*;?\s*$", re.IGNORECASE)
_SHOW_QUERIES_RE = re.compile(
    r"^\s*(?:SHOW|LIST)\s+QUERIES\s*;?\s*$", re.IGNORECASE)
_TERMINATE_RE = re.compile(
    r"^\s*TERMINATE\s+(\S+?)\s*;?\s*$", re.IGNORECASE)
_DESCRIBE_RE = re.compile(
    r"^\s*DESCRIBE\s+(\w+)\s*;?\s*$", re.IGNORECASE)
_PRINT_RE = re.compile(
    r"^\s*PRINT\s+'(?P<topic>[^']+)'"
    r"(?:\s+FROM\s+BEGINNING)?(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE)
_UNIT = r"(?:MILLISECONDS?|SECONDS?|MINUTES?|HOURS?|DAYS?)"
_WITHIN_RE = re.compile(
    r"FROM\s+(?P<lname>\w+)"
    r"(?:\s+(?P<lalias>(?!LEFT\b|RIGHT\b|FULL\b|INNER\b|OUTER\b|JOIN\b)\w+))?"
    r"\s+(?P<jtype>(?:LEFT|FULL|INNER)\s+(?:OUTER\s+)?)?JOIN\s+"
    r"(?P<rname>\w+)(?:\s+(?P<ralias>(?!WITHIN\b|ON\b)\w+))?"
    r"\s+WITHIN\s+(?:"
    r"(?P<n>\d+)\s+(?P<unit>" + _UNIT + r")"
    r"|\(\s*(?P<nb>\d+)\s+(?P<ub>" + _UNIT + r")\s*,"
    r"\s*(?P<na>\d+)\s+(?P<ua>" + _UNIT + r")\s*\))"
    r"\s+ON\s+",
    re.IGNORECASE)

_MS = {"millisecond": 1, "second": 1_000, "minute": 60_000,
       "hour": 3_600_000, "day": 86_400_000}


def rewrite_within_clause(sql: str, frames: dict | None = None) -> str:
    """KSQL ``s1 JOIN s2 WITHIN n UNIT ON ...`` → a time-bounded join.

    KSQL 5.1's stream-stream join window: rows pair iff
    ``|t_left − t_right| ≤ window``. Every registered relation carries the
    epoch-ms ``rowtime`` pseudo-column (§1.4), so the clause rewrites to
    ``ON (abs(L.rowtime - R.rowtime) <= ms) AND <original condition>`` and
    the WITHIN token disappears before Spark parses. The asymmetric
    ``WITHIN (before, after)`` form bounds how far the RIGHT side may lag
    or lead the left (KSQL semantics: ``t_r ∈ [t_l − before, t_l +
    after]``) and rewrites to a BETWEEN. KSQL join conditions are single
    equalities, so appending with AND never rebinds an OR.

    When ``frames`` (the context's name→DataFrame registry) shows BOTH legs
    as streaming relations carrying the watermarked ``rowtime_ts``
    pseudo-column, the rewrite adds the SAME window as an event-time
    interval bound on those columns. That bound is what Spark's
    stream-stream join derives its state watermark from: rows older than
    ``watermark − window`` are evicted instead of held forever — the
    reference's JoinWindows.of(n)+retention semantics
    (StreamStreamJoinIntegrationTest.java:82) with bounded state. The
    bigint bound stays alongside (it is implied by the interval bound, and
    keeps batch/streaming plans value-identical). Bounded/batch legs keep
    the bigint-only rewrite.
    """
    def _ms(n: str, unit: str) -> int:
        return int(n) * _MS[unit.lower().rstrip("s")]

    def _streaming_with_ts(name: str) -> bool:
        df = (frames or {}).get(name.lower())
        return (df is not None and df.isStreaming
                and "rowtime_ts" in df.columns)

    def _sub(m: re.Match) -> str:
        left = m.group("lalias") or m.group("lname")
        right = m.group("ralias") or m.group("rname")
        if m.group("n"):
            before = after = _ms(m.group("n"), m.group("unit"))
            cond = f"abs({left}.rowtime - {right}.rowtime) <= {before}"
        else:
            before = _ms(m.group("nb"), m.group("ub"))
            after = _ms(m.group("na"), m.group("ua"))
            cond = (f"{right}.rowtime BETWEEN {left}.rowtime - {before} "
                    f"AND {left}.rowtime + {after}")
        if (_streaming_with_ts(m.group("lname"))
                and _streaming_with_ts(m.group("rname"))):
            cond += (
                f" AND {right}.rowtime_ts >= {left}.rowtime_ts"
                f" - INTERVAL {before} MILLISECONDS"
                f" AND {right}.rowtime_ts <= {left}.rowtime_ts"
                f" + INTERVAL {after} MILLISECONDS")
        jtype = (m.group("jtype") or "")
        alias_l = f" {m.group('lalias')}" if m.group("lalias") else ""
        alias_r = f" {m.group('ralias')}" if m.group("ralias") else ""
        return (f"FROM {m.group('lname')}{alias_l} {jtype}JOIN "
                f"{m.group('rname')}{alias_r} ON ({cond}) AND ")
    return _WITHIN_RE.sub(_sub, sql)


def rewrite_window_clause(sql: str) -> str:
    """KSQL ``WINDOW TUMBLING/HOPPING/SESSION (...)`` → Spark grouping exprs.

    KSQL 5.1 windows an aggregate with a clause between FROM and GROUP BY
    (ksql WindowingIntTest surface); Spark expresses the same thing as a
    ``window()``/``session_window()`` grouping expression. The rewrite:

    - drops the WINDOW clause,
    - prepends the equivalent ``window(timestamp_millis(rowtime), ...)`` to
      the GROUP BY list (ROWTIME is the stream's epoch-ms pseudo-column, so
      every registered stream can window),
    - maps ``WINDOWSTART``/``WINDOWEND`` to ``window.start``/``window.end``.

    Pure source-to-source: the result is ordinary Spark SQL and plans as a
    native (streaming-capable, watermark-compatible) windowed aggregate.
    """
    # KSQL statements conventionally end with ';' — Spark SQL rejects it,
    # and the no-GROUP-BY branch below would otherwise inject the grouping
    # clause AFTER the terminator
    sql = sql.rstrip().rstrip(";").rstrip()
    m = _WINDOW_RE.search(sql)
    if not m:
        return sql
    kind, spec = m.group("kind").upper(), m.group("spec")
    dur_m = re.search(r"(?:SIZE\s+)?(\d+)\s+(\w+)", spec, re.IGNORECASE)
    if not dur_m:
        raise ValueError(f"cannot parse window duration: {spec!r}")
    dur = f"{dur_m.group(1)} {dur_m.group(2).lower()}"
    ts = "timestamp_millis(rowtime)"
    if kind == "SESSION":
        wexpr = f"session_window({ts}, '{dur}')"
    elif kind == "HOPPING":
        adv = re.search(r"ADVANCE\s+BY\s+(\d+)\s+(\w+)", spec, re.IGNORECASE)
        if not adv:
            raise ValueError(f"HOPPING window needs ADVANCE BY: {spec!r}")
        wexpr = (f"window({ts}, '{dur}', "
                 f"'{adv.group(1)} {adv.group(2).lower()}')")
    else:
        wexpr = f"window({ts}, '{dur}')"
    out = sql[:m.start()] + sql[m.end():]
    out, n = re.subn(r"\bGROUP\s+BY\b", f"GROUP BY {wexpr},", out,
                     count=1, flags=re.IGNORECASE)
    if n == 0:
        # windowed aggregate without explicit keys: the GROUP BY must land
        # before any trailing ORDER BY / LIMIT, not at the statement end
        tail = re.search(r"\b(ORDER\s+BY|LIMIT)\b", out, re.IGNORECASE)
        at = tail.start() if tail else len(out)
        out = f"{out[:at].rstrip()} GROUP BY {wexpr} {out[at:]}".rstrip()
    out = re.sub(r"\bWINDOWSTART\b", "window.start", out, flags=re.IGNORECASE)
    out = re.sub(r"\bWINDOWEND\b", "window.end", out, flags=re.IGNORECASE)
    return out


def _parse_props(s: str | None) -> dict[str, str]:
    if not s:
        return {}
    return {k.strip().lower(): v.strip().strip("'\"")
            for k, v in (p.split("=", 1) for p in s.split(","))}


def _parse_type(t: str) -> str:
    t = t.strip().lower()
    m = re.match(r"array\s*<(.+)>", t)
    if m:
        return f"array<{_parse_type(m.group(1))}>"
    m = re.match(r"map\s*<(.+),(.+)>", t)
    if m:
        return f"map<{_parse_type(m.group(1))},{_parse_type(m.group(2))}>"
    if t not in _KSQL_TYPES:
        raise ValueError(f"unsupported KSQL type: {t}")
    return _KSQL_TYPES[t]


@dataclass
class StreamMeta:
    """Catalog entry: what KSQL's MetaStore tracks per stream."""
    name: str
    topic: str
    value_format: str
    key_col: str | None
    timestamp_col: str | None = None
    columns: dict[str, str] = field(default_factory=dict)
    kind: str = "stream"  # "stream" | "table" (KSQL stream/table duality)
    #: watermark delay for streaming relations (WITH(watermark='...')) —
    #: the Spark analog of KSQL's join retention/grace
    watermark: str = "30 seconds"


class KsqlContext:
    """Minimal KsqlContext analog: DDL in, temp views + StreamMeta out.

    ``sql()`` dispatches: KSQL DDL forms are handled here; anything else goes
    straight to ``spark.sql`` (SELECTs over registered streams "just work").
    Sources are bound by a resolver: topic name → DataFrame (batch or
    streaming) — tests bind parquet tables, production binds Kafka/JDBC legs.
    """

    def __init__(self, spark: SparkSession, resolver):
        self.spark = spark
        self.resolver = resolver  # Callable[[str], DataFrame]
        self.metastore: dict[str, StreamMeta] = {}
        #: name → the relation's DataFrame. INSERT INTO must union with the
        #: target's CURRENT plan, captured here — re-reading the temp view by
        #: name after replacing it would make the view reference itself.
        self.frames: dict[str, DataFrame] = {}
        #: name → ConnectorMeta (CREATE SOURCE/SINK CONNECTOR registry)
        self.connectors: dict[str, "ConnectorMeta"] = {}

    _ST_SRC_RE = re.compile(
        r"\b(?:(?P<from>FROM)|(?:(?P<jt>LEFT|RIGHT|FULL|INNER)\s+"
        r"(?:OUTER\s+)?)?(?P<join>JOIN))\s+"
        r"(?P<name>\w+)"
        r"(?:\s+(?P<alias>(?!ON\b|JOIN\b|WHERE\b|GROUP\b|LEFT\b|RIGHT\b"
        r"|FULL\b|INNER\b|OUTER\b|WITHIN\b|EMIT\b|WINDOW\b|PARTITION\b"
        r"|HAVING\b|ORDER\b|LIMIT\b)\w+))?",
        re.IGNORECASE)

    def _dispatch_stream_table_join(self, statement: str) -> str:
        """KSQL 5.1 stream-table join (KSQL links the capability; the
        reference never tests one — SURVEY §2.3): when a query joins a
        LIVE stream relation with a materialized TABLE relation, inject a
        ``/*+ BROADCAST(table) */`` hint so every micro-batch plans a
        map-side hash join against the table's CURRENT state — the
        stream side is never shuffled, and Spark's per-trigger re-read of
        the static side gives the KTable lookup-at-processing-time
        semantics (streaming/joins.py stream_table_join, the same
        dispatch for the DataFrame API). KSQL's shape rules are
        enforced: the stream must be the LEFT side, and only INNER/LEFT
        joins are supported for stream-table."""
        sel = re.search(r"\bSELECT\b", statement, re.IGNORECASE)
        if sel is None:
            # not a query (DDL/DML mentioning relation names) — nothing
            # to dispatch, and no SELECT to anchor a hint to (round-7
            # ADVICE: this used to AttributeError on sel.end())
            return statement
        streams: list[str] = []
        tables: list[str] = []
        from_is_table = False
        join_has_stream = False
        bad_jt = None
        # scan only AFTER the SELECT: FROM/JOIN sources of a query always
        # follow it, and this keeps the regex off DDL prefixes
        for m in self._ST_SRC_RE.finditer(statement, sel.end()):
            name = m.group("name").lower()
            meta = self.metastore.get(name)
            df = self.frames.get(name)
            if meta is None or df is None:
                continue
            is_static_table = meta.kind == "table" and not df.isStreaming
            jt = (m.group("jt") or "").upper()
            if is_static_table:
                tables.append(m.group("alias") or m.group("name"))
                if m.group("from"):
                    from_is_table = True
                elif jt in ("RIGHT", "FULL"):
                    bad_jt = jt        # stream FULL/RIGHT JOIN table
            elif df.isStreaming:
                streams.append(name)
                if m.group("join"):
                    join_has_stream = True
                    if jt in ("RIGHT", "FULL"):
                        bad_jt = jt    # table FULL/RIGHT JOIN stream
        if not (streams and tables):
            return statement
        if from_is_table and join_has_stream:
            raise ValueError(
                "stream-table join: the STREAM must be the left side "
                "(FROM stream JOIN table), as in KSQL")
        if bad_jt:
            raise ValueError(
                f"stream-table join: {bad_jt} JOIN is not supported — "
                "KSQL stream-table joins are INNER or LEFT")
        hint = "/*+ BROADCAST(" + ", ".join(tables) + ") */ "
        return statement[:sel.end()] + " " + hint + statement[sel.end():]

    def sql(self, statement: str) -> DataFrame | None:
        from kafka_connect_streams_spark.functions import rewrite_ksql_sql
        statement = rewrite_window_clause(statement)
        statement = rewrite_within_clause(statement, self.frames)
        statement = self._dispatch_stream_table_join(statement)
        m = _CREATE_CONNECTOR_RE.match(statement)
        if m:
            return self._create_connector(m)
        m = _SHOW_CONNECTORS_RE.match(statement)
        if m:
            return self._show_connectors()
        m = _DROP_CONNECTOR_RE.match(statement)
        if m:
            return self._drop_connector(m, statement)
        m = _DESCRIBE_CONNECTOR_RE.match(statement)
        if m:
            return self._describe_connector(m)
        m = _SHOW_TOPICS_RE.match(statement)
        if m:
            return self._show_topics()
        m = _EXPLAIN_RE.match(statement)
        if m:
            return self._explain(m.group("body"))
        m = _CSAS_RE.match(statement)
        if m:
            return self._csas(m)
        m = _CREATE_RE.match(statement)
        if m:
            return self._create(m)
        m = _INSERT_RE.match(statement)
        if m:
            return self._insert(m)
        m = _DROP_RE.match(statement)
        if m:
            return self._drop(m, statement)
        m = _SHOW_RE.match(statement)
        if m:
            return self._show(m)
        m = _SHOW_QUERIES_RE.match(statement)
        if m:
            return self._show_queries()
        m = _TERMINATE_RE.match(statement)
        if m:
            return self._terminate(m.group(1))
        m = _PRINT_RE.match(statement)
        if m:
            return self._print(m)
        m = _DESCRIBE_RE.match(statement)
        if m:
            return self._describe(m)
        return self.spark.sql(
            rewrite_ksql_sql(statement.rstrip().rstrip(";").rstrip()))

    # -- DROP / SHOW / DESCRIBE ---------------------------------------------

    def _drop(self, m: re.Match, statement: str) -> None:
        """``DROP STREAM|TABLE [IF EXISTS] name``: unregister the relation
        (temp view + metastore). Dropping a STREAM with DROP TABLE (or vice
        versa) is an error, as in KSQL."""
        kind, name = m.group(1).lower(), m.group(2).lower()
        meta = self.metastore.get(name)
        if meta is None:
            if re.search(r"\bIF\s+EXISTS\b", statement, re.IGNORECASE):
                return None
            raise ValueError(f"DROP {kind.upper()} {name}: unknown relation")
        if meta.kind != kind:
            raise ValueError(
                f"DROP {kind.upper()} {name}: relation is a "
                f"{meta.kind.upper()} — use DROP {meta.kind.upper()}")
        self.spark.catalog.dropTempView(name)
        del self.metastore[name]
        del self.frames[name]
        return None

    def _show(self, m: re.Match) -> DataFrame:
        """``SHOW STREAMS|TABLES``: one row per registered relation of that
        kind — (name, topic, format), KSQL's listing columns."""
        kind = m.group(1).lower().rstrip("s")
        rows = [(meta.name, meta.topic, meta.value_format.upper())
                for meta in self.metastore.values() if meta.kind == kind]
        return self.spark.createDataFrame(
            rows, "name string, kafka_topic string, format string")

    def _show_queries(self) -> DataFrame:
        """``SHOW QUERIES``: one row per RUNNING persistent query — KSQL's
        listing of continuous queries maps to the session's active
        ``StreamingQuery`` handles (id, name, sink description)."""
        rows = [(str(q.id), q.name or "", "RUNNING")
                for q in self.spark.streams.active]
        return self.spark.createDataFrame(
            rows, "query_id string, name string, state string")

    def _terminate(self, ident: str) -> None:
        """``TERMINATE <name-or-id>``: stop the matching persistent query
        (KSQL's terminate of a continuous query = StreamingQuery.stop —
        the checkpoint keeps its offsets, so a restarted query resumes
        exactly where this one stopped)."""
        ident_l = ident.lower()
        for q in self.spark.streams.active:
            if (q.name or "").lower() == ident_l or str(q.id) == ident:
                q.stop()
                return None
        raise ValueError(f"TERMINATE {ident}: no running query by that "
                         "name or id")

    def _print(self, m: re.Match) -> DataFrame:
        """``PRINT 'topic' [FROM BEGINNING] [LIMIT n]``: tail the topic's
        records through the resolver — the KSQL CLI inspection statement.
        Batch relations honor LIMIT; a streaming relation is returned
        as-is (attach your own sink — a streaming DataFrame cannot be
        limited)."""
        df = self.resolver(m.group("topic"))
        if df is None:
            raise ValueError(f"PRINT {m.group('topic')}: unknown topic")
        lim = m.group("limit")
        if lim and not df.isStreaming:
            df = df.limit(int(lim))
        return df

    def _describe(self, m: re.Match) -> DataFrame:
        """``DESCRIBE name``: the relation's columns and Spark SQL types,
        pseudo-columns (ROWKEY/ROWTIME) included — what KSQL prints."""
        name = m.group(1).lower()
        if name not in self.metastore:
            raise ValueError(f"DESCRIBE {name}: unknown relation")
        df = self.frames[name]
        return self.spark.createDataFrame(
            list(df.dtypes), "field string, type string")

    # -- INSERT INTO s SELECT ... -------------------------------------------

    def _insert(self, m: re.Match) -> DataFrame:
        """KSQL ``INSERT INTO``: run a second query into an EXISTING stream —
        the target becomes the union of all its legs (KSQL 5.1 semantics:
        multiple persistent queries feeding one output topic). Only streams
        accept inserts (a TABLE is a compacted changelog — appending rows
        behind its back would break per-key latest), and the leg's columns
        must match the target's exactly."""
        from kafka_connect_streams_spark.functions import rewrite_ksql_sql
        name = m.group(1).lower()
        meta = self.metastore.get(name)
        if meta is None:
            raise ValueError(f"INSERT INTO {name}: unknown stream")
        if meta.kind != "stream":
            raise ValueError(
                f"INSERT INTO {name}: target is a TABLE; KSQL only allows "
                "INSERT INTO a STREAM")
        leg = self.spark.sql(rewrite_ksql_sql(m.group("select")))
        target = self.frames[name]
        t_cols = [c.lower() for c in target.columns]
        l_cols = [c.lower() for c in leg.columns]
        if sorted(t_cols) != sorted(l_cols):
            raise ValueError(
                f"INSERT INTO {name}: leg columns {sorted(l_cols)} do not "
                f"match the stream's schema {sorted(t_cols)}")
        out = target.unionByName(leg)
        out.createOrReplaceTempView(name)
        self.frames[name] = out
        return out

    # -- CREATE STREAM s (...) WITH (...) -----------------------------------

    def _create(self, m: re.Match) -> None:
        kind = m.group(1).upper()
        name = m.group(2).lower()
        if name in self.metastore:
            # KSQL parity: CREATE on a registered name is an error, not a
            # silent replace (DROP it first)
            raise ValueError(
                f"CREATE {kind} {name}: relation already exists")
        props = _parse_props(m.group("props"))
        cols: dict[str, str] = {}
        for part in self._split_cols(m.group("cols")):
            cname, ctype = part.strip().split(None, 1)
            cols[cname.lower()] = _parse_type(ctype)
        meta = StreamMeta(
            name=name,
            topic=props.get("kafka_topic", name),
            value_format=props.get("value_format", "json").lower(),
            key_col=props.get("key", "").lower() or None,
            timestamp_col=props.get("timestamp", "").lower() or None,
            columns=cols,
            kind=kind.lower(),
            watermark=props.get("watermark", "30 seconds"),
        )
        df = self.resolver(meta.topic)
        df = self._with_pseudo_columns(df, meta)
        if kind == "TABLE":
            df = self._latest_per_key(df, meta)
        df.createOrReplaceTempView(name)
        self.metastore[name] = meta
        self.frames[name] = df
        return None

    @staticmethod
    def _latest_per_key(df: DataFrame, meta: StreamMeta) -> DataFrame:
        """KSQL TABLE semantics: the topic is a changelog, the table holds
        each key's LATEST row (KSQL 5.1 stream/table duality — a KTable is
        the per-key compaction of its changelog stream). Latest = max
        (rowtime, offset-if-present); ``max_by`` of the whole row keeps one
        shuffle, works identically on batch frames and on streaming frames
        in update mode (the KTable emission granularity)."""
        if not meta.key_col:
            raise ValueError(
                f"CREATE TABLE {meta.name} requires a KEY column "
                "(stream/table duality needs a primary key to compact on)")
        lower = {c.lower(): c for c in df.columns}
        order_cols = [F.col(lower["rowtime"])]
        if "offset" in lower:
            order_cols.append(F.col(lower["offset"]))
        row = F.max_by(F.struct(*[F.col(c) for c in df.columns]),
                       F.struct(*order_cols)).alias("_latest")
        return df.groupBy(F.col("rowkey")).agg(row).select("_latest.*")

    @staticmethod
    def _split_cols(s: str) -> list[str]:
        """Split column defs on commas not nested in <> (array<double>, ...)."""
        parts, depth, cur = [], 0, []
        for ch in s:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur))
        return [p for p in (x.strip() for x in parts) if p]

    def _with_pseudo_columns(self, df: DataFrame, meta: StreamMeta) -> DataFrame:
        """Inject ROWKEY/ROWTIME (§1.4): rowkey = designated key column as
        string; rowtime = epoch-ms event time (timestamp col if declared,
        else a ts/timestamp column if present, else null).

        A STREAMING relation with a known event time additionally gets a
        timestamp-typed ``rowtime_ts`` carrying a watermark
        (WITH(watermark='...'), default 30 seconds). This is what lets a
        ``JOIN ... WITHIN`` over two live legs evict join state: the WITHIN
        rewrite adds an interval bound on the watermarked columns, and
        Spark derives the state-eviction threshold from it — without this
        an unbounded 24×7 topology accumulates state forever (the KSQL
        analog is JoinWindows retention, reference
        StreamStreamJoinIntegrationTest.java:82)."""
        cols = {c.lower(): c for c in df.columns}
        out = df
        if "rowkey" not in cols:
            key_src = meta.key_col if meta.key_col in cols else None
            out = out.withColumn(
                "rowkey",
                F.col(cols[key_src]).cast("string") if key_src else F.lit(None).cast("string"))
        if "rowtime" not in cols:
            ts_src = None
            for cand in ((meta.timestamp_col,) if meta.timestamp_col else ()) + ("ts", "timestamp"):
                if cand in cols:
                    ts_src = cols[cand]
                    break
            if ts_src and dict(df.dtypes)[ts_src].startswith("timestamp"):
                rowtime = (F.unix_micros(F.col(ts_src).cast("timestamp")) / 1000).cast("bigint")
            elif ts_src:
                rowtime = F.col(ts_src).cast("bigint")
            else:
                rowtime = F.lit(None).cast("bigint")
            out = out.withColumn("rowtime", rowtime)
        if out.isStreaming and "rowtime_ts" not in cols:
            out = (out.withColumn("rowtime_ts",
                                  F.timestamp_millis(F.col("rowtime")))
                   .withWatermark("rowtime_ts", meta.watermark))
        return out

    # -- CREATE STREAM out AS SELECT ... (CSAS) ------------------------------

    def _csas(self, m: re.Match) -> DataFrame:
        from kafka_connect_streams_spark.functions import rewrite_ksql_sql
        kind = m.group(1).lower()
        name = m.group(2).lower()
        if name in self.metastore:
            raise ValueError(
                f"CREATE {kind.upper()} {name}: relation already exists")
        props = _parse_props(m.group("props"))
        select = m.group("select")
        # KSQL's re-key clause: SELECT ... FROM s [WHERE ...] PARTITION BY c
        # — the CSAS spelling of selectKey (P4): the result stream's ROWKEY
        # becomes the named column (stringified, §1.4), which is what decides
        # the shuffle/partitioning of every downstream stateful op.
        pb = re.search(r"\bPARTITION\s+BY\s+(\w+)\s*$", select,
                       re.IGNORECASE)
        key_override = None
        if pb:
            key_override = pb.group(1).lower()
            select = select[:pb.start()]
        if kind == "table" and not self._is_table_result(select):
            # KSQL 5.1: CREATE TABLE AS requires an aggregation or a TABLE
            # source — a plain stream SELECT has no per-key latest semantics
            raise ValueError(
                f"CREATE TABLE {name} AS requires a GROUP BY aggregation "
                "or a TABLE source (stream/table duality)")
        df = self.spark.sql(rewrite_ksql_sql(select))
        if key_override:
            df = df.withColumn("rowkey",
                               F.col(key_override).cast("string"))
        # WITH (timestamp='col'): rebind the stream's event time (F10)
        ts_col = props.get("timestamp", "").lower()
        if ts_col:
            df = df.withColumn(
                "rowtime", F.col(ts_col).cast("bigint"))
        df.createOrReplaceTempView(name)
        self.frames[name] = df
        self.metastore[name] = StreamMeta(
            name=name, topic=name,
            value_format=props.get("value_format", "json").lower(),
            key_col=key_override or props.get("key", "").lower() or None,
            timestamp_col=ts_col or None,
            columns=dict(df.dtypes),
            kind=kind)
        return df

    def _is_table_result(self, select: str) -> bool:
        """A CTAS result is a table iff the SELECT aggregates (GROUP BY) or
        every FROM source is itself a registered TABLE."""
        if re.search(r"\bGROUP\s+BY\b", select, re.IGNORECASE):
            return True
        sources = re.findall(r"\b(?:FROM|JOIN)\s+(\w+)", select,
                             re.IGNORECASE)
        return bool(sources) and all(
            self.metastore.get(s.lower()) is not None
            and self.metastore[s.lower()].kind == "table" for s in sources)

    # -- CREATE SOURCE/SINK CONNECTOR ---------------------------------------
    # ksqlDB's connector-management DDL bound to this repo's Connect layer:
    # a SOURCE connector wraps sources/table_poll.py (the JDBC source
    # connector equivalent — ConnectSourceConsumer.java:550-630) and
    # registers its topic as a queryable STREAM; a SINK connector binds a
    # registered relation to a parquet/JDBC put target (sinks.py batch-put
    # contract, ConnectSinkTask put/flush). Statement shapes follow ksqlDB
    # (CREATE [SOURCE|SINK] CONNECTOR name WITH ('k'='v', ...); SHOW
    # CONNECTORS; DESCRIBE CONNECTOR; DROP CONNECTOR).

    def _create_connector(self, m: re.Match) -> None:
        ctype = m.group(1).lower()
        name = m.group(2).lower()
        if name in self.connectors:
            if re.search(r"\bIF\s+NOT\s+EXISTS\b", m.string, re.IGNORECASE):
                return None
            raise ValueError(
                f"CREATE CONNECTOR {name}: connector already exists")
        props = _parse_connector_props(m.group("props"))
        clazz = props.get("connector.class", "")
        if ctype == "source":
            if "jdbcsource" not in clazz.lower().replace(".", "") \
                    and "tablepoll" not in clazz.lower():
                raise ValueError(
                    f"CREATE SOURCE CONNECTOR {name}: unsupported class "
                    f"{clazz!r} (JdbcSourceConnector / TablePollSource)")
            from kafka_connect_streams_spark.sources.table_poll import (
                TablePollSource, jdbc_reader, parquet_dir_reader)
            table = props.get("table.whitelist", props.get("table", ""))
            if not table:
                raise ValueError(
                    f"CREATE SOURCE CONNECTOR {name}: table.whitelist "
                    "required")
            if "path" in props:
                reader = parquet_dir_reader(props["path"])
            elif "connection.url" in props:
                reader = jdbc_reader(props["connection.url"], table)
            else:
                raise ValueError(
                    f"CREATE SOURCE CONNECTOR {name}: need 'path' (file "
                    "table) or 'connection.url' (JDBC)")
            poll = TablePollSource(
                reader,
                mode=props.get("mode", "bulk"),
                inc_col=props.get("incrementing.column.name", "id"),
                checkpoint=props.get("checkpoint") or None,
                # ksqlDB/Connect backpressure knob → ST6 cap
                max_rows_per_poll=(int(props["max.poll.rows"])
                                   if "max.poll.rows" in props else None))
            topic = props.get("topic.prefix", "") + table
            # the topic keeps its Kafka spelling; the registered STREAM
            # needs a valid SQL identifier (ksqlDB names them apart too)
            stream = re.sub(r"\W", "_", topic.lower())
            df = reader(self.spark)
            meta = StreamMeta(
                name=stream, topic=topic.lower(),
                value_format=props.get("value_format", "json").lower(),
                key_col=None, columns=dict(df.dtypes), kind="stream")
            df.createOrReplaceTempView(stream)
            self.metastore[stream] = meta
            self.frames[stream] = df
            self.connectors[name] = ConnectorMeta(
                name=name, ctype=ctype, clazz=clazz, props=props,
                topic=stream, poll=poll)
        else:
            if "jdbcsink" not in clazz.lower().replace(".", "") \
                    and "parquet" not in clazz.lower():
                raise ValueError(
                    f"CREATE SINK CONNECTOR {name}: unsupported class "
                    f"{clazz!r} (JdbcSinkConnector / parquet)")
            topics = props.get("topics", "")
            if topics.lower() not in self.frames:
                raise ValueError(
                    f"CREATE SINK CONNECTOR {name}: unknown topic/stream "
                    f"{topics!r}")
            if "path" not in props:
                raise ValueError(
                    f"CREATE SINK CONNECTOR {name}: 'path' required")
            self.connectors[name] = ConnectorMeta(
                name=name, ctype=ctype, clazz=clazz, props=props,
                topic=topics.lower())
        return None

    def start_connector(self, name: str, deliver=None,
                        trigger_seconds: float = 0.5):
        """Run a SOURCE connector's poll loop (TablePollSource.start).

        Deliver resolution: an explicit ``deliver=`` wins; else, if the
        connector props name a ``sink.path``, the PRODUCTION default —
        each delta lands in that parquet dir as an epoch partition via
        dynamic overwrite, so a re-delivered epoch (foreachBatch crash-
        before-commit) rewrites instead of duplicating, and no data rows
        pass through the driver; else the interactive REPL fallback that
        folds each delta into the registered in-session frame (collect
        is the micro-batch bridge there, bounded by the connector's
        ``max.poll.rows``)."""
        meta = self.connectors.get(name.lower())
        if meta is None or meta.ctype != "source":
            raise ValueError(f"start_connector: no source connector "
                             f"{name!r}")
        sink_path = meta.props.get("sink.path")

        def parquet_deliver(batch: DataFrame, epoch: int) -> None:
            if batch.isEmpty():      # O(1) probe, not a row transfer
                return
            (batch.withColumn("epoch", F.lit(epoch).cast("bigint"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch").parquet(sink_path))

        def default_deliver(batch: DataFrame, _epoch: int) -> None:
            # interactive-context fallback: fold each delta into the
            # registered in-session frame (collect is the micro-batch
            # bridge — deltas are poll-sized, bounded by the connector's
            # max_rows_per_poll).
            rows = batch.collect()
            if not rows:
                return
            add = self.spark.createDataFrame(rows, batch.schema)
            cur = self.frames[meta.topic].unionByName(add)
            cur.createOrReplaceTempView(meta.topic)
            self.frames[meta.topic] = cur

        if deliver is None:
            deliver = parquet_deliver if sink_path else default_deliver
        meta.query = meta.poll.start(
            self.spark, deliver, trigger_seconds=trigger_seconds)
        return meta.query

    def flush_connector(self, name: str) -> int:
        """Run a SINK connector's batch put: write the bound relation's
        current rows to the target path (idempotent overwrite per flush —
        the put/flush contract of ConnectSinkTask)."""
        meta = self.connectors.get(name.lower())
        if meta is None or meta.ctype != "sink":
            raise ValueError(f"flush_connector: no sink connector {name!r}")
        df = self.frames[meta.topic]
        df.write.mode("overwrite").parquet(meta.props["path"])
        return df.count()

    def _show_connectors(self) -> DataFrame:
        rows = [(c.name, c.ctype.upper(), c.clazz,
                 "RUNNING" if (c.query is not None and c.query.isActive)
                 else "REGISTERED")
                for c in self.connectors.values()]
        return self.spark.createDataFrame(
            rows, "name string, type string, class string, state string")

    def _describe_connector(self, m: re.Match) -> DataFrame:
        name = m.group(1).lower()
        c = self.connectors.get(name)
        if c is None:
            raise ValueError(f"DESCRIBE CONNECTOR {name}: unknown connector")
        rows = ([("name", c.name), ("type", c.ctype.upper()),
                 ("topic", c.topic)]
                + sorted(c.props.items()))
        return self.spark.createDataFrame(rows, "prop string, value string")

    def _show_topics(self) -> DataFrame:
        """``SHOW TOPICS``: the topics this context knows about — every
        registered relation's backing topic (ksqlDB lists the broker's
        topics; without a broker, the metastore IS the topic registry)."""
        rows = sorted({(meta.topic, meta.kind)
                       for meta in self.metastore.values()})
        return self.spark.createDataFrame(
            rows, "kafka_topic string, kind string")

    def _explain(self, body: str) -> DataFrame:
        """``EXPLAIN <name | query>``: the physical plan ksqlDB prints
        for a persistent query — here the Catalyst executed plan of the
        registered relation (by name) or of the ad-hoc query."""
        from kafka_connect_streams_spark.functions import rewrite_ksql_sql
        name = body.strip().rstrip(";").strip().lower()
        if name in self.frames:
            df = self.frames[name]
        else:
            df = self.spark.sql(rewrite_ksql_sql(body.rstrip(";")))
        plan = df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        return self.spark.createDataFrame(
            [(line,) for line in plan.splitlines() if line.strip()],
            "plan_line string")

    def _drop_connector(self, m: re.Match, statement: str) -> None:
        name = m.group(1).lower()
        c = self.connectors.get(name)
        if c is None:
            if re.search(r"\bIF\s+EXISTS\b", statement, re.IGNORECASE):
                return None
            raise ValueError(f"DROP CONNECTOR {name}: unknown connector")
        if c.query is not None and c.query.isActive:
            c.query.stop()
        # ksqlDB parity: dropping the connector leaves the topic/stream
        # registered — data already produced stays queryable
        del self.connectors[name]
        return None


@dataclass
class ConnectorMeta:
    """What ksqlDB's connector registry tracks per connector."""
    name: str
    ctype: str                      # "source" | "sink"
    clazz: str
    props: dict[str, str]
    topic: str
    poll: object | None = None      # TablePollSource for sources
    query: object | None = None     # running StreamingQuery handle


def _parse_connector_props(s: str) -> dict[str, str]:
    """ksqlDB connector WITH props: quoted keys AND values
    ('connector.class'='...', 'mode'='incrementing')."""
    out: dict[str, str] = {}
    for part in re.findall(r"'([^']+)'\s*=\s*'([^']*)'", s or ""):
        out[part[0].strip().lower()] = part[1]
    return out


_CREATE_CONNECTOR_RE = re.compile(
    r"^\s*CREATE\s+(SOURCE|SINK)\s+CONNECTOR\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(\w+)\s+WITH\s*\((?P<props>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)
_SHOW_CONNECTORS_RE = re.compile(
    r"^\s*(?:SHOW|LIST)\s+CONNECTORS\s*;?\s*$", re.IGNORECASE)
_DROP_CONNECTOR_RE = re.compile(
    r"^\s*DROP\s+CONNECTOR\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*$",
    re.IGNORECASE)
_DESCRIBE_CONNECTOR_RE = re.compile(
    r"^\s*DESCRIBE\s+CONNECTOR\s+(\w+)\s*;?\s*$", re.IGNORECASE)
_SHOW_TOPICS_RE = re.compile(
    r"^\s*(?:SHOW|LIST)\s+TOPICS\s*;?\s*$", re.IGNORECASE)
_EXPLAIN_RE = re.compile(
    r"^\s*EXPLAIN\s+(?P<body>.+?);?\s*$", re.IGNORECASE | re.DOTALL)
