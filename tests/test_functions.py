"""KSQL builtin-function surface: programmatic registry + SQL rewriting."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_streams_spark.functions import KSQL_FUNCTIONS, rewrite_ksql_sql
from kafka_connect_streams_spark.sql.ksql import KsqlContext


class TestRegistry:
    def _one(self, spark, col_expr, expected):
        got = spark.range(1).select(col_expr.alias("v")).collect()[0].v
        assert got == expected, f"{got!r} != {expected!r}"

    def test_string_functions(self, spark):
        f = KSQL_FUNCTIONS
        self._one(spark, f["ucase"](F.lit("abc")), "ABC")
        self._one(spark, f["lcase"](F.lit("AbC")), "abc")
        self._one(spark, f["len"](F.lit("hello")), 5)
        self._one(spark, f["trim"](F.lit("  x  ")), "x")
        self._one(spark, f["substring"](F.lit("ORDER_6"), 7), "6")
        self._one(spark, f["substring"](F.lit("ORDER_6"), 1, 5), "ORDER")
        self._one(spark, f["concat"](F.lit("a"), F.lit("b")), "ab")
        self._one(spark, f["initcap"](F.lit("hello world")), "Hello World")
        self._one(spark, f["mask"](F.lit("Ab-3")), "xX-n".replace("xX", "Xx"))

    def test_numeric_functions(self, spark):
        f = KSQL_FUNCTIONS
        self._one(spark, f["abs"](F.lit(-3.5)), 3.5)
        self._one(spark, f["ceil"](F.lit(1.2)), 2)
        self._one(spark, f["floor"](F.lit(1.8)), 1)
        self._one(spark, f["round"](F.lit(1.25), 1), 1.3)
        self._one(spark, f["sign"](F.lit(-9)), -1.0)

    def test_null_and_json(self, spark):
        f = KSQL_FUNCTIONS
        self._one(spark, f["ifnull"](F.lit(None).cast("string"), F.lit("d")), "d")
        self._one(spark, f["nullif"](F.lit("a"), F.lit("a")), None)
        self._one(spark, f["extractjsonfield"](F.lit('{"k": 87}'), "$.k"), "87")

    def test_array_functions(self, spark):
        f = KSQL_FUNCTIONS
        arr = F.array(F.lit(1.0), F.lit(2.0))
        self._one(spark, f["arraycontains"](arr, F.lit(2.0)), True)
        self._one(spark, f["arraylength"](arr), 2)

    def test_time_functions(self, spark):
        f = KSQL_FUNCTIONS
        ms = 1_700_000_000_000
        s = spark.range(1).select(
            f["timestamptostring"](F.lit(ms), "yyyy-MM-dd HH:mm:ss").alias("s")
        ).collect()[0].s
        assert s == "2023-11-14 22:13:20"  # UTC session timezone
        back = spark.range(1).select(
            f["stringtotimestamp"](F.lit(s), "yyyy-MM-dd HH:mm:ss").alias("ms")
        ).collect()[0].ms
        assert back == ms

    def test_topk_aggregate(self, spark):
        df = spark.createDataFrame([(1,), (5,), (3,), (5,)], "v int")
        got = df.agg(KSQL_FUNCTIONS["topk"](F.col("v"), 2).alias("t")).collect()[0].t
        assert got == [5, 5]
        got = df.agg(KSQL_FUNCTIONS["topkdistinct"](F.col("v"), 2).alias("t")
                     ).collect()[0].t
        assert got == [5, 3]

    def test_histogram_aggregate(self, spark):
        """KSQL HISTOGRAM(col): per-group value -> count map (ksql 5.1
        function reference); here an in-row count fold, incl. the
        empty-group and grouped forms."""
        df = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("a", "x"), ("b", "z")], "g string, v string")
        got = {r.g: r.h for r in
               df.groupBy("g")
               .agg(KSQL_FUNCTIONS["histogram"](F.col("v")).alias("h"))
               .collect()}
        assert got == {"a": {"x": 2, "y": 1}, "b": {"z": 1}}
        empty = (df.filter("g = 'nope'")
                 .agg(KSQL_FUNCTIONS["histogram"](F.col("v")).alias("h"))
                 .collect()[0].h)
        assert empty == {}


class TestSqlRewrite:
    def test_rewrites_only_function_calls(self):
        sql = "SELECT UCASE(itemid), len FROM t WHERE LEN(name) > 2"
        out = rewrite_ksql_sql(sql)
        assert "upper(itemid)" in out
        assert "length(name) > 2" in out
        assert ", len FROM" in out  # bare column named len untouched

    def test_expands_ksql_only_functions(self):
        """KSQL-only spellings (no Spark SQL equivalent by rename)
        expand into Spark SQL expression templates: nested args survive
        (balanced-paren scan), inner KSQL calls expand on later passes,
        and GEO_DISTANCE validates its unit at rewrite time."""
        import pytest

        out = rewrite_ksql_sql(
            "SELECT MASK(CONCAT(CONCAT(a, '#'), b)) AS m FROM t")
        assert "regexp_replace" in out
        assert "'[^\\\\p{Lu}\\\\p{Ll}\\\\p{Nd}]', '-'" in out
        assert "CONCAT(CONCAT(a, '#'), b)" in out  # args verbatim
        out = rewrite_ksql_sql(
            "SELECT STRINGTODATE(DATETOSTRING(CAST(k AS INT),"
            " 'yyyy-MM-dd'), 'yyyy-MM-dd') FROM t")
        assert "datediff(to_date(date_format(date_add(" in out.replace(
            " ", "")[:60] or "datediff" in out and "date_format" in out
        out = rewrite_ksql_sql("SELECT TOPK(v, 3), HISTOGRAM(s) FROM t")
        assert "sort_array(collect_list(v), false)" in out
        assert "map_concat" in out
        out = rewrite_ksql_sql(
            "SELECT GEO_DISTANCE(a, b, c, d, 'Miles') FROM t")
        assert "3959.0" in out and "asin" in out
        with pytest.raises(ValueError, match="GEO_DISTANCE unit"):
            rewrite_ksql_sql("SELECT GEO_DISTANCE(a, b, c, d, 'au') FROM t")
        with pytest.raises(ValueError, match="unbalanced"):
            rewrite_ksql_sql("SELECT MASK(CONCAT(a, b FROM t")

    def test_mask_expansion_matches_registry_builder(self, spark):
        """The SQL template and the Column builder must mask
        identically — including the 'other' class AND ksql's optional
        custom mask-char arguments (review finding: the SQL path
        silently dropped them) — so the SQL front end and the DataFrame
        API never diverge."""
        df = spark.createDataFrame([("Ab 1@c#D-9",)], "s string")
        df.createOrReplaceTempView("mask_parity_t")
        row = spark.sql(rewrite_ksql_sql(
            "SELECT MASK(s) AS m, MASK(s, 'A', 'z', '9', '_') AS c,"
            " MASK(s, NULL, 'x', 'n', '-') AS ku,"
            " MASK_KEEP_LEFT(s, 3, 'Q', 'q', '0', '.') AS kl"
            " FROM mask_parity_t")).collect()[0]
        col = df.select(
            KSQL_FUNCTIONS["mask"](F.col("s")).alias("m"),
            KSQL_FUNCTIONS["mask"](F.col("s"), "A", "z", "9", "_")
            .alias("c"),
            KSQL_FUNCTIONS["mask"](F.col("s"), None, "x", "n", "-")
            .alias("ku")).collect()[0]
        assert row.m == col.m == "Xx-n-x-X-n"
        assert row.c == col.c == "Az_9_z_A_9"
        assert row.ku == col.ku == "Ax-n-x-D-n"
        assert row.kl == "Ab 0.q.Q.0"   # keeps "Ab ", custom-masks rest
        import pytest
        with pytest.raises(ValueError, match="single-character"):
            rewrite_ksql_sql("SELECT MASK(s, 'XX') FROM t")

    def test_mask_unicode_classes_match_ksql_character_semantics(self, spark):
        """r12 ADVICE: ksql 5.1's MaskKudf classifies via
        Character.isUpperCase/isLowerCase/isDigit, so 'É' masks as
        upper and 'ß' as lower — the old ASCII [A-Z]/[a-z]/[0-9]
        classes sent both to 'other'. All three spellings (SQL
        template, Column builder, DuckDB oracle form) must agree on
        non-ASCII input; Arabic-Indic ٣ is a Unicode Nd digit."""
        import duckdb
        s = "Éß١a Z-٣"
        expect = "Xxnx-X-n"
        df = spark.createDataFrame([(s,)], "s string")
        df.createOrReplaceTempView("mask_uni_t")
        row = spark.sql(rewrite_ksql_sql(
            "SELECT MASK(s) AS m, MASK(s, 'A', 'z', '9', '_') AS c"
            " FROM mask_uni_t")).collect()[0]
        col = df.select(
            KSQL_FUNCTIONS["mask"](F.col("s")).alias("m"),
            KSQL_FUNCTIONS["mask"](F.col("s"), "A", "z", "9", "_")
            .alias("c")).collect()[0]
        assert row.m == col.m == expect
        assert row.c == col.c == "Az9z_A_9"
        from kafka_connect_streams_spark.queries import _DUCK_MASK
        con = duckdb.connect()
        got = con.sql("SELECT " + _DUCK_MASK.format(c=f"'{s}'")).fetchone()[0]
        assert got == expect

    def test_mask_custom_quote_backslash_chars_are_escaped(self, spark):
        """Review finding: a custom mask char of ' or \\ must splice
        into the translate() literal escaped — not emit malformed SQL
        or silently delete the 'other' class — and ksql's doubled-quote
        spelling for a quote char parses. The Column-registry
        mask_keep family forwards custom chars too (it rejected them
        while the SQL path accepted them)."""
        df = spark.createDataFrame([("Ab 1x",)], "s string")
        df.createOrReplaceTempView("mask_esc_t")
        row = spark.sql(rewrite_ksql_sql(
            "SELECT MASK(s, '''', 'x', 'n', '-') AS q,"
            " MASK(s, '\\\\', 'x', 'n', '-') AS bs"
            " FROM mask_esc_t")).collect()[0]
        assert row.q == "'x-nx" and row.bs == "\\x-nx"
        col = df.select(
            KSQL_FUNCTIONS["mask_keep_left"](F.col("s"), 2, "Q", "q",
                                             "0", ".").alias("kl"),
            KSQL_FUNCTIONS["mask_right"](F.col("s"), 3, None, "z",
                                         "7", "_").alias("mr")).collect()[0]
        assert col.kl == "Ab.0q"
        assert col.mr == "Ab_7z"

    def test_rewriter_handles_backslash_escaped_quotes(self):
        """Review finding: 'don\\'t' closes at the REAL quote — a call
        after such a literal must still expand, and call-shaped text
        INSIDE it stays data."""
        sql = ("SELECT MASK(a) FROM t WHERE n = 'don\\'t len(x)'"
               " AND m = MASK(b)")
        out = rewrite_ksql_sql(sql)
        assert "'don\\'t len(x)'" in out
        assert out.count("regexp_replace") >= 8  # BOTH calls expanded
        assert "MASK(" not in out.upper().replace("_", "")

    def test_rewriter_leaves_string_literals_alone(self):
        """Review finding: a data value mentioning mask(/topk(/len( in a
        string literal must never be rewritten (or fail the paren
        scan) — only calls OUTSIDE quotes expand."""
        sql = "SELECT MASK(s) FROM t WHERE note = 'please mask(this) ok'"
        out = rewrite_ksql_sql(sql)
        assert "'please mask(this) ok'" in out
        assert "regexp_replace" in out          # the real call expanded
        # unbalanced parens INSIDE a literal are data, not an error
        out = rewrite_ksql_sql("SELECT x FROM t WHERE n = 'mask( open'")
        assert out == "SELECT x FROM t WHERE n = 'mask( open'"
        # the rename pass obeys the same rule
        out = rewrite_ksql_sql("SELECT LEN(s) FROM t WHERE n = 'len(a)'")
        assert "length(s)" in out and "'len(a)'" in out

    def test_rewriter_validates_arity(self):
        """Review finding: wrong arg counts must raise a clear message,
        not a raw unpack/IndexError."""
        import pytest
        with pytest.raises(ValueError, match="GEO_DISTANCE takes 4-5"):
            rewrite_ksql_sql("SELECT GEO_DISTANCE(a, b, c) FROM t")
        with pytest.raises(ValueError, match="TOPK takes 2"):
            rewrite_ksql_sql("SELECT TOPK(v) FROM t")
        with pytest.raises(ValueError, match="MASK_KEEP_LEFT takes 2-6"):
            rewrite_ksql_sql("SELECT MASK_KEEP_LEFT(s) FROM t")
        with pytest.raises(ValueError, match="HISTOGRAM takes 1"):
            rewrite_ksql_sql("SELECT HISTOGRAM(a, b) FROM t")

    def test_ksql_spellings_run_through_context(self, spark):
        orders = spark.createDataFrame(
            [(1, "item_1")], "id bigint, itemid string")
        ctx = KsqlContext(spark, resolver=lambda t: orders)
        ctx.sql("CREATE STREAM s (ID bigint, ITEMID varchar) "
                "WITH (kafka_topic='x', key='id')")
        row = ctx.sql("SELECT UCASE(itemid) AS u, LEN(itemid) AS n FROM s").collect()[0]
        assert (row.u, row.n) == ("ITEM_1", 6)


class TestMaskAndGeo:
    def test_mask_family(self, spark):
        """ksql 5.1 PII-mask family: MASK_KEEP_LEFT/RIGHT keep n chars
        clear, MASK_LEFT/RIGHT mask only n chars; short strings mask by
        their own length (Column-valued split points)."""
        from kafka_connect_streams_spark.functions.ksql_functions import (
            KSQL_FUNCTIONS as KF)
        df = spark.createDataFrame([("Ab1-xy",), ("Z9",)], "s string")
        c = F.col("s")
        got = df.select(
            KF["mask"](c).alias("m"),
            KF["mask_keep_left"](c, 2).alias("kl"),
            KF["mask_keep_right"](c, 2).alias("kr"),
            KF["mask_left"](c, 2).alias("ml"),
            KF["mask_right"](c, 2).alias("mr")).collect()
        assert (got[0].m, got[0].kl, got[0].kr, got[0].ml, got[0].mr) == (
            "Xxn-xx", "Abn-xx", "Xxn-xy", "Xx1-xy", "Ab1-xx")
        # 2-char string: keep-left 2 keeps everything; mask-right 2
        # masks everything
        assert (got[1].kl, got[1].kr, got[1].ml, got[1].mr) == (
            "Z9", "Z9", "Xn", "Xn")

    def test_mask_other_chars_and_custom_masks(self, spark):
        """r11 ADVICE: ksql 5.1 MASK replaces non-alphanumeric 'other'
        chars with '-' (the old fixture only used '-' itself, hiding the
        gap) — '@', space and '#' must all mask. Custom per-class mask
        chars are the ksql optional arguments; an ALPHANUMERIC custom
        mask char must not be re-masked by a later class pass, and a
        None class stays clear without falling into 'other'."""
        from kafka_connect_streams_spark.functions.ksql_functions import (
            KSQL_FUNCTIONS as KF)
        df = spark.createDataFrame([("Ab 1@c#D",)], "s string")
        c = F.col("s")
        got = df.select(
            KF["mask"](c).alias("m"),
            KF["mask"](c, "A", "z", "9", "_").alias("custom"),
            KF["mask"](c, None, "x", "n", "-").alias("keep_upper"),
            KF["mask_keep_left"](c, 3).alias("kl")).collect()[0]
        assert got.m == "Xx-n-x-X"
        assert got.custom == "Az_9_z_A"       # 'A'/'z'/'9' never re-masked
        assert got.keep_upper == "Ax-n-x-D"   # uppers survive, not '-'
        assert got.kl == "Ab n-x-X"  # keeps "Ab ", masks "1@c#D"
        import pytest
        with pytest.raises(ValueError, match="single character"):
            df.select(KF["mask"](c, "XX").alias("bad"))

    def test_geo_distance_unit_aliases(self, spark):
        """r11 ADVICE: unit handling is case-insensitive over the ksql
        alias set (km/kilometers/mi/miles) and raises on anything else
        ('KM' silently returned miles before)."""
        import pytest
        from kafka_connect_streams_spark.functions.ksql_functions import (
            KSQL_FUNCTIONS as KF)
        df = spark.createDataFrame(
            [(48.8566, 2.3522, 51.5074, -0.1278)],
            "la1 double, lo1 double, la2 double, lo2 double")
        args = (F.col("la1"), F.col("lo1"), F.col("la2"), F.col("lo2"))
        row = df.select(
            KF["geo_distance"](*args, "KM").alias("km_upper"),
            KF["geo_distance"](*args, "kilometers").alias("km_long"),
            KF["geo_distance"](*args, "Miles").alias("mi_mixed"),
            KF["geo_distance"](*args, "MI").alias("mi_short")).collect()[0]
        assert 340 < row.km_upper < 348 and row.km_upper == row.km_long
        assert 211 < row.mi_mixed < 216 and row.mi_mixed == row.mi_short
        with pytest.raises(ValueError, match="GEO_DISTANCE unit"):
            df.select(KF["geo_distance"](*args, "parsecs"))

    def test_geo_distance(self, spark):
        """Haversine sanity: Paris->London ~343-344 km, ~213-214 miles;
        zero distance for identical points."""
        from kafka_connect_streams_spark.functions.ksql_functions import (
            KSQL_FUNCTIONS as KF)
        df = spark.createDataFrame(
            [(48.8566, 2.3522, 51.5074, -0.1278)],
            "la1 double, lo1 double, la2 double, lo2 double")
        km, mi, zero = df.select(
            KF["geo_distance"](F.col("la1"), F.col("lo1"),
                               F.col("la2"), F.col("lo2")).alias("km"),
            KF["geo_distance"](F.col("la1"), F.col("lo1"),
                               F.col("la2"), F.col("lo2"),
                               "miles").alias("mi"),
            KF["geo_distance"](F.col("la1"), F.col("lo1"),
                               F.col("la1"), F.col("lo1")).alias("z"),
        ).collect()[0]
        assert 340 < km < 348 and 211 < mi < 216
        assert zero == 0.0

    def test_date_functions_roundtrip(self, spark):
        """KSQL DATE = int days since epoch: STRINGTODATE/DATETOSTRING
        roundtrip, plus RANDOM/COLLECT_* presence (ksql 5.1 list)."""
        from kafka_connect_streams_spark.functions.ksql_functions import (
            KSQL_FUNCTIONS as KF)
        days, back = spark.range(1).select(
            KF["stringtodate"](F.lit("2023-11-14"),
                               "yyyy-MM-dd").alias("d"),
            KF["datetostring"](F.lit(19675), "yyyy-MM-dd").alias("s"),
        ).collect()[0]
        assert days == 19675 and back == "2023-11-14"
        r = spark.range(1).select(KF["random"]().alias("r")).collect()[0].r
        assert 0.0 <= r < 1.0
        df = spark.createDataFrame([(1,), (2,), (1,)], "v int")
        got = df.agg(
            F.sort_array(KF["collect_list"](F.col("v"))).alias("l"),
            F.sort_array(KF["collect_set"](F.col("v"))).alias("s"),
        ).collect()[0]
        assert got.l == [1, 1, 2] and got.s == [1, 2]
