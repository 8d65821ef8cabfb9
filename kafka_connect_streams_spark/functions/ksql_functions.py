"""KSQL builtin functions → Spark Column expressions.

Two layers:

- ``KSQL_FUNCTIONS``: programmatic registry ``name → Column-builder`` for the
  DataFrame API (all JVM expressions — codegen-able, no Python UDFs);
- ``rewrite_ksql_sql``: KSQL spelling → Spark SQL spelling rewriter used by
  the SQL front end (sql/ksql.py), so ``SELECT UCASE(ITEMID) ...`` parses.

Function list follows the public KSQL 5.1 function reference (the engine the
reference embeds, pom.xml:55-59); names Spark shares (ABS, CONCAT, TRIM, ...)
pass through untouched.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- programmatic registry ---------------------------------------------------


def _mask_all(c: Column, upper: str | None = "X", lower: str | None = "x",
              digit: str | None = "n", other: str | None = "-") -> Column:
    """ksql 5.1 MASK char classes: upper→'X', lower→'x', digit→'n',
    everything else→'-' (r11 ADVICE: the 'other' class was previously
    left unmasked). The four optional arguments are ksql's custom
    single-char masks; passing ``None`` leaves that class unmasked.

    Char classes are UNICODE (``\\p{Lu}``/``\\p{Ll}``/``\\p{Nd}``), not
    ASCII ranges, matching ksql's MaskKudf which classifies via
    ``Character.isUpperCase/isLowerCase/isDigit`` — 'É' masks as upper
    and 'ß' as lower exactly as the embedded 5.1 engine does (r12
    ADVICE: the ASCII spelling sent both to 'other'). The category
    properties are the standard approximation: ``Character.isUpperCase``
    also admits a handful of titlecase/Other_Uppercase code points that
    ``\\p{Lu}`` does not — no real PII text contains them.

    Each class is first replaced with a private-use sentinel and the
    sentinels translated to the mask chars at the end, so an
    alphanumeric CUSTOM mask char (e.g. upper→'a') is never re-masked
    by a later class pass. Input text containing U+E000–U+E003 (private
    use area) would collide with the sentinels — not a real-text risk.
    """
    s = "\ue000\ue001\ue002\ue003"
    # the 'other' class excludes the alnum classes explicitly so that a
    # class disabled via None survives instead of falling into 'other'
    classes = [(r"\p{Lu}", upper, s[0]), (r"\p{Ll}", lower, s[1]),
               (r"\p{Nd}", digit, s[2]),
               (rf"[^{s[0]}{s[1]}{s[2]}\p{{Lu}}\p{{Ll}}\p{{Nd}}]",
                other, s[3])]
    out, frm, to = c, "", ""
    for pat, mask, sent in classes:
        if mask is None:
            continue
        if not isinstance(mask, str) or len(mask) != 1:
            raise ValueError(
                f"MASK replacement must be a single character, got {mask!r}")
        out = F.regexp_replace(out, pat, sent)
        frm += sent
        to += mask
    return F.translate(out, frm, to) if frm else out


#: ksql GEO_DISTANCE unit aliases (case-insensitive) → earth radius
_GEO_RADIUS = {"km": 6371.0, "kilometers": 6371.0, "kilometres": 6371.0,
               "mi": 3959.0, "miles": 3959.0}


def _geo_distance(la1: Column, lo1: Column, la2: Column, lo2: Column,
                  unit: str = "km") -> Column:
    """GEO_DISTANCE(lat1, lon1, lat2, lon2[, unit]) — haversine on a
    spherical earth (ksql's formula). Unit aliases are case-insensitive
    (km/kilometers/mi/miles, the ksql alias set); anything else raises
    (r11 ADVICE: 'KM' silently returned miles before). Double trig:
    fine for the API surface; oracle use goes through fixed-point floor.
    """
    key = unit.lower() if isinstance(unit, str) else unit
    if key not in _GEO_RADIUS:
        raise ValueError(
            f"GEO_DISTANCE unit must be one of {sorted(_GEO_RADIUS)}"
            f" (case-insensitive), got {unit!r}")
    return F.lit(_GEO_RADIUS[key]) * 2 * F.asin(F.sqrt(
        F.pow(F.sin((F.radians(la2) - F.radians(la1)) / 2), 2)
        + F.cos(F.radians(la1)) * F.cos(F.radians(la2))
        * F.pow(F.sin((F.radians(lo2) - F.radians(lo1)) / 2), 2)))


def _headlen(c: Column, n: int) -> Column:
    """Chars before the last-n tail (0 when the string is shorter)."""
    return F.greatest(F.length(c) - F.lit(n), F.lit(0))


KSQL_FUNCTIONS: dict[str, Callable[..., Column]] = {
    # string
    "lcase": F.lower,
    "ucase": F.upper,
    "trim": F.trim,
    "concat": F.concat,
    "substring": lambda c, pos, length=0x7FFFFFFF: F.substring(c, pos, length),
    "len": F.length,
    "initcap": F.initcap,
    "replace": lambda c, find, repl: F.replace(c, F.lit(find), F.lit(repl)),
    "mask": _mask_all,
    # MASK_KEEP_LEFT / MASK_KEEP_RIGHT / MASK_LEFT / MASK_RIGHT: mask all
    # but (or only) the first/last n chars — the ksql PII-mask family.
    # F.substr takes Column positions, so the split point follows the
    # row's own length (short strings mask correctly). The *masks
    # varargs forward ksql's optional custom mask chars to _mask_all,
    # keeping the DataFrame API at parity with the SQL templates.
    "mask_keep_left": lambda c, n, *masks: F.concat(
        F.substr(c, F.lit(1), F.lit(n)),
        _mask_all(F.substr(c, F.lit(n + 1), F.length(c)), *masks)),
    "mask_keep_right": lambda c, n, *masks: F.concat(
        _mask_all(F.substr(c, F.lit(1), _headlen(c, n)), *masks),
        F.substr(c, _headlen(c, n) + 1, F.length(c))),
    "mask_left": lambda c, n, *masks: F.concat(
        _mask_all(F.substr(c, F.lit(1), F.lit(n)), *masks),
        F.substr(c, F.lit(n + 1), F.length(c))),
    "mask_right": lambda c, n, *masks: F.concat(
        F.substr(c, F.lit(1), _headlen(c, n)),
        _mask_all(F.substr(c, _headlen(c, n) + 1, F.length(c)), *masks)),
    "split": lambda c, sep: F.split(c, re.escape(sep)),
    "geo_distance": _geo_distance,
    # json (path must be a Python string — get_json_object takes a literal)
    "extractjsonfield": lambda c, path: F.get_json_object(c, path),
    # numeric
    "abs": F.abs,
    "ceil": F.ceil,
    "floor": F.floor,
    "round": F.round,
    "sign": F.signum,
    "sqrt": F.sqrt,
    # RANDOM() — nondeterministic by definition (seeded per-partition
    # RNG); present for surface parity, excluded from every oracle path
    # (the repo's reproducible-sampling ops use md5 hashes instead)
    "random": F.rand,
    # date (KSQL DATE = int days since epoch)
    "stringtodate": lambda c, fmt: F.datediff(
        F.to_date(c, _java_to_spark_fmt(fmt)), F.lit("1970-01-01")),
    "datetostring": lambda c, fmt: F.date_format(
        F.date_add(F.lit("1970-01-01"), c.cast("int")),
        _java_to_spark_fmt(fmt)),
    # null handling
    "ifnull": F.coalesce,
    "coalesce": F.coalesce,
    "nullif": F.nullif,
    # array / map
    "arraycontains": F.array_contains,
    "arraylength": F.size,
    "slice": F.slice,
    # time (KSQL works in epoch-ms longs; see ROWTIME, §1.4)
    "stringtotimestamp": lambda c, fmt: (
        F.unix_micros(F.to_timestamp(c, _java_to_spark_fmt(fmt))) / 1000
    ).cast("bigint"),
    "timestamptostring": lambda c, fmt: F.date_format(
        F.timestamp_micros((c * 1000).cast("bigint")), _java_to_spark_fmt(fmt)),
    # aggregates
    "topk": lambda c, k: F.slice(F.sort_array(F.collect_list(c), asc=False), 1, k),
    "topkdistinct": lambda c, k: F.slice(
        F.sort_array(F.collect_set(c), asc=False), 1, k),
    # KSQL HISTOGRAM(col) -> map<value, count>: a UDAF with map state in
    # ksql; here an in-row count fold over the group's collected values
    # (stays JVM-side). Fine for KSQL-typical low-cardinality columns;
    # for high-cardinality counting use a two-level groupBy instead.
    "histogram": lambda c: F.aggregate(
        F.sort_array(F.collect_list(c.cast("string"))),
        F.expr("cast(map() as map<string, bigint>)"),
        lambda m, x: F.map_concat(
            F.map_filter(m, lambda k, _: k != x),
            F.create_map(
                x, F.coalesce(F.element_at(m, x),
                              F.lit(0).cast("bigint")) + 1))),
    "count": F.count,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
}


def _java_to_spark_fmt(fmt: str) -> str:
    """KSQL uses java.text.SimpleDateFormat patterns; Spark uses
    DateTimeFormatter — the subset KSQL docs use is pattern-compatible."""
    return fmt


# -- SQL spelling rewriter ---------------------------------------------------

#: KSQL name → Spark SQL name (only where they differ)
_SQL_RENAMES = {
    "ucase": "upper",
    "lcase": "lower",
    "len": "length",
    "ifnull": "coalesce",
    "arraycontains": "array_contains",
    "arraylength": "size",
    "extractjsonfield": "get_json_object",
    "stringtotimestamp": "to_unix_timestamp",  # seconds; *1000 where ms needed
}

_FUNC_CALL = re.compile(
    r"\b(" + "|".join(sorted(_SQL_RENAMES, key=len, reverse=True)) + r")\s*\(",
    re.IGNORECASE)


def _lit_char(s: str) -> str | None:
    """Parse a MASK custom-char argument: a quoted single-character
    literal, or NULL (= leave that class unmasked, the ksql contract).
    SQL quote escapes are honored — '''' and '\\'' both mean a single
    quote char, '\\\\' a backslash."""
    t = s.strip()
    if t.upper() == "NULL":
        return None
    if len(t) >= 2 and t[0] == t[-1] and t[0] in "'\"":
        body = (t[1:-1].replace(t[0] * 2, t[0])
                .replace("\\" + t[0], t[0]).replace("\\\\", "\\"))
        if len(body) == 1:
            return body
    raise ValueError(
        "MASK replacement must be a single-character string literal or"
        f" NULL, got {s!r}")


def _sql_str(s: str) -> str:
    """A safe single-quoted Spark SQL string literal (backslash and
    quote escaped — a custom mask char of ' or \\ must not produce
    malformed or silently wrong SQL)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


_DEFAULT_MASKS = ("X", "x", "n", "-")


def _mask_sql(c: str, upper: str | None = "X", lower: str | None = "x",
              digit: str | None = "n", other: str | None = "-") -> str:
    """The Spark SQL spelling of ksql MASK.

    Default masks use plain nesting — safe because each pass's mask char
    ('X', 'x', 'n') belongs only to an already-processed class: the
    upper pass runs first, the 'n' introduced by the digit pass is never
    re-examined (regexp_replace does not rescan its replacements), and
    the final 'other' pass excludes all alphanumerics. CUSTOM masks go
    through the private-use-sentinel + translate form (the _mask_all
    Column builder's strategy), so an alphanumeric custom mask char is
    never re-masked by a later class pass and a None class stays clear.
    """
    if (upper, lower, digit, other) == _DEFAULT_MASKS:
        return ("regexp_replace(regexp_replace(regexp_replace("
                f"regexp_replace({c}, '\\\\p{{Lu}}', 'X'),"
                " '\\\\p{Ll}', 'x'), '\\\\p{Nd}', 'n'),"
                " '[^\\\\p{Lu}\\\\p{Ll}\\\\p{Nd}]', '-')")
    s = "\ue000\ue001\ue002\ue003"
    classes = [(r"\\p{Lu}", upper, s[0]), (r"\\p{Ll}", lower, s[1]),
               (r"\\p{Nd}", digit, s[2]),
               (rf"[^{s[0]}{s[1]}{s[2]}\\p{{Lu}}\\p{{Ll}}\\p{{Nd}}]",
                other, s[3])]
    out, frm, to = c, "", ""
    for pat, mask, sent in classes:
        if mask is None:
            continue
        if not isinstance(mask, str) or len(mask) != 1:
            raise ValueError(
                f"MASK replacement must be a single character, got {mask!r}")
        out = f"regexp_replace({out}, '{pat}', '{sent}')"
        frm += sent
        to += mask
    if not frm:
        return out
    return f"translate({out}, {_sql_str(frm)}, {_sql_str(to)})"


def _mask_customs(args: list[str]) -> tuple[str | None, ...]:
    """The optional per-class mask chars trailing a MASK-family call."""
    customs = tuple(_lit_char(x) for x in args)
    return customs + _DEFAULT_MASKS[len(customs):]


def _geo_sql(args: list[str]) -> str:
    la1, lo1, la2, lo2 = args[:4]
    unit = args[4].strip().strip("'\"").lower() if len(args) > 4 else "km"
    if unit not in _GEO_RADIUS:
        raise ValueError(
            f"GEO_DISTANCE unit must be one of {sorted(_GEO_RADIUS)}"
            f" (case-insensitive), got {unit!r}")
    return (f"({_GEO_RADIUS[unit]} * 2 * asin(sqrt("
            f"pow(sin((radians({la2}) - radians({la1})) / 2), 2)"
            f" + cos(radians({la1})) * cos(radians({la2}))"
            f" * pow(sin((radians({lo2}) - radians({lo1})) / 2), 2))))")


def _tail(c: str, head: str) -> str:
    """substring past a Column-valued head length (1-based)."""
    return f"substring({c}, {head} + 1)"


def _headlen_sql(c: str, n: str) -> str:
    return f"greatest(length({c}) - ({n}), 0)"


#: KSQL call → (min_args, max_args, Spark SQL expression template).
#: Arg strings are spliced verbatim, so nested KSQL calls inside
#: arguments are expanded by the fixpoint loop in :func:`_expand_calls`.
#: Templates must not emit any name present in this dict (or the loop
#: would never converge). The arity bounds produce a clear error
#: instead of a raw unpack/IndexError on a malformed call, and the
#: MASK-family templates HONOR ksql's optional custom mask-char
#: arguments (they were silently dropped before — the SQL front end
#: and the Column registry must never diverge).
#:
#: KNOWN RESTRICTION (r12 ADVICE): templates splice some argument text
#: MORE THAN ONCE (GEO_DISTANCE repeats each lat/lon 2-3×,
#: MASK_KEEP_RIGHT repeats its base 3×), so a non-deterministic or
#: expensive argument expression — RANDOM(), a subquery — is
#: re-evaluated per splice site and a non-deterministic one can
#: diverge between sites, unlike ksql's once-per-call evaluation.
#: Column references, literals and deterministic scalar expressions
#: (every spelling the test battery and the reference's own queries
#: use) are unaffected: Spark's subexpression elimination collapses
#: the duplicate deterministic subtrees at codegen. Binding repeated
#: args once would need a lateral/named_struct rewrite of every
#: template — deferred until a real query needs a volatile argument.
_SQL_EXPANSIONS: dict[str, tuple[int, int, Callable[[list[str]], str]]] = {
    "mask": (1, 5, lambda a: _mask_sql(a[0], *_mask_customs(a[1:]))),
    "mask_keep_left": (2, 6, lambda a: (
        f"concat(substring({a[0]}, 1, {a[1]}),"
        f" {_mask_sql(_tail(a[0], f'({a[1]})'), *_mask_customs(a[2:]))})")),
    "mask_keep_right": (2, 6, lambda a: (
        f"concat({_mask_sql(f'substring({a[0]}, 1, {_headlen_sql(a[0], a[1])})', *_mask_customs(a[2:]))},"
        f" {_tail(a[0], _headlen_sql(a[0], a[1]))})")),
    "mask_left": (2, 6, lambda a: (
        f"concat({_mask_sql(f'substring({a[0]}, 1, {a[1]})', *_mask_customs(a[2:]))},"
        f" {_tail(a[0], f'({a[1]})')})")),
    "mask_right": (2, 6, lambda a: (
        f"concat(substring({a[0]}, 1, {_headlen_sql(a[0], a[1])}),"
        f" {_mask_sql(_tail(a[0], _headlen_sql(a[0], a[1])), *_mask_customs(a[2:]))})")),
    "geo_distance": (4, 5, _geo_sql),
    # KSQL DATE = int days since epoch (registry convention above)
    "stringtodate": (2, 2, lambda a: (
        f"datediff(to_date({a[0]}, {a[1]}), date'1970-01-01')")),
    "datetostring": (2, 2, lambda a: (
        f"date_format(date_add(date'1970-01-01', cast({a[0]} as int)),"
        f" {a[1]})")),
    # aggregates
    "topk": (2, 2, lambda a: (
        f"slice(sort_array(collect_list({a[0]}), false), 1, {a[1]})")),
    "topkdistinct": (2, 2, lambda a: (
        f"slice(sort_array(collect_set({a[0]}), false), 1, {a[1]})")),
    "histogram": (1, 1, lambda a: (
        f"aggregate(sort_array(collect_list(cast({a[0]} as string))),"
        " cast(map() as map<string, bigint>),"
        " (m, x) -> map_concat(map_filter(m, (k, v) -> k != x),"
        " map(x, coalesce(element_at(m, x), cast(0 as bigint)) + 1)))")),
}

_EXPAND_CALL = re.compile(
    r"\b(" + "|".join(sorted(_SQL_EXPANSIONS, key=len, reverse=True))
    + r")\s*\(", re.IGNORECASE)


def _split_args(s: str) -> list[str]:
    """Split a call's argument text on TOP-LEVEL commas (paren- and
    quote-aware, so nested calls and string literals survive intact)."""
    args: list[str] = []
    cur: list[str] = []
    depth, quote, escaped = 0, None, False
    for ch in s:
        if quote:
            cur.append(ch)
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def _quoted_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of string literals. Doubled-quote escapes
    read naturally as adjacent literals — still inside a span — and
    backslash escapes ('don\\'t', Spark's default) skip the escaped
    char so the literal closes at the REAL closing quote (otherwise
    everything after it sits in a phantom span and calls there are
    silently left unrewritten)."""
    spans, quote, start = [], None, 0
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if quote:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                spans.append((start, i + 1))
                quote = None
        elif ch in "'\"":
            quote, start = ch, i
        i += 1
    if quote:
        spans.append((start, n))
    return spans


def _search_outside_quotes(pat: re.Pattern, sql: str):
    """First match of ``pat`` whose start is NOT inside a string
    literal — a data value mentioning ``mask(``/``topk(`` must never be
    rewritten (or worse, fail the paren scan)."""
    spans = _quoted_spans(sql)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if m is None or not any(a <= m.start() < b for a, b in spans):
            return m
        pos = m.start() + 1


def _expand_calls(sql: str) -> str:
    """Expand KSQL-only function calls into Spark SQL expressions.

    Finds the next expandable call OUTSIDE string literals, scans its
    balanced-paren argument list (quote-aware), validates arity,
    splices in the template, and repeats to a fixpoint — so nested and
    repeated calls all expand. Templates keep argument text verbatim;
    inner KSQL calls expand on a later pass.
    """
    while True:
        m = _search_outside_quotes(_EXPAND_CALL, sql)
        if m is None:
            return sql
        depth, i, quote = 1, m.end(), None
        while depth and i < len(sql):
            ch = sql[i]
            if quote:
                if ch == "\\":
                    i += 2
                    continue
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(
                f"unbalanced parentheses in {m.group(1)}(... call")
        name = m.group(1).lower()
        lo, hi, template = _SQL_EXPANSIONS[name]
        args = _split_args(sql[m.end():i - 1])
        if not lo <= len(args) <= hi:
            bound = str(lo) if lo == hi else f"{lo}-{hi}"
            raise ValueError(
                f"{name.upper()} takes {bound} argument(s),"
                f" got {len(args)}")
        sql = sql[:m.start()] + template(args) + sql[i:]


def rewrite_ksql_sql(sql: str) -> str:
    """Rewrite KSQL function spellings to Spark SQL equivalents.

    Two passes: KSQL-only functions (MASK family, GEO_DISTANCE,
    STRINGTODATE/DATETOSTRING, TOPK/TOPKDISTINCT/HISTOGRAM) expand into
    Spark SQL expression templates; simple renames (UCASE→upper, ...)
    substitute in place. Only identifiers immediately followed by '('
    are touched, so column names that happen to collide (e.g. a column
    called ``len``) survive.
    """
    sql = _expand_calls(sql)
    spans = _quoted_spans(sql)

    def sub(m: re.Match) -> str:
        if any(a <= m.start() < b for a, b in spans):
            return m.group(0)       # inside a string literal: untouched
        return _SQL_RENAMES[m.group(1).lower()] + "("

    return _FUNC_CALL.sub(sub, sql)
