"""PII detection and masking — the redaction stage of a training-data
curation pipeline (the public CCNet/Dolma-style pass that scrubs
contact strings before a corpus ships).

Three operators, all stateless zero-shuffle projections (Scan → Project,
JVM-side regex, stream-transparent by construction):

- :func:`pii_detect`  — per-document match counts for each PII class
  (email, IPv4, NANP-style phone) plus a ``has_pii`` flag;
- :func:`pii_mask`    — sequential in-place redaction to ``[EMAIL]`` /
  ``[IPV4]`` / ``[PHONE]`` tokens;
- :func:`attach_contacts` — the deterministic test-data synthesizer
  (the :func:`~kafka_connect_streams_spark.operators.multimodal.
  md5_luma_grid` precedent): splices md5-derived contact strings onto a
  deterministic ~1/3 subset of documents per class, so the detectors
  run against a mixed positive/negative corpus without shipping PII
  fixtures. Production pipelines point :func:`pii_detect`/:func:`pii_mask`
  at real text and never call it.

Dialect discipline: every pattern stays inside the Java-regex ∩ RE2
common subset (character classes, bounded quantifiers, literal escapes —
no backreferences, no lookaround, no ``\\b``), so the Spark plan and the
DuckDB oracle twin match byte-for-byte. ``\\b`` is excluded for a
concrete reason, not caution: Java's ``\\b`` is Unicode-aware while
RE2's is ASCII-only, so the two engines disagree on boundaries next to
non-ASCII text — the one construct in the obvious candidate set with
genuinely divergent semantics. The cost is that detectors are
boundary-free (a phone pattern matches inside a longer digit run); the
md5 synthesizer always emits clean boundaries, and a production
deployment on one engine adds its own ``\\b`` anchors behind the same
operator surface. Replacement strings contain no
``$``/``\\`` metacharacters for the same reason.

Masking order is load-bearing and pinned: EMAIL first (an address whose
local part is a dotted quad — ``10.1.2.3@example.com`` — must redact as
one ``[EMAIL]``, not leave an ``[IPV4]`` crumb), then IPV4, then PHONE.
:func:`pii_detect` counts each class INDEPENDENTLY over the raw text, so
overlapping spans count once per class — the count is a detector report,
not a partition of the text.

Scale: both operators are per-row bounded work with no shuffle, no UDF,
no Python — they ride whole-stage codegen and stream through any corpus
size; at 100 TB the cost is the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Java-regex ∩ RE2 patterns, one per PII class. Deliberately simple,
#: high-precision spellings (the Dolma-style public baseline): a
#: production deployment widens them behind the same operator surface.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
}

#: redaction order — EMAIL swallows dotted-quad local parts before IPV4
#: can see them; PHONE last (digits-dash never overlaps the other two
#: after they are gone).
PII_MASK_ORDER: tuple[str, ...] = ("email", "ipv4", "phone")

#: replacement tokens (regex-metacharacter-free in both engines).
PII_TOKENS: dict[str, str] = {
    "email": "[EMAIL]", "ipv4": "[IPV4]", "phone": "[PHONE]",
}


def pii_detect(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII match counts: ``(id, n_email, n_ipv4, n_phone,
    has_pii)``. Each class is counted independently over the raw text
    (see module docstring). Zero-shuffle Scan → Project; NULL text
    counts as empty."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [F.regexp_count(t, F.lit(PII_PATTERNS[k])).cast("bigint")
              .alias(f"n_{k}") for k in PII_MASK_ORDER]
    out = df.select(F.col(id_col), *counts)
    return out.withColumn(
        "has_pii",
        sum(F.col(f"n_{k}") for k in PII_MASK_ORDER) > F.lit(0))


def _mask_expr(text: Column) -> Column:
    masked = F.coalesce(text, F.lit(""))
    for k in PII_MASK_ORDER:
        masked = F.regexp_replace(masked, PII_PATTERNS[k], PII_TOKENS[k])
    return masked


def pii_mask(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Redact all three PII classes in pinned order; output ``(id,
    masked, residual)`` where ``residual`` RE-RUNS the detectors over
    the masked text — measured-not-claimed: a nonzero residual means a
    pattern survived its own redaction (possible only if a mask token
    spliced adjacent text into a new match, which the bracketed tokens
    preclude; the driver row verifies the zero). Zero-shuffle."""
    masked = _mask_expr(F.col(text_col))
    residual = None
    for k in PII_MASK_ORDER:
        c = F.regexp_count(masked, F.lit(PII_PATTERNS[k])).cast("bigint")
        residual = c if residual is None else residual + c
    return df.select(F.col(id_col), masked.alias("masked"),
                     residual.alias("residual"))


def _byte(h: Column, i: int) -> Column:
    """Byte ``i`` (0-based) of an md5 hex column as BIGINT — the exact
    twin of DuckDB's ``('0x' || substr(h, 2i+1, 2))::BIGINT``."""
    return F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("bigint")


def attach_contacts(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic PII synthesizer for the registered queries: from
    ``md5(text)``, each class lands on its own ~1/3 of documents
    (byte b ≡ 0 mod 3 gates class presence; other bytes parameterize
    the string), appended to the text as

    - `` Contact user<b1%100>@example<b2%10>.com``
    - `` Host 10.<b8>.<b9>.<b10>``
    - `` Call 555-<b4%1000 lpad 3>-<(b5*256+b6)%10000 lpad 4>``

    All arithmetic is integer-exact and the spelling is pinned against
    the DuckDB twin (queries._pii_enrich_sql) by tests/test_pii.py, so
    every downstream detector/mask driver row is hash-checkable. The
    gates are independent, so the corpus mixes 0-, 1-, 2- and 3-class
    documents and ~30% carry no PII at all — real negatives."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    h = F.md5(t)
    b = [_byte(h, i) for i in range(11)]
    email = F.concat(F.lit(" Contact user"),
                     (b[1] % 100).cast("string"),
                     F.lit("@example"), (b[2] % 10).cast("string"),
                     F.lit(".com"))
    phone = F.concat(F.lit(" Call 555-"),
                     F.lpad((b[4] % 1000).cast("string"), 3, "0"),
                     F.lit("-"),
                     F.lpad(((b[5] * 256 + b[6]) % 10000).cast("string"),
                            4, "0"))
    ip = F.concat(F.lit(" Host 10."), b[8].cast("string"), F.lit("."),
                  b[9].cast("string"), F.lit("."), b[10].cast("string"))
    enriched = F.concat(
        t,
        F.when(b[0] % 3 == 0, email).otherwise(F.lit("")),
        F.when(b[3] % 3 == 0, phone).otherwise(F.lit("")),
        F.when(b[7] % 3 == 0, ip).otherwise(F.lit("")))
    return df.withColumn(text_col, enriched)
