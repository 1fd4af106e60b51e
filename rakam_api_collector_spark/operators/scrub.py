"""PII scrubbing for training corpora: detect + redact emails, phone
numbers, and IPv4 addresses with JVM-side regex — no Python in the path.

Patterns are deliberately restricted to syntax shared by Java regex
(Spark) and RE2 (DuckDB oracle, and most production scanners): no
lookaround, no backreferences, no possessive quantifiers. That keeps
one pattern string valid in both engines AND keeps matching linear-time
(RE2's guarantee) — a 100 TB scrub cannot afford catastrophic
backtracking on adversarial documents.

Scale shape: pure per-row map (regexp_replace / regexp-count), no
shuffle; runs inside whole-stage codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: emails contain digit runs, so count/redact emails
# before phones to avoid double-claiming the same span.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative (ASCII, one dot-tld level)
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    # NANP-ish phone: optional +1 / separators; anchored to digit runs
    "phone": r"\+?1?[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    # IPv4 dotted quad (loose octets; a scrubber prefers recall)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII kind (0 for null text)."""
    return F.coalesce(
        F.regexp_count(text, F.lit(PII_PATTERNS[kind])), F.lit(0))


def redact(text: Column, kinds: tuple[str, ...] = ("email", "phone",
                                                   "ipv4")) -> Column:
    """Replace every PII span with its typed redaction token, applying
    kinds in declaration order so overlapping matches resolve
    deterministically (email wins over its embedded digit runs)."""
    out = text
    for kind in PII_PATTERNS:          # declaration order, not arg order
        if kind in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[kind],
                                   REDACTION_TOKENS[kind])
    return out


def remove_boilerplate_lines(df, id_col: str, text_col: str,
                             min_docs: int = 3,
                             min_line_chars: int = 10):
    """Corpus-level boilerplate removal (the CCNet / RefinedWeb line-
    dedup step): a LINE that recurs across ≥ ``min_docs`` DISTINCT
    documents is navigation/footer/license chrome, not content — drop
    every occurrence and rebuild each document from its surviving
    lines in order. Short lines (< ``min_line_chars`` after trim) are
    exempt: blank lines and one-word headers recur naturally and
    carry structure.

    Returns (id, text, lines_removed) — an empty-after-cleaning doc
    yields the empty string, auditable via lines_removed.

    Scale shape: posexplode → one hash-keyed aggregate counting
    DISTINCT docs per line (map-side partial), broadcast-join the
    (rare) boilerplate hashes back, and one groupBy re-assembling
    documents from (pos, line) pairs — two shuffles on narrow rows,
    all JVM (xxhash64 + array_sort + array_join), no Python. The
    boilerplate set is small by construction (lines crossing the
    min_docs threshold), so the join side broadcasts."""
    from pyspark.sql import functions as F

    lines = (df.select(F.col(id_col).alias("_id"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("_pos", "_line"))
             .withColumn("_h", F.xxhash64(F.col("_line"))))
    eligible = F.length(F.trim(F.col("_line"))) >= min_line_chars
    boiler = (lines.filter(eligible)
              .groupBy("_h")
              .agg(F.count_distinct("_id").alias("_docs"))
              .filter(F.col("_docs") >= min_docs)
              .select("_h"))
    marked = lines.join(F.broadcast(boiler.withColumn("_bp", F.lit(True))),
                        "_h", "left")
    drop = F.col("_bp").isNotNull() & eligible
    return (marked
            .groupBy("_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(~drop, F.struct("_pos", "_line")))),
                    lambda s: s["_line"]), "\n").alias(text_col),
                F.sum(drop.cast("int")).alias("lines_removed"))
            .withColumnRenamed("_id", id_col))
