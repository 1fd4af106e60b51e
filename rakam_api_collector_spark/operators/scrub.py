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
