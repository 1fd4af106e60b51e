"""First-wins type inference + safe-cast conversion rules (D5/D6).

Inference reproduces ``getTypeForUnknown``
(FabricJsonDeserializer.java:497-602): a new field's type comes from its
first non-null occurrence — string → date-sniff → timestamp-sniff →
STRING; any number → DOUBLE; bool → BOOLEAN; array → ARRAY<type of first
element> (nested element → ARRAY<STRING>, JSON-encoded); object →
MAP<STRING, type of first value> (non-scalar value → MAP<STRING,STRING>);
null / empty array / empty object → defer (no column yet).

Conversion reproduces the per-type write-with-catch→null semantics
(FabricJsonDeserializer.java:313-495): a value whose *JSON token type*
doesn't match the column type becomes null, never an error and never a
widening. JSON token types survive to the JVM via VariantType
(``schema_of_variant``), so the whole hot path is codegen'd Spark
expressions — no Python per row.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
TIMESTAMP_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?"
    r"(Z|[+-]\d{2}:?\d{2})?$")

# variant schema strings that count as "a JSON number"
_NUMERIC_SCHEMA_RE = r"^(TINYINT|SMALLINT|INT|BIGINT|FLOAT|DOUBLE|DECIMAL.*)$"


def _scalar_type(value) -> T.DataType | None:
    """Reference scalar inference on a parsed JSON value."""
    if value is None:
        return None
    if isinstance(value, bool):          # bool is int in Python — check first
        return T.BooleanType()
    if isinstance(value, (int, float)):  # ints → DOUBLE (java:529-531)
        return T.DoubleType()
    if isinstance(value, str):
        if DATE_RE.match(value):
            return T.DateType()
        if TIMESTAMP_RE.match(value):
            return T.TimestampType()
        return T.StringType()
    return None


def infer_type(value, is_time_field: bool = False,
               struct_objects: bool = False) -> T.DataType | None:
    """First-non-null-occurrence inference; None = defer (no column yet).

    ``struct_objects=True`` infers nested JSON objects as first-class
    ``StructType`` (recursively typed leaves) — what Spark can express
    that the reference cannot (it throws "Nested properties are not
    supported", FabricJsonDeserializer.java:303-310, or flattens to MAP
    at inference, java:565-598). Off by default: MAP columns evolve
    add-only for free, while struct field sets are frozen at first
    occurrence — the scale-safe default for 100 TB streaming corpora.
    """
    if is_time_field:                     # configured time field (java:500-502)
        return T.TimestampType()
    if value is None:
        return None
    if isinstance(value, list):           # java:534-564
        if not value:
            return None                   # empty array → defer
        head = value[0]
        if struct_objects and isinstance(head, dict):
            elem = infer_type(head, struct_objects=True)
            return T.ArrayType(elem) if elem else T.ArrayType(T.StringType())
        if isinstance(head, (list, dict)):
            return T.ArrayType(T.StringType())   # nested → JSON strings
        elem = _scalar_type(head)
        return T.ArrayType(elem) if elem else T.ArrayType(T.StringType())
    if isinstance(value, dict):           # java:565-598
        if not value:
            return None                   # empty object → defer
        if struct_objects:
            # nested keys keep their case: top-level lowering is identifier
            # folding for COLUMN names; nested keys are payload content and
            # must match the JSON during from_json extraction
            fields = []
            for k, nested in value.items():
                ft = infer_type(nested, struct_objects=True)
                fields.append(T.StructField(k, ft or T.StringType()))
            return T.StructType(fields)
        head = next(iter(value.values()))
        if isinstance(head, (list, dict)) or head is None:
            return T.MapType(T.StringType(), T.StringType())
        val = _scalar_type(head)
        return T.MapType(T.StringType(), val or T.StringType())
    return _scalar_type(value)


def _is_number(sch: Column) -> Column:
    return sch.rlike(_NUMERIC_SCHEMA_RE)


def conversion_expr(v: Column, dtype: T.DataType,
                    numeric_timestamps: bool = True,
                    truncate_strings: int | None = 100,
                    compat: str = "spark") -> Column:
    """Typed extraction of a variant value with catch→null semantics.

    ``numeric_timestamps``: Fabric accepts epoch-millis numbers for
    TIMESTAMP (FabricJsonDeserializer.java:373-390); Rakam only strings
    (RakamJsonDeserializer.java:363-377) — numbers become null there.
    ``truncate_strings``: VARCHAR values hard-truncate at 100 chars
    (FabricJsonDeserializer.java:324-330); None disables (non-compat).
    ``compat``: 'spark' (default) converts DECIMAL columns properly and
    base64-decodes BINARY; 'reference' reproduces the reference's
    behavior exactly — every JSON-ingested DECIMAL value is null (the
    TODO at FabricJsonDeserializer.java:352-354) and BINARY is null
    (no VARBINARY case on the JSON path; Avro-only, AvroUtil.java:52-53).

    TIME compat — DECIDED, wontfix (SURVEY §7 open item): the reference
    parses TIME strings as ``LocalTime.parse(...).getSecond()``
    (FabricJsonDeserializer.java:340-348) — seconds-of-MINUTE (0-59),
    not seconds-of-day — and stores that INT
    (StorageTypeConverter.java:59-61), so "12:34:56" persists as 56.
    Spark has no TIME type and this engine's catalog never creates one
    (time-like strings infer as TIMESTAMP or stay STRING, rules.py
    :53-97), so there is no column a reference-faithful branch could
    target; reproducing the bug would mean inventing a TIME column kind
    solely to store data-losing values no reader could interpret. A
    user migrating a reference table whose TIME column holds such INTs
    ingests them unchanged as plain integers — lossless relative to
    what the reference actually stored.
    """
    if compat not in ("spark", "reference"):
        raise ValueError(f"unknown compat mode {compat!r}")
    sch = F.schema_of_variant(v)

    if isinstance(dtype, T.StringType):
        s = F.try_variant_get(v, "$", "string")
        if truncate_strings:
            s = F.substring(s, 1, truncate_strings)
        return F.when(sch == "STRING", s)

    if isinstance(dtype, T.BooleanType):
        return F.when(sch == "BOOLEAN", F.try_variant_get(v, "$", "boolean"))

    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.when(_is_number(sch),
                      F.try_variant_get(v, "$", dtype.simpleString()))

    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return F.when(_is_number(sch),
                      F.try_variant_get(v, "$", dtype.simpleString()))

    if isinstance(dtype, T.DateType):
        return F.when(
            sch == "STRING",
            F.try_variant_get(v, "$", "string").try_cast("date"))

    if isinstance(dtype, T.TimestampType):
        from_str = F.try_variant_get(v, "$", "string").try_cast("timestamp")
        if numeric_timestamps:
            return (F.when(_is_number(sch), F.timestamp_millis(
                        F.try_variant_get(v, "$", "bigint")))
                     .when(sch == "STRING", from_str))
        return F.when(sch == "STRING", from_str)

    if isinstance(dtype, T.DecimalType):
        if compat == "reference":
            # reference-exact: DECIMAL never converts
            # (FabricJsonDeserializer.java:352-354 writes null always)
            return F.lit(None).cast(dtype)
        return F.when(_is_number(sch),
                      F.try_variant_get(v, "$", dtype.simpleString()))

    if isinstance(dtype, T.BinaryType):
        if compat == "reference":
            return F.lit(None).cast(dtype)   # Avro-path-only type
        # JSON convention: base64 text; malformed → null, not error
        return F.when(sch == "STRING",
                      F.try_to_binary(F.try_variant_get(v, "$", "string"),
                                      F.lit("base64")))

    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        # JSON round-trip so element/value mismatches null out per-entry
        # (java:453-485 per-element writes) and nested values JSON-encode
        # into STRING slots (java:470-478). Struct columns (spark-mode
        # nested inference) take the same path: unknown nested keys are
        # dropped, missing ones null-fill.
        kind = ("ARRAY" if isinstance(dtype, T.ArrayType) else "OBJECT")
        return F.when(sch.startswith(kind),
                      F.from_json(F.to_json(v), dtype))

    raise TypeError(f"unsupported column type: {dtype}")
