"""Property-based fuzz of the Avro wire codec (pure Python, no Spark):
for ANY schema over the reference's type universe (AvroUtil.java:30-73,
all union[null, T]) and ANY nullable values, encode → decode is the
identity; truncation at a field boundary null-fills exactly the tail
(AvroPageDatumReader.java:88-94 trailing-missing tolerance).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from rakam_api_collector_spark.ingest import avro as A

_SCALARS = [
    (T.StringType(), st.text(max_size=40)),
    (T.BinaryType(), st.binary(max_size=40)),
    (T.LongType(), st.integers(-(2**63), 2**63 - 1)),
    (T.IntegerType(), st.integers(-(2**31), 2**31 - 1)),
    (T.DateType(), st.integers(-100_000, 100_000)),
    (T.TimestampType(), st.integers(-(2**50), 2**50)),
    (T.DoubleType(), st.floats(allow_nan=False, width=64)),
    (T.FloatType(), st.floats(allow_nan=False, width=32)),
    (T.BooleanType(), st.booleans()),
]


def _field_and_value():
    def expand(i):
        dtype, vals = _SCALARS[i % len(_SCALARS)]
        shape = st.sampled_from(["scalar", "array", "map"]) if i % 3 == 0 \
            else st.just("scalar")

        def build(s):
            if s == "array":
                return st.tuples(
                    st.just(T.ArrayType(dtype)),
                    st.one_of(st.none(),
                              st.lists(st.one_of(st.none(), vals),
                                       max_size=5)))
            if s == "map":
                return st.tuples(
                    st.just(T.MapType(T.StringType(), dtype)),
                    st.one_of(st.none(),
                              st.dictionaries(st.text(max_size=8),
                                              st.one_of(st.none(), vals),
                                              max_size=5)))
            return st.tuples(st.just(dtype),
                             st.one_of(st.none(), vals))
        return shape.flatmap(build)

    return st.integers(0, 8).flatmap(expand)


@settings(max_examples=200, deadline=None)
@given(st.lists(_field_and_value(), min_size=1, max_size=12))
def test_roundtrip_any_schema(fvs):
    fields = [T.StructField(f"c{i}", d) for i, (d, _) in enumerate(fvs)]
    values = [v for _, v in fvs]
    buf = A.encode_record(fields, values)
    decoded, pos = A.AvroRowDecoder(fields).decode(buf)
    assert pos == len(buf)
    assert decoded == values


@settings(max_examples=100, deadline=None)
@given(st.lists(_field_and_value(), min_size=2, max_size=8),
       st.data())
def test_field_boundary_truncation_null_fills(fvs, data):
    fields = [T.StructField(f"c{i}", d) for i, (d, _) in enumerate(fvs)]
    values = [v for _, v in fvs]
    cut = data.draw(st.integers(0, len(fvs) - 1))
    buf = A.encode_record(fields[:cut], values[:cut])
    decoded, _ = A.AvroRowDecoder(fields).decode(buf)
    assert decoded == values[:cut] + [None] * (len(fvs) - cut)
