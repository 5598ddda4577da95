"""Lattice table tests (reference semantics: schema.py:249-303)."""

import pyarrow as pa
import pytest

from mongo2pq_spark.schema.unify import unify_types


@pytest.mark.parametrize(
    "t1, t2, expected",
    [
        # widest-in-category
        (pa.int8(), pa.int64(), pa.int64()),
        (pa.int32(), pa.int16(), pa.int32()),
        (pa.uint8(), pa.uint32(), pa.uint32()),
        (pa.float16(), pa.float32(), pa.float32()),
        (pa.float64(), pa.float32(), pa.float64()),
        (pa.date32(), pa.date64(), pa.date64()),
        # int ⊔ float → float side
        (pa.int64(), pa.float32(), pa.float32()),
        (pa.float64(), pa.int8(), pa.float64()),
        # numeric ⊔ temporal → numeric (non-standard, deliberate)
        (pa.int64(), pa.timestamp("s"), pa.int64()),
        (pa.timestamp("s"), pa.float32(), pa.float32()),
        (pa.date64(), pa.int32(), pa.int32()),
        # binary contagion
        (pa.binary(), pa.string(), pa.binary()),
        (pa.int32(), pa.binary(), pa.binary()),
        (pa.timestamp("s"), pa.binary(), pa.binary()),
        # mixed signed/unsigned → the signed operand (reference parity:
        # the signed-width probe matches only the signed side)
        (pa.int32(), pa.uint32(), pa.int32()),
        (pa.uint64(), pa.int8(), pa.int8()),
        (pa.int64(), pa.uint8(), pa.int64()),
        # fallback → string
        (pa.bool_(), pa.int32(), pa.string()),
        (pa.string(), pa.int64(), pa.string()),
        (pa.date32(), pa.string(), pa.string()),
        (pa.timestamp("s"), pa.date32(), pa.string()),
        # identity
        (pa.int32(), pa.int32(), pa.int32()),
    ],
)
def test_unify_lattice(t1, t2, expected):
    assert unify_types(t1, t2).equals(expected)


def test_unify_is_symmetric():
    cases = [pa.int8(), pa.int64(), pa.float32(), pa.date32(), pa.timestamp("s"),
             pa.binary(), pa.string(), pa.bool_()]
    for t1 in cases:
        for t2 in cases:
            assert unify_types(t1, t2).equals(unify_types(t2, t1))
