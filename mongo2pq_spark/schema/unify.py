"""Type-unification lattice.

Semantics match the reference (/root/reference/mongo2pq/schema.py:249-303)
but the implementation is table-driven rather than a chain of category
probes:

- within a numeric/date category the *widest* member wins
  (int64 > int32 > int16 > int8; same for uint and float; date64 > date32)
- int ⊔ float → the float type
- numeric ⊔ temporal → the numeric type (non-standard, deliberate:
  epoch-second columns that sometimes look like datetimes stay numeric)
- anything ⊔ binary → binary ("binary contagion")
- otherwise → string (universal fallback)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.types as pat

# Width rank inside each category; higher rank wins the unification.
_CATEGORY_RANK: dict[str, dict[str, int]] = {
    "int": {"int8": 0, "int16": 1, "int32": 2, "int64": 3},
    "uint": {"uint8": 0, "uint16": 1, "uint32": 2, "uint64": 3},
    "float": {"halffloat": 0, "float": 1, "double": 2},
    "date": {"date32[day]": 0, "date64[ms]": 1},
}


def _category(dtype: pa.DataType) -> str | None:
    if pat.is_signed_integer(dtype):
        return "int"
    if pat.is_unsigned_integer(dtype):
        return "uint"
    if pat.is_floating(dtype):
        return "float"
    if pat.is_date(dtype):
        return "date"
    return None


def _is_numeric(dtype: pa.DataType) -> bool:
    return pat.is_integer(dtype) or pat.is_floating(dtype)


def unify_types(type1: pa.DataType, type2: pa.DataType) -> pa.DataType:
    """Resolve two conflicting inferred types to one storage type."""
    if type1.equals(type2):
        return type1

    cat1, cat2 = _category(type1), _category(type2)
    if cat1 is not None and cat1 == cat2:
        rank = _CATEGORY_RANK[cat1]
        return max((type1, type2), key=lambda t: rank[str(t)])

    # mixed signed/unsigned integers: the reference's resolver probes
    # the SIGNED widths first against both operands and returns the
    # first signed match (reference schema.py:260-265 — is_integer
    # admits unsigned types into the signed category scan), so
    # int32 ⊔ uint64 → int32. Quirky but parity.
    if {cat1, cat2} == {"int", "uint"}:
        signed = type1 if cat1 == "int" else type2
        return signed

    # int ⊔ float → float
    if pat.is_integer(type1) and pat.is_floating(type2):
        return type2
    if pat.is_floating(type1) and pat.is_integer(type2):
        return type1

    # numeric ⊔ temporal → numeric (epoch-style columns stay numeric)
    if _is_numeric(type1) and pat.is_temporal(type2):
        return type1
    if pat.is_temporal(type1) and _is_numeric(type2):
        return type2

    # binary contagion
    if pat.is_binary(type1) or pat.is_binary(type2):
        return pa.binary()

    return pa.string()
