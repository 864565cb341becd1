"""Logical type system: five scalar types + UNKNOWN, with widening promotion.

Re-expresses the reference's type lattice (see /root/reference/
server/typing/datatype.go:15-30 and server/typing/converter.go:12-32):
STRING is the root; FLOAT64 and TIMESTAMP are children of STRING;
INT64 is a child of FLOAT64; BOOL is a child of INT64. Promotion of two
types is their lowest common ancestor in this tree, e.g.
INT64 ⊔ FLOAT64 = FLOAT64, FLOAT64 ⊔ TIMESTAMP = STRING.

The Arrow mapping replaces the reference's per-destination SQL type
tables (server/adapters/postgres.go:61-68 etc.) with a single Arrow
schema used by the Parquet lake.
"""

from __future__ import annotations

import enum

import pyarrow as pa
import pyarrow.compute as pc


class DataType(enum.IntEnum):
    UNKNOWN = 0
    BOOL = 1
    INT64 = 2
    FLOAT64 = 3
    STRING = 4
    TIMESTAMP = 5


#: child -> parent in the typecast tree (converter.go:12-32)
_PARENT: dict[DataType, DataType | None] = {
    DataType.BOOL: DataType.INT64,
    DataType.INT64: DataType.FLOAT64,
    DataType.FLOAT64: DataType.STRING,
    DataType.TIMESTAMP: DataType.STRING,
    DataType.STRING: None,
    DataType.UNKNOWN: DataType.STRING,  # unknown promotes straight to string
}


def _ancestors(t: DataType) -> list[DataType]:
    out = [t]
    while _PARENT[out[-1]] is not None:
        out.append(_PARENT[out[-1]])
    return out


def promote(a: DataType, b: DataType) -> DataType:
    """Lowest common ancestor of two logical types (converter.go:110-133)."""
    if a == b:
        return a
    if a == DataType.UNKNOWN:
        return b
    if b == DataType.UNKNOWN:
        return a
    anc_a = _ancestors(a)
    for t in _ancestors(b):
        if t in anc_a:
            return t
    return DataType.STRING


def promote_many(types) -> DataType:
    out = DataType.UNKNOWN
    for t in types:
        out = promote(out, t)
    return out


# ---------------------------------------------------------------------------
# Arrow <-> logical mapping

_LOGICAL_TO_ARROW: dict[DataType, pa.DataType] = {
    DataType.BOOL: pa.bool_(),
    DataType.INT64: pa.int64(),
    DataType.FLOAT64: pa.float64(),
    DataType.STRING: pa.large_string(),
    DataType.TIMESTAMP: pa.timestamp("us"),
    DataType.UNKNOWN: pa.large_string(),
}


def to_arrow(t: DataType) -> pa.DataType:
    return _LOGICAL_TO_ARROW[t]


def from_arrow(t: pa.DataType) -> DataType:
    if pa.types.is_boolean(t):
        return DataType.BOOL
    if pa.types.is_integer(t):
        return DataType.INT64
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return DataType.FLOAT64
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return DataType.TIMESTAMP
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return DataType.STRING
    if pa.types.is_null(t):
        return DataType.UNKNOWN
    raise TypeError(
        f"non-scalar arrow type {t} reached the lake; run the flattener first "
        "(lists -> JSON strings, structs -> underscore columns)"
    )


# reference format timestamp/format.go:8-31 ("2006-01-02T15:04:05.000000Z");
# arrow's %S already prints the (6-digit, for unit=us) subseconds
_EPOCH_FMT = "%Y-%m-%dT%H:%M:%SZ"


def cast_array(arr: pa.ChunkedArray | pa.Array, target: DataType) -> pa.Array | pa.ChunkedArray:
    """Cast an Arrow array to a logical target type.

    Mirrors the conversion battery in server/typing/converter.go:136-286:
    bool->int (0/1), bool/num->string, string->timestamp (ISO8601),
    timestamp->string (RFC3339 micros, format.go:8).
    """
    src = from_arrow(arr.type)
    tgt = to_arrow(target)
    if arr.type.equals(tgt):
        return arr
    if src == DataType.TIMESTAMP and target == DataType.STRING:
        return pc.cast(pc.strftime(arr, format=_EPOCH_FMT), tgt)
    if src == DataType.STRING and target == DataType.TIMESTAMP:
        try:
            return pc.cast(arr, tgt)  # zone-less ISO 8601
        except pa.ArrowInvalid:
            # "...Z" / "+00:00" suffixed: parse tz-aware, store naive UTC
            aware = pc.cast(arr, pa.timestamp("us", tz="UTC"))
            return pc.local_timestamp(aware)
    if src == DataType.BOOL and target == DataType.STRING:
        # arrow bool->string yields "true"/"false", same as Go strconv
        return pc.cast(arr, tgt)
    return pc.cast(arr, tgt)
