"""Type bridge: Spark ``DataType`` ⇄ DuckDB SQL type-name strings ⇄ pyarrow.

The metadata log stores schemas as DuckDB type-name strings (the interchange
contract, /root/reference/ARCHITECTURE.md:45-55), while the engine plans with
Spark ``StructType`` and the one-file-per-partition writer emits pyarrow.
Everything is nullable by contract.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# Simple (non-parameterized) two-way pairs. Spark's TimestampType is
# microsecond UTC-adjusted; DuckDB's TIMESTAMP is microsecond naive — we map
# TimestampNTZ<->TIMESTAMP and Timestamp<->TIMESTAMPTZ to keep round-trips
# lossless.
_SPARK_TO_DUCK: list[tuple[T.DataType, str]] = [
    (T.LongType(), "BIGINT"),
    (T.IntegerType(), "INTEGER"),
    (T.ShortType(), "SMALLINT"),
    (T.ByteType(), "TINYINT"),
    (T.StringType(), "VARCHAR"),
    (T.DoubleType(), "DOUBLE"),
    (T.FloatType(), "FLOAT"),
    (T.BooleanType(), "BOOLEAN"),
    (T.BinaryType(), "BLOB"),
    (T.DateType(), "DATE"),
    (T.TimestampNTZType(), "TIMESTAMP"),
    (T.TimestampType(), "TIMESTAMPTZ"),
]

_DUCK_ALIASES = {
    "INT8": "BIGINT",
    "LONG": "BIGINT",
    "INT4": "INTEGER",
    "INT": "INTEGER",
    "INT2": "SMALLINT",
    "INT1": "TINYINT",
    "TEXT": "VARCHAR",
    "STRING": "VARCHAR",
    "FLOAT8": "DOUBLE",
    "FLOAT4": "FLOAT",
    "REAL": "FLOAT",
    "BOOL": "BOOLEAN",
    "BYTEA": "BLOB",
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMPTZ",
}


def spark_type_to_duckdb(dt: T.DataType) -> str:
    """Spark DataType → canonical DuckDB type-name string."""
    for sdt, name in _SPARK_TO_DUCK:
        if dt == sdt:
            return name
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"{spark_type_to_duckdb(dt.elementType)}[]"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({spark_type_to_duckdb(dt.keyType)}, "
            f"{spark_type_to_duckdb(dt.valueType)})"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {spark_type_to_duckdb(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    raise ValueError(f"unsupported Spark type for log schema: {dt}")


def duckdb_type_to_spark(name: str) -> T.DataType:
    """Canonical DuckDB type-name string → Spark DataType."""
    s = name.strip()
    upper = s.upper()
    upper = _DUCK_ALIASES.get(upper, upper)
    for sdt, duck in _SPARK_TO_DUCK:
        if duck == upper:
            return sdt
    if upper.endswith("[]"):
        return T.ArrayType(duckdb_type_to_spark(s[:-2]), containsNull=True)
    if upper.startswith("DECIMAL"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        p, sc = (int(x) for x in inner.split(","))
        return T.DecimalType(p, sc)
    if upper.startswith("MAP"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        k, v = _split_top_level(inner)
        return T.MapType(duckdb_type_to_spark(k), duckdb_type_to_spark(v), True)
    if upper.startswith("STRUCT"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        fields = []
        for part in _split_top_level_list(inner):
            fname, ftype = part.strip().split(" ", 1)
            fields.append(T.StructField(fname, duckdb_type_to_spark(ftype), True))
        return T.StructType(fields)
    raise ValueError(f"unsupported DuckDB type string: {name}")


def _split_top_level(s: str) -> tuple[str, str]:
    parts = _split_top_level_list(s)
    if len(parts) != 2:
        raise ValueError(f"expected two type params in: {s}")
    return parts[0].strip(), parts[1].strip()


def _split_top_level_list(s: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def spark_schema_to_duckdb(schema: T.StructType) -> dict[str, str]:
    return {f.name: spark_type_to_duckdb(f.dataType) for f in schema.fields}


def duckdb_schema_to_spark(columns: dict[str, str]) -> T.StructType:
    """Log schema → unified Spark StructType (everything nullable).

    Columns are emitted in sorted-name order so the unified read schema is
    deterministic regardless of log-file arrival order.
    """
    return T.StructType(
        [
            T.StructField(name, duckdb_type_to_spark(typ), True)
            for name, typ in sorted(columns.items())
        ]
    )


def spark_type_to_arrow(dt: T.DataType) -> pa.DataType:
    """Spark DataType → pyarrow type, for the executor-side parquet writer."""
    mapping = {
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.ShortType(): pa.int16(),
        T.ByteType(): pa.int8(),
        T.StringType(): pa.string(),
        T.DoubleType(): pa.float64(),
        T.FloatType(): pa.float32(),
        T.BooleanType(): pa.bool_(),
        T.BinaryType(): pa.binary(),
        T.DateType(): pa.date32(),
        T.TimestampNTZType(): pa.timestamp("us"),
        T.TimestampType(): pa.timestamp("us", tz="UTC"),
    }
    for sdt, adt in mapping.items():
        if dt == sdt:
            return adt
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return pa.list_(spark_type_to_arrow(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(spark_type_to_arrow(dt.keyType), spark_type_to_arrow(dt.valueType))
    if isinstance(dt, T.StructType):
        return pa.struct(
            [pa.field(f.name, spark_type_to_arrow(f.dataType)) for f in dt.fields]
        )
    raise ValueError(f"unsupported Spark type for arrow writer: {dt}")


def spark_schema_to_arrow(schema: T.StructType) -> pa.Schema:
    return pa.schema(
        [pa.field(f.name, spark_type_to_arrow(f.dataType)) for f in schema.fields]
    )
