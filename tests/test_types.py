from __future__ import annotations

import pytest
from pyspark.sql import types as T

from icedb_spark.types import (
    duckdb_schema_to_spark,
    duckdb_type_to_spark,
    spark_type_to_duckdb,
)


@pytest.mark.parametrize(
    "spark_t,duck",
    [
        (T.LongType(), "BIGINT"),
        (T.StringType(), "VARCHAR"),
        (T.DoubleType(), "DOUBLE"),
        (T.FloatType(), "FLOAT"),
        (T.IntegerType(), "INTEGER"),
        (T.BooleanType(), "BOOLEAN"),
        (T.DateType(), "DATE"),
        (T.TimestampNTZType(), "TIMESTAMP"),
        (T.DecimalType(12, 2), "DECIMAL(12,2)"),
        (T.ArrayType(T.FloatType()), "FLOAT[]"),
        (T.MapType(T.StringType(), T.LongType()), "MAP(VARCHAR, BIGINT)"),
        (
            T.StructType([T.StructField("page_name", T.StringType())]),
            "STRUCT(page_name VARCHAR)",
        ),
    ],
)
def test_roundtrip(spark_t, duck):
    assert spark_type_to_duckdb(spark_t) == duck
    assert duckdb_type_to_spark(duck) == spark_t


def test_aliases():
    assert duckdb_type_to_spark("INT8") == T.LongType()
    assert duckdb_type_to_spark("TEXT") == T.StringType()


def test_unified_schema_sorted_nullable():
    st = duckdb_schema_to_spark({"b": "BIGINT", "a": "VARCHAR"})
    assert [f.name for f in st.fields] == ["a", "b"]
    assert all(f.nullable for f in st.fields)


def test_nested_struct_parse():
    t = duckdb_type_to_spark("STRUCT(a VARCHAR, b STRUCT(c BIGINT, d DOUBLE))")
    assert isinstance(t, T.StructType)
    inner = t["b"].dataType
    assert isinstance(inner, T.StructType)
    assert inner["c"].dataType == T.LongType()
