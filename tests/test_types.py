"""Arrow->Spark type mapping: round-trip unsigned widening + documented gaps
(SURVEY.md §1.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datafusion_ballista_dhruvil_spark.types import ARROW_TO_SPARK, lossless, spark_type_for


def test_unsigned_widening_rules():
    assert spark_type_for("uint8") == T.ShortType()
    assert spark_type_for("uint16") == T.IntegerType()
    assert spark_type_for("uint32") == T.LongType()
    assert spark_type_for("uint64") == T.DecimalType(20, 0)


def test_widened_types_hold_extremes(spark):
    # uint64 max must survive the decimal(20,0) mapping
    df = spark.sql("SELECT CAST('18446744073709551615' AS DECIMAL(20,0)) AS v")
    assert str(df.collect()[0].v) == "18446744073709551615"
    # uint8 max in short
    assert spark.sql("SELECT CAST(255 AS SHORT) AS v").collect()[0].v == 255


def test_documented_gaps():
    assert not lossless("timestamp[ns]")
    assert not lossless("time64")
    assert not lossless("interval_month_day_nano")


def test_decimal_and_unknown():
    assert spark_type_for("decimal(15,2)") == T.DecimalType(15, 2)
    assert spark_type_for("decimal(10, 4)") == T.DecimalType(10, 4)
    assert spark_type_for("list<float32>") == T.ArrayType(T.FloatType())
    assert spark_type_for("dictionary<int32,utf8>") == T.StringType()
    with pytest.raises(ValueError, match="no Spark mapping"):
        spark_type_for("union")


def test_every_mapping_is_materializable(spark):
    # every mapped Spark type must be constructible in a real schema
    fields = [
        T.StructField(f"c{i}", dt, True)
        for i, (dt, _, _) in enumerate(ARROW_TO_SPARK.values())
    ]
    schema = T.StructType(fields)
    df = spark.createDataFrame([], schema)
    assert len(df.schema) == len(ARROW_TO_SPARK)
