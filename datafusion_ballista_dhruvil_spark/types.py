"""Arrow -> Spark SQL type mapping (SURVEY.md §1.3; centralized per the risk
register, §7 item 2).

The reference's serializable type surface is Arrow (message ArrowType,
ballista/core/proto/datafusion.proto:863-898). Spark lacks a few Arrow types;
the widenings below follow the same rules Spark's own Parquet reader applies
(unsigned ints) and document the gaps explicitly.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Arrow type name -> (Spark type, lossless, note)
ARROW_TO_SPARK: dict[str, tuple[T.DataType, bool, str]] = {
    "null": (T.NullType(), True, ""),
    "bool": (T.BooleanType(), True, ""),
    "int8": (T.ByteType(), True, ""),
    "int16": (T.ShortType(), True, ""),
    "int32": (T.IntegerType(), True, ""),
    "int64": (T.LongType(), True, ""),
    # unsigned: widen one step (same rule as Spark's Parquet reader)
    "uint8": (T.ShortType(), True, "widened"),
    "uint16": (T.IntegerType(), True, "widened"),
    "uint32": (T.LongType(), True, "widened"),
    "uint64": (T.DecimalType(20, 0), True, "widened to decimal"),
    "float16": (T.FloatType(), True, "promoted"),
    "float32": (T.FloatType(), True, ""),
    "float64": (T.DoubleType(), True, ""),
    "utf8": (T.StringType(), True, ""),
    "large_utf8": (T.StringType(), True, ""),
    "binary": (T.BinaryType(), True, ""),
    "large_binary": (T.BinaryType(), True, ""),
    "fixed_size_binary": (T.BinaryType(), True, "size constraint dropped"),
    "date32": (T.DateType(), True, ""),
    "date64": (T.DateType(), False, "ms-of-epoch truncated to days"),
    "timestamp[s]": (T.TimestampType(), True, ""),
    "timestamp[ms]": (T.TimestampType(), True, ""),
    "timestamp[us]": (T.TimestampType(), True, ""),
    "timestamp[ns]": (T.TimestampType(), False, "truncated to microseconds"),
    "time32": (T.LongType(), False, "no TimeType: microseconds-of-day"),
    "time64": (T.LongType(), False, "no TimeType: microseconds-of-day"),
    "duration": (T.DayTimeIntervalType(), False, "ns-unit durations truncate to us"),
    "interval_year_month": (T.YearMonthIntervalType(), True, ""),
    "interval_day_time": (T.DayTimeIntervalType(), True, ""),
    "interval_month_day_nano": (
        T.DayTimeIntervalType(),
        False,
        "no exact match: month component must be split out",
    ),
}


_DECIMAL_RE = __import__("re").compile(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)")


def spark_type_for(arrow_name: str) -> T.DataType:
    """Resolve an Arrow type name to the Spark type used for parity.

    Parameterized types handled here: ``decimal(p,s)`` (p/s parsed from the
    name; max p=38, same as Decimal128), ``list<elem>`` -> ArrayType(elem),
    ``dictionary<k,v>`` -> the value type (encoding detail, not logical).
    ``struct``/``map``/``union`` require field schemas beyond a type name
    and raise ValueError — build those with StructType/MapType directly.
    """
    name = arrow_name.strip().lower()
    m = _DECIMAL_RE.fullmatch(name)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if name == "decimal":
        return T.DecimalType(38, 18)
    if name.startswith("list<") and name.endswith(">"):
        return T.ArrayType(spark_type_for(name[5:-1]))
    if name.startswith("dictionary<") and name.endswith(">"):
        value = name[11:-1].split(",", 1)[1]
        return spark_type_for(value)
    if name in ARROW_TO_SPARK:
        return ARROW_TO_SPARK[name][0]
    raise ValueError(f"no Spark mapping for Arrow type {arrow_name!r}")


def lossless(arrow_name: str) -> bool:
    name = arrow_name.strip().lower()
    if name not in ARROW_TO_SPARK:
        raise ValueError(f"unknown Arrow type {arrow_name!r}")
    return ARROW_TO_SPARK[name][1]
