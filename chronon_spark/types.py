"""Output schema derivation for AggregationParts.

The reference maintains a parallel type system (api/.../DataType.scala:226-307);
we derive everything from pyspark.sql.types directly — schemas flow from the
input table.
"""

from __future__ import annotations

from pyspark.sql import types as T

from chronon_spark.api import AggregationPart, Op

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)


def part_output_type(part: AggregationPart, input_type: T.DataType) -> T.DataType:
    if isinstance(input_type, T.ArrayType):  # auto-exploded vector input
        input_type = input_type.elementType
    map_input = isinstance(input_type, T.MapType)  # per-map-key aggregation
    if map_input:
        input_type = input_type.valueType
    if isinstance(input_type, T.DecimalType) and input_type.scale == 0 and input_type.precision <= 18:
        # the Decimal rewrite's unscaled representation (aggregators/
        # decimal.py): semantically an int64, typed long through the kernels
        # so the exact integral SUM path applies; the rewrite's post-step
        # rescales back to DECIMAL(38, s)
        input_type = T.LongType()
    op = part.op
    if op in (Op.COUNT, Op.UNIQUE_COUNT, Op.APPROX_UNIQUE_COUNT):
        base: T.DataType = T.LongType()
    elif op == Op.SUM:
        base = T.LongType() if isinstance(input_type, _INTEGRAL) else T.DoubleType()
    elif op in (Op.AVERAGE, Op.VARIANCE, Op.SKEW, Op.KURTOSIS):
        base = T.DoubleType()
    elif op in (Op.MIN, Op.MAX, Op.FIRST, Op.LAST):
        base = input_type
    elif op in (Op.FIRST_K, Op.LAST_K, Op.TOP_K, Op.BOTTOM_K, Op.UNIQUE_TOP_K):
        base = T.ArrayType(input_type)
    elif op in (Op.HISTOGRAM, Op.APPROX_FREQUENT_K, Op.APPROX_HEAVY_HITTERS_K):
        base = T.MapType(T.StringType(), T.LongType())
    elif op == Op.APPROX_PERCENTILE:
        base = T.ArrayType(T.DoubleType())
    else:
        raise NotImplementedError(f"op {op}")
    if map_input:
        base = T.MapType(T.StringType(), base)
    if part.bucket:
        base = T.MapType(T.StringType(), base)
    return base
