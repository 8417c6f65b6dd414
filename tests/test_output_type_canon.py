"""Output-type canon contract: no registered query may emit DECIMAL.

The driver materializes the two sides of its correctness gate
asymmetrically: DuckDB DECIMAL(38,0) goes through pandas and arrives as
float64 ("2019952.0") while Spark's collect keeps Decimal ("2019952") —
so a query whose OUTPUT schema carries DECIMAL hashes red with
bit-identical values (the r08/r09 ``cliffs_delta_value`` incident,
reproduced by ``tools/parity.py --pandas``). DECIMAL stays legal — and
load-bearing — INSIDE plans (exact >2^63 pair-count arithmetic); the
contract is only that the final SELECT casts it away.

The allowed output leaf types are the engine-symmetric ones: string,
integer family, double/float, boolean, date, timestamp, binary — plus
arrays/maps/structs thereof.
"""

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

import __spark_entry__ as ent
from tests.conftest import SF_SMALL

_ALLOWED_LEAVES = (
    StringType,
    ByteType,
    ShortType,
    IntegerType,
    LongType,
    DoubleType,
    FloatType,
    BooleanType,
    DateType,
    TimestampType,
    BinaryType,
)


def _bad_leaves(dt: DataType, path: str) -> list[str]:
    if isinstance(dt, StructType):
        return [b for f in dt.fields for b in _bad_leaves(f.dataType, f"{path}.{f.name}")]
    if isinstance(dt, ArrayType):
        return _bad_leaves(dt.elementType, f"{path}[]")
    if isinstance(dt, MapType):
        return _bad_leaves(dt.keyType, f"{path}<key>") + _bad_leaves(
            dt.valueType, f"{path}<val>"
        )
    if isinstance(dt, _ALLOWED_LEAVES):
        return []
    return [f"{path}: {dt.simpleString()}"]


_QUERIES = ent.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_output_schema_is_engine_symmetric(spark, name):
    df = _QUERIES[name](spark, SF_SMALL)
    bad = [b for f in df.schema.fields for b in _bad_leaves(f.dataType, f.name)]
    assert not bad, (
        f"{name} emits engine-asymmetric output type(s) {bad}; "
        "cast to BIGINT/DOUBLE in the final SELECT (driver's pandas "
        "fetch turns DECIMAL into float64 on the oracle side only)"
    )
