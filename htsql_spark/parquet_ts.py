"""Parquet timestamp probing/conversion shared by the batch reader
(engine.table) and the streaming source (streaming.events).

Parquet TIMESTAMP(NANOS) columns cannot be widened by Spark's reader;
with ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as raw nano
longs and are converted here.  Detection inspects pyarrow's *typed*
fields (``type.unit`` / ``type.tz``), not string reprs, so tz-aware
nano columns (``timestamp[ns, tz=UTC]``) are classified correctly.

Type contract: zone-less timestamps surface as TIMESTAMP_NTZ (the
language's DateTimeDomain is zone-less — reference:
src/htsql/core/domain.py::DateTimeDomain); tz-aware (isAdjustedToUTC)
columns surface as TIMESTAMP.  The streaming source must additionally
cast NTZ → TIMESTAMP at the watermark boundary because Spark's
event-time watermark accepts only TIMESTAMP; under the engine's UTC
session timezone that cast preserves the wall clock, so batch oracles
and streaming outputs agree on values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def timestamp_fields(path: str) -> list[tuple[str, str, str | None]]:
    """``(name, unit, tz)`` for every timestamp column of a parquet
    file — ``unit`` in {'s','ms','us','ns'}, ``tz`` None for
    zone-less columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    out = []
    for name in schema.names:
        t = schema.field(name).type
        if pa.types.is_timestamp(t):
            out.append((name, t.unit, t.tz))
    return out


def nano_timestamp_fields(path: str) -> list[tuple[str, str | None]]:
    """``(name, tz)`` for the TIMESTAMP(NANOS) columns only."""
    return [(n, tz) for n, unit, tz in timestamp_fields(path) if unit == "ns"]


def declared_type(unit: str, tz: str | None) -> T.DataType:
    """Spark type to *declare* for a parquet timestamp column when
    building an explicit read schema (streaming sources need one):
    nano → LongType (read raw, convert with :func:`from_nano_long`);
    tz-aware → TIMESTAMP; zone-less → TIMESTAMP_NTZ."""
    if unit == "ns":
        return T.LongType()
    return T.TimestampType() if tz else T.TimestampNTZType()


def from_nano_long(name: str, tz: str | None) -> Column:
    """Convert a raw nano-long column to the contract type.  Integer
    ``div``: float ``/ 1000`` loses precision past double's 53-bit
    mantissa (~year 2001 in epoch-nanos) and shifts timestamps by
    ±1 µs."""
    us = F.timestamp_micros(F.expr(f"`{name}` div 1000"))
    return us if tz else us.cast("timestamp_ntz")


def convert_nano_cols(df: DataFrame, fields: list[tuple[str, str | None]]) -> DataFrame:
    for name, tz in fields:
        df = df.withColumn(name, from_nano_long(name, tz))
    return df
