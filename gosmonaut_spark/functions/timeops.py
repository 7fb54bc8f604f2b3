"""Timezone-independent conversions for TIMESTAMP_NTZ columns.

Casting NTZ -> TIMESTAMP reads ``spark.sql.session.timeZone`` at
*execution* time, so any operator relying on that cast either silently
depends on whoever built the session or has to mutate session conf (the
r2 implementation pinned UTC session-wide — flagged as a correctness
hazard for unrelated user queries). These helpers compute epoch values
purely from the NTZ *fields* (date, hour, minute, second, fraction),
which involve no zone at all: the naive value is interpreted as UTC by
construction, matching DuckDB's ``epoch_ms(ts)`` on naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ntz_epoch_micros(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ, treating the naive value as
    UTC — independent of ``spark.sql.session.timeZone``. Every term is a
    field extraction (no zone math anywhere); valid for dates >= 1970."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.unix_date(F.to_date(c)).cast("long") * F.lit(86_400_000_000).cast("long")
        + F.hour(c).cast("long") * F.lit(3_600_000_000).cast("long")
        + F.minute(c).cast("long") * F.lit(60_000_000).cast("long")
        + F.second(c).cast("long") * F.lit(1_000_000).cast("long")
        + F.date_format(c, "SSSSSS").cast("long")
    )


def ntz_epoch_ms(col: Column | str) -> Column:
    """Epoch milliseconds of a TIMESTAMP_NTZ (naive-as-UTC, zone-free).
    Sub-millisecond digits are truncated — the same behavior as
    ``unix_millis`` and DuckDB's ``epoch_ms``."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.unix_date(F.to_date(c)).cast("long") * F.lit(86_400_000).cast("long")
        + F.hour(c).cast("long") * F.lit(3_600_000).cast("long")
        + F.minute(c).cast("long") * F.lit(60_000).cast("long")
        + F.second(c).cast("long") * F.lit(1_000).cast("long")
        + F.date_format(c, "SSS").cast("long")
    )
