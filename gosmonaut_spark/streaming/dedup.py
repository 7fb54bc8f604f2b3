"""Streaming exact deduplication: first-seen-wins over a document stream.

The streaming twin of ``functions.dedup.exact_dup_groups``: documents
arrive as files, each micro-batch keeps only documents whose content
fingerprint has never been seen before — across micro-batches, via
``dropDuplicates`` state keyed on the fingerprint.

State discipline (100 TB lens): keyed dedup state grows with DISTINCT
fingerprints forever unless bounded — so the stream watermarks on event
time and uses ``dropDuplicatesWithinWatermark``, which Spark is allowed
to evict once the watermark passes (state is bounded by the distinct-key
arrival rate inside the lateness horizon, not corpus size). A duplicate
arriving later than the horizon is re-emitted — the same trade every
at-scale streaming dedup makes; the batch operator is the exact one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import content_fingerprint

DOCS_SCHEMA = "doc_id long, ingest_ts timestamp_ntz, text string"

__all__ = ["read_docs_stream", "dedup_stream", "DOCS_SCHEMA"]


def read_docs_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def dedup_stream(docs: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """First-seen-wins exact dedup over a streaming document source.

    Emits each document whose normalized-content fingerprint is new within
    the watermark horizon; state for fingerprints older than ``lateness``
    is evictable. Output carries the fingerprint so a downstream batch
    reconciliation (the exact operator) can audit the stream's decisions.
    """
    from ..functions.timeops import ntz_epoch_micros

    # watermarks need TIMESTAMP (an instant); build it zone-free from the
    # NTZ fields rather than the session-timezone-dependent cast (same
    # discipline as streaming_tile_counts)
    fp = docs.withColumn("fp", content_fingerprint(F.col("text"))).withColumn(
        "ingest_ts", F.timestamp_micros(ntz_epoch_micros(F.col("ingest_ts")))
    )
    return fp.withWatermark("ingest_ts", lateness).dropDuplicatesWithinWatermark(
        ["fp"]
    )
