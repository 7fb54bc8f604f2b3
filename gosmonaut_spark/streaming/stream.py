"""Streaming ingestion: pages arrive as files, tiles update incrementally.

The reference's ``Next()`` pull loop (/root/reference/gosmonaut.go:219-236)
is a bounded in-process stream; the cluster-scale recast is Structured
Streaming: a file source discovers new page batches, the same vectorized
decode (mapInPandas works identically in streaming plans) extracts nodes
with their page's event time, and a watermarked window + cell groupBy
maintains the tile layer with late-data tolerance. Checkpointing gives
exactly-once sink semantics — the streaming twin of the batch pass
snapshots (B11).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cells import cell_expr

PAGES_SCHEMA = (
    "url string, warc_ts timestamp_ntz, html binary, text string, lang string"
)

NODES_TS_SCHEMA = (
    "url string, warc_ts timestamp_ntz, id long, lat double, lon double"
)


def read_pages_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def extract_nodes_with_ts(pages: DataFrame) -> DataFrame:
    """Streaming decode: one pass carries the page's event time onto every
    node row (no join needed — the 1:1 url->warc_ts mapping rides along
    through the Arrow batch)."""

    from ..sources.pages import _PKG_ROOT

    pkg_root = _PKG_ROOT

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from gosmonaut_spark.format.gpb import COORD_SCALE
        from gosmonaut_spark.format.gpb_numpy import decode_page_np

        for pdf in batches:
            urls, tss, ids, lats, lons = [], [], [], [], []
            for url, ts, blob in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                page = decode_page_np(bytes(blob), want=("nodes",))
                n = len(page.node_ids)
                urls.extend([url] * n)
                tss.extend([ts] * n)
                ids.append(page.node_ids)
                lats.append(page.node_lat_units * COORD_SCALE)
                lons.append(page.node_lon_units * COORD_SCALE)
            import numpy as np

            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "id": np.concatenate(ids) if ids else [],
                    "lat": np.concatenate(lats) if lats else [],
                    "lon": np.concatenate(lons) if lons else [],
                }
            )

    return pages.select("url", "warc_ts", "html").mapInPandas(fn, NODES_TS_SCHEMA)


def streaming_tile_counts(
    spark: SparkSession,
    pages_dir: str,
    res: int = 8,
    watermark: str = "1 hour",
) -> DataFrame:
    """Windowed tile counts per 1-hour event-time window. Late pages beyond
    the watermark are dropped, so state stays bounded.

    Watermarks require TIMESTAMP (an instant), but ``warc_ts`` is
    TIMESTAMP_NTZ and the plain NTZ->TIMESTAMP cast reads the session
    timezone at execution time. The r2 version pinned
    spark.sql.session.timeZone=UTC session-wide to make that cast safe —
    silently changing unrelated user queries. Instead we build the instant
    zone-free: ``timestamp_micros(ntz_epoch_micros(ts))`` interprets the
    naive value as UTC purely from its fields, so the plan never touches
    session conf and the window boundaries are deterministic in any
    session. Emitted ``window_start`` epochs equal the naive-as-UTC
    reading; display conversion at collect time is the session's concern."""
    from ..functions.timeops import ntz_epoch_micros

    stream = read_pages_stream(spark, pages_dir)
    nodes = extract_nodes_with_ts(stream)
    nodes = nodes.withColumn(
        "warc_ts", F.timestamp_micros(ntz_epoch_micros(F.col("warc_ts")))
    )
    return (
        nodes.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"),
            cell_expr("lat", "lon", res).alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_points")
    )


def run_stream_to_memory(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_tiles",
    res: int = 8,
) -> None:
    """Drain the source with availableNow (batch-parity semantics), writing
    to an in-memory sink — the test/demo harness. Swap format('parquet')
    for the production sink."""
    q = (
        streaming_tile_counts(spark, pages_dir, res)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
