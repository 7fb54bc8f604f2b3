"""Streaming MERGE sink — micro-batches upsert into a CheckpointStore
table (the Delta/Iceberg ``foreachBatch`` + MERGE INTO pattern).

Closes the loop between the engine's streaming surface and its
versioned table seam: a keyed update stream (CDC feed, entity
snapshots, dedup-manifest deltas) lands as one
:meth:`..plans.checkpoint.CheckpointStore.merge_upsert` commit per
non-empty micro-batch — so the table history IS the stream history
(one snapshot per batch, parent lineage, time travel to any point of
the ingest, rollback on bad data), and
:meth:`..plans.checkpoint.CheckpointStore.compact_files` /
``expire_snapshots`` handle the small-file accretion streaming sinks
cause.

Exactly-once story: Structured Streaming may REPLAY a micro-batch
after a failure, so the sink must be idempotent per batch. Keyed
upserts are: re-merging the same (key → latest row) set reproduces the
same table content (matched keys are replaced with identical rows).
Within a batch, multiple rows per key are collapsed to the latest by
``seq_col`` BEFORE the merge (ties by the remaining columns' arbitrary
order would be nondeterministic, so ``seq_col`` must be unique per key
within a batch — event time almost always is; the collapse makes the
batch's effect a pure function of its row SET, not its order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    updates: DataFrame, key_cols: list[str], seq_col: str
) -> DataFrame:
    """Collapse an update set to the newest row per key (deterministic:
    ``seq_col`` DESC; callers guarantee it is unique per key within the
    set — the CDC contract)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        updates.select("*", F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_merge_to_checkpoint(
    updates: DataFrame,
    store,
    name: str,
    key_cols: list[str],
    seq_col: str,
    checkpoint_dir: str,
    delete_col: str | None = None,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Start a streaming query that merges each micro-batch into
    ``store[name]`` by ``key_cols``. Returns the StreamingQuery.

    Per batch: collapse to latest-per-key (``seq_col``), then one
    copy-on-write ``merge_upsert`` commit (insert/update/tombstone via
    ``delete_col``). Empty batches commit nothing — table history has
    one snapshot per EFFECTIVE batch.
    """
    keys = list(key_cols)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.merge_upsert(
            name,
            latest_per_key(batch_df, keys, seq_col),
            keys,
            delete_col=delete_col,
            partition_by=partition_by,
        )

    writer = updates.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
