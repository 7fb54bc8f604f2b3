"""Checkpoint/resume/lineage (B11): idempotent re-runs + partial resume."""

from __future__ import annotations

from gosmonaut_spark.plans.checkpoint import CheckpointStore, run_pipeline_checkpointed


def _counts(dfs):
    return {k: v.count() for k, v in dfs.items()}


def test_checkpoint_resume_and_lineage(spark, pages_t1, tmp_path):
    base = str(tmp_path / "ck")
    ck, dfs = run_pipeline_checkpointed(spark, pages_t1, base, debug=True)
    first = _counts(dfs)
    lineage1 = ck.lineage()
    passes = [e["pass"] for e in lineage1]
    # one decode pass for all entity kinds, then the two assembly passes
    assert passes == ["entities", "assembled_ways", "relations"]
    for e in lineage1:
        assert e["rows_out"] > 0 and e["wall_ms"] > 0
        assert sum(e["rows_per_partition"]) == e["rows_out"]

    # idempotent re-run: snapshots hit, no new lineage entries, same rows
    ck2, dfs2 = run_pipeline_checkpointed(spark, pages_t1, base)
    assert _counts(dfs2) == first
    assert len(ck2.lineage()) == len(lineage1)

    # partial resume: drop a late pass -> only that pass recomputes
    ck2.invalidate("relations")
    ck3, dfs3 = run_pipeline_checkpointed(spark, pages_t1, base)
    assert _counts(dfs3) == first
    lineage3 = ck3.lineage()
    assert len(lineage3) == len(lineage1) + 1
    assert lineage3[-1]["pass"] == "relations"


def test_checkpoint_outputs_match_direct(spark, pages_t1, tmp_path):
    """Checkpointed pipeline == direct pipeline, row for row."""
    from pyspark.sql import functions as F

    from gosmonaut_spark.operators.assembly import SKIP_MISSING
    from gosmonaut_spark.plans.pipeline import run_pipeline

    _, dfs = run_pipeline_checkpointed(spark, pages_t1, str(tmp_path / "ck2"))
    direct = run_pipeline(pages_t1, {"node", "way", "relation"}, None, mode=SKIP_MISSING)

    a = {
        r.id: r.n
        for r in dfs["assembled_ways"].select("id", F.size("nodes").alias("n")).collect()
    }
    # direct emits only predicate-matching ways; with no predicate both match
    b = {
        r.id: r.n
        for r in direct.ways.select("id", F.size("nodes").alias("n")).collect()
    }
    assert a == b
