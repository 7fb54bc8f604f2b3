"""Plans: the 5-pass pipeline orchestration + checkpoint/lineage."""
