"""Engine function library: cells, geo, text, dedup, similarity."""
