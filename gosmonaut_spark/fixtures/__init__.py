"""Deterministic synthetic fixtures (seed 42) — the pages table generator."""
