"""GPB1 — the GeoPage Binary payload format and its two decoders."""
