"""Canonical entity JSON (A19) — the reference's Overpass-like format.

Mirrors /root/reference/osm_types.go:56-146 + prettyPrintEntity
(:272-286): 2-space indent, alphabetically sorted tag keys, coords printed
with exactly 7 decimals (%.7f), node ``tags`` omitted when empty
(osm_types.go:62 omitempty) while way/relation always print ``tags``,
members as {role, entity} objects, trailing newline. ``F.to_json`` cannot
hit this byte layout, so serialization is a tiny deterministic writer,
applied per row inside ``mapInPandas`` (Arrow-batched, not per-row Python
at the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_IND = "  "


def _esc(s: str) -> str:
    import json as _json

    return _json.dumps(s, ensure_ascii=False)


def _coord(v: float) -> str:
    return f"{v:.7f}"


def _write_tags(tags: dict, depth: int) -> str:
    if not tags:
        return "{}"
    pad, pad1 = _IND * depth, _IND * (depth + 1)
    items = [f"{pad1}{_esc(k)}: {_esc(tags[k])}" for k in sorted(tags)]
    return "{\n" + ",\n".join(items) + f"\n{pad}}}"


def node_json(id: int, lat: float, lon: float, tags: dict | None, depth: int = 0) -> str:
    pad, pad1 = _IND * depth, _IND * (depth + 1)
    lines = [
        f'{pad1}"type": "node"',
        f'{pad1}"id": {id}',
        f'{pad1}"lat": {_coord(lat)}',
        f'{pad1}"lon": {_coord(lon)}',
    ]
    if tags:
        lines.append(f'{pad1}"tags": {_write_tags(tags, depth + 1)}')
    return "{\n" + ",\n".join(lines) + f"\n{pad}}}"


def way_json(id: int, tags: dict | None, nodes: list, depth: int = 0) -> str:
    pad, pad1 = _IND * depth, _IND * (depth + 1)
    lines = [
        f'{pad1}"type": "way"',
        f'{pad1}"id": {id}',
        f'{pad1}"tags": {_write_tags(tags or {}, depth + 1)}',
    ]
    if len(nodes) > 0:  # arrays arrive as numpy arrays via Arrow
        inner = ",\n".join(
            _IND * (depth + 2)
            + node_json(n["id"], n["lat"], n["lon"], n["tags"], depth + 2).lstrip()
            for n in nodes
        )
        lines.append(f'{pad1}"nodes": [\n{inner}\n{pad1}]')
    else:
        lines.append(f'{pad1}"nodes": []')
    return "{\n" + ",\n".join(lines) + f"\n{pad}}}"


def relation_json(id: int, tags: dict | None, members: list, depth: int = 0) -> str:
    pad, pad1, pad2, pad3 = (_IND * (depth + i) for i in range(4))
    lines = [
        f'{pad1}"type": "relation"',
        f'{pad1}"id": {id}',
        f'{pad1}"tags": {_write_tags(tags or {}, depth + 1)}',
    ]
    if len(members) > 0:  # numpy array via Arrow
        ms = []
        for m in members:
            if m["type"] == "way":
                w = m["way"]
                ent = way_json(w["id"], w["tags"], w["nodes"], depth + 3).lstrip()
            else:
                n = m["node"]
                ent = node_json(n["id"], n["lat"], n["lon"], n["tags"], depth + 3).lstrip()
            ms.append(
                f'{pad2}{{\n{pad3}"role": {_esc(m["role"])},\n'
                f'{pad3}"entity": {ent}\n{pad2}}}'
            )
        lines.append(f'{pad1}"members": [\n' + ",\n".join(ms) + f"\n{pad1}]")
    else:
        lines.append(f'{pad1}"members": []')
    return "{\n" + ",\n".join(lines) + f"\n{pad}}}"


def _entity_str(kind: str, row: dict) -> str:
    if kind == "node":
        return node_json(row["id"], row["lat"], row["lon"], row["tags"]) + "\n"
    if kind == "way":
        return way_json(row["id"], row["tags"], row["nodes"]) + "\n"
    return relation_json(row["id"], row["tags"], row["members"]) + "\n"


def entities_to_json(df: DataFrame, kind: str) -> DataFrame:
    """Attach the canonical JSON per entity: (id, entity_json)."""
    cols = {
        "node": ["id", "lat", "lon", "tags"],
        "way": ["id", "tags", "nodes"],
        "relation": ["id", "tags", "members"],
    }[kind]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # serialization is inherently per-row, but to_dict('records') is
            # ~10x cheaper than iterrows (no per-row Series construction)
            out = [
                _entity_str(kind, row)
                for row in pdf[cols].to_dict("records")
            ]
            yield pd.DataFrame({"id": pdf["id"], "entity_json": out})

    return df.select(*cols).mapInPandas(fn, "id long, entity_json string")
