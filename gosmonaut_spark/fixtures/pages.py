"""Deterministic synthetic `pages` table generator (seed 42).

Produces the north-rule input table ``(url, warc_ts, html, text, lang)`` where
``html`` is a GPB1 blob encoding a complete nested-entity world per page —
the analog of the reference's London PBF test corpus
(/root/reference/gosmonaut_test.go:14-25). Properties (per FIXTURES.md §1):

* 50% of blobs zlib-compressed, 50% raw (the raw/zlib branch of
  /root/reference/decode.go:491-515);
* ~5% of way refs point to nodes on *other* pages — forces a genuine
  shuffle join during way assembly;
* ~1% of ways carry a dangling node ref (missing-entity semantics,
  /root/reference/gosmonaut.go:379-387) — disable with ``dangling=False``
  for strict-mode fixtures;
* occasional sub-relation members (dropped with a warning,
  /root/reference/gosmonaut.go:459-462) and dangling relation members
  (dropped, /root/reference/gosmonaut.go:441-465);
* a few pages use negative entity ids (/root/reference/osm_types_test.go:10);
* pages cluster around 20 skew-weighted "cities" so high-resolution tile
  aggregation sees genuinely hot cells (exercises salting, B10);
* ~30% of ways are closed convex rings (polygons) for the PIP engine.

Everything is a pure function of (seed, n_pages, flags): re-running the
generator yields byte-identical blobs.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..format.gpb import (
    NODE_TYPE,
    RELATION_TYPE,
    WAY_TYPE,
    DecodedPage,
    PageNodes,
    PageRels,
    PageWays,
    deg_to_unit,
    encode_page,
    unit_to_deg,
)

EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

_WORDS = (
    "river bridge market square harbor garden tower station museum castle "
    "north south east west old new upper lower grand little stone iron glass "
    "street road lane avenue plaza crossing terrace quay walk gate"
).split()

_LANGS = ["en", "de", "fr", "es", "pt", "und"]

_NODE_AMENITIES = ["cafe", "bank", "school", "pharmacy", "library", "fuel"]
_HIGHWAYS = ["residential", "primary", "secondary", "footway", "service"]
_REL_TYPES = ["multipolygon", "restriction", "route", "boundary"]
_ROLES = ["outer", "inner", "via", "from", "to", ""]

N_CITIES = 20


def city_centers() -> np.ndarray:
    """20 deterministic city centers, lat in [-60, 60], lon in [-170, 170]."""
    rng = np.random.default_rng(4242)
    lats = rng.uniform(-60, 60, N_CITIES)
    lons = rng.uniform(-170, 170, N_CITIES)
    return np.stack([lats, lons], axis=1)


def city_weights() -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, N_CITIES + 1), 1.5)
    return w / w.sum()


@dataclass
class PageSpec:
    """One generated page plus its ground-truth decode."""

    url: str
    warc_ts: _dt.datetime
    html: bytes
    text: str
    lang: str
    truth: DecodedPage


def _page_text(rng: np.random.Generator, url: str) -> str:
    n = int(rng.integers(20, 60))
    words = rng.choice(_WORDS, n)
    return f"{url} :: " + " ".join(words.tolist())


def generate_page(page_idx: int, seed: int = 42, *, dangling: bool = True) -> PageSpec:
    rng = np.random.default_rng((seed, page_idx))
    centers = city_centers()
    city = int(rng.choice(N_CITIES, p=city_weights()))
    clat, clon = centers[city]

    url = f"https://synth.example/{city:04d}/{page_idx:06d}"
    ts = EPOCH + _dt.timedelta(seconds=int(page_idx) * 7)
    lang = str(rng.choice(_LANGS))
    text = _page_text(rng, url)

    negative = page_idx % 97 == 3
    base = (page_idx + 1) * 100_000

    page = DecodedPage(text=text.encode("utf-8"))

    # --- scatter point nodes around the city center
    n_pts = int(rng.poisson(40))
    lats = clat + rng.normal(0, 0.05, n_pts)
    lons = clon + rng.normal(0, 0.05, n_pts)
    ids = base + np.arange(n_pts)
    if negative:
        ids = -ids
    nodes = PageNodes()
    nodes.ids = ids.tolist()
    nodes.lat_units = [deg_to_unit(v) for v in lats]
    nodes.lon_units = [deg_to_unit(v) for v in lons]
    for i in range(n_pts):
        tags: dict[str, str] = {}
        r = rng.random()
        if r < 0.15:
            tags["addr:housenumber"] = str(int(rng.integers(1, 300)))
            tags["addr:street"] = f"{rng.choice(_WORDS)} street"
        elif r < 0.40:
            tags["amenity"] = str(rng.choice(_NODE_AMENITIES))
        if rng.random() < 0.10:
            tags["name"] = f"{rng.choice(_WORDS)} {rng.choice(_WORDS)}"
        nodes.tags.append(tags)
    page.nodes = nodes

    next_local = n_pts  # next node offset within this page's id block

    # --- ways: open polylines + closed convex rings (polygons)
    ways = PageWays()
    n_ways = max(1, int(rng.poisson(6)))
    way_base = 10_000_000_000 + page_idx * 100
    for j in range(n_ways):
        wid = way_base + j
        closed = rng.random() < 0.30
        wtags: dict[str, str] = {}
        if closed and n_pts > 0:
            # dedicated ring vertices: convex polygon around a sub-center
            k = int(rng.integers(4, 9))
            rlat = clat + rng.normal(0, 0.04)
            rlon = clon + rng.normal(0, 0.04)
            radius = rng.uniform(0.002, 0.02)
            angles = np.sort(rng.uniform(0, 2 * np.pi, k))
            vlats = rlat + radius * np.sin(angles)
            vlons = rlon + radius * np.cos(angles) / max(np.cos(np.radians(rlat)), 0.2)
            vids = base + next_local + np.arange(k)
            if negative:
                vids = -vids
            next_local += k
            nodes.ids.extend(vids.tolist())
            nodes.lat_units.extend(deg_to_unit(v) for v in vlats)
            nodes.lon_units.extend(deg_to_unit(v) for v in vlons)
            nodes.tags.extend({} for _ in range(k))
            refs = vids.tolist() + [int(vids[0])]  # ring closure
            wtags["building"] = "yes" if rng.random() < 0.5 else "industrial"
        else:
            k = int(rng.integers(3, 13))
            k = min(k, max(n_pts, 1))
            pick = rng.choice(max(n_pts, 1), size=k, replace=False) if n_pts else np.array([], int)
            refs = [int(nodes.ids[p]) for p in pick]
            wtags["highway"] = str(rng.choice(_HIGHWAYS))
            if rng.random() < 0.2:
                wtags["name"] = f"{rng.choice(_WORDS)} road"
        if rng.random() < 0.1:
            wtags["addr:housenumber"] = str(int(rng.integers(1, 300)))
        # ~5% cross-page ref: borrow a node from the previous page (open
        # polylines only — rings stay local so polygons remain simple)
        if page_idx > 0 and rng.random() < 0.05 and refs and not closed:
            prev_base = page_idx * 100_000
            prev_neg = (page_idx - 1) % 97 == 3
            borrow = prev_base + int(rng.integers(0, 20))
            refs[len(refs) // 2] = -borrow if prev_neg else borrow
        # ~1% dangling ref (strict mode must fail; skip mode drops the node)
        if dangling and rng.random() < 0.01 and refs:
            refs.append(888_888_888_888 + page_idx)
        ways.ids.append(wid)
        ways.refs.append(refs)
        ways.tags.append(wtags)
    page.ways = ways

    # --- relations
    rels = PageRels()
    if rng.random() < 0.8:
        rid = 20_000_000_000 + page_idx * 10
        rtags = {"type": str(rng.choice(_REL_TYPES))}
        if rng.random() < 0.1:
            rtags["addr:housenumber"] = str(int(rng.integers(1, 300)))
        n_mem = int(rng.integers(2, 7))
        mids: list[int] = []
        mtypes: list[int] = []
        mroles: list[str] = []
        for _ in range(n_mem):
            r = rng.random()
            if r < 0.55 and ways.ids:
                mids.append(int(rng.choice(ways.ids)))
                mtypes.append(WAY_TYPE)
            elif r < 0.90 and nodes.ids:
                mids.append(int(rng.choice(nodes.ids)))
                mtypes.append(NODE_TYPE)
            elif r < 0.95:
                mids.append(30_000_000_000 + page_idx)  # sub-relation: dropped
                mtypes.append(RELATION_TYPE)
            else:
                mids.append(int(ways.ids[0]) + 7_777)  # dangling member: dropped
                mtypes.append(WAY_TYPE)
            mroles.append(str(rng.choice(_ROLES)))
        rels.ids.append(rid)
        rels.member_ids.append(mids)
        rels.member_types.append(mtypes)
        rels.member_roles.append(mroles)
        rels.tags.append(rtags)
    page.rels = rels

    # cycle all four wire combinations across pages: (zlib|raw) x
    # (dense|sparse) node encoding — the corpus itself exercises the full
    # decoder matrix (reference gosmonaut_test.go:27-41 runs 4-way too)
    compress = page_idx % 2 == 0
    node_enc = "sparse" if page_idx % 4 >= 2 else "dense"
    html = encode_page(page, compress=compress, node_encoding=node_enc)
    return PageSpec(url=url, warc_ts=ts, html=html, text=text, lang=lang, truth=page)


def generate_pages(n_pages: int, seed: int = 42, *, dangling: bool = True) -> list[PageSpec]:
    return [generate_page(i, seed, dangling=dangling) for i in range(n_pages)]


def pages_arrow_table(n_pages: int, seed: int = 42, *, dangling: bool = True) -> pa.Table:
    specs = generate_pages(n_pages, seed, dangling=dangling)
    return pa.table(
        {
            "url": pa.array([s.url for s in specs], pa.string()),
            "warc_ts": pa.array([s.warc_ts.replace(tzinfo=None) for s in specs], pa.timestamp("us")),
            "html": pa.array([s.html for s in specs], pa.binary()),
            "text": pa.array([s.text for s in specs], pa.string()),
            "lang": pa.array([s.lang for s in specs], pa.string()),
        }
    )


HEADER_META_KEY = b"gosmonaut.header"
FIXTURE_FEATURES = ["GPB1-v1", "DenseGeo"]


def _specs_bbox(specs: list[PageSpec]) -> tuple[float, float, float, float]:
    """(left, right, top, bottom) over every node, same decode law as the
    engine (unit -> deg)."""
    left = bottom = float("inf")
    right = top = float("-inf")
    for s in specs:
        for u in s.truth.nodes.lon_units:
            d = unit_to_deg(u)
            left = min(left, d)
            right = max(right, d)
        for u in s.truth.nodes.lat_units:
            d = unit_to_deg(u)
            bottom = min(bottom, d)
            top = max(top, d)
    return left, right, top, bottom


def header_dict(n_pages: int, seed: int, bbox: tuple[float, float, float, float]) -> dict:
    """The table-level Header — the analog of the reference's HeaderBlock
    (/root/reference/decode.go:54-71): bbox, required/optional features,
    writing program, source, osmosis-style replication metadata."""
    left, right, top, bottom = bbox
    return {
        "bounding_box": {"left": left, "right": right, "top": top, "bottom": bottom},
        "required_features": list(FIXTURE_FEATURES),
        "optional_features": ["Sort.Type_then_ID"],
        "writing_program": "gosmonaut_spark_fixture/1.0",
        "source": f"synthetic-seed-{seed}",
        "osmosis_replication_timestamp": int(EPOCH.timestamp()),
        "osmosis_replication_sequence_number": n_pages,
        "osmosis_replication_base_url": "https://synth.example/replication",
    }


def _with_header_meta(tbl: pa.Table, header: dict) -> pa.Table:
    import json as _json

    meta = dict(tbl.schema.metadata or {})
    meta[HEADER_META_KEY] = _json.dumps(header, sort_keys=True).encode("utf-8")
    return tbl.replace_schema_metadata(meta)


def write_pages_parquet(path: str, n_pages: int, seed: int = 42, *, dangling: bool = True) -> str:
    """Write the pages table as parquet (Header carried as parquet footer
    key-value metadata — the Iceberg-table-properties analog); returns the
    path."""
    import pyarrow.parquet as pq

    specs = generate_pages(n_pages, seed, dangling=dangling)
    tbl = pa.table(
        {
            "url": pa.array([s.url for s in specs], pa.string()),
            "warc_ts": pa.array([s.warc_ts.replace(tzinfo=None) for s in specs], pa.timestamp("us")),
            "html": pa.array([s.html for s in specs], pa.binary()),
            "text": pa.array([s.text for s in specs], pa.string()),
            "lang": pa.array([s.lang for s in specs], pa.string()),
        }
    )
    tbl = _with_header_meta(tbl, header_dict(n_pages, seed, _specs_bbox(specs)))
    # small row groups: Spark can only split parquet at row-group
    # boundaries — a single-group file serializes every decode stage
    # onto one task
    pq.write_table(tbl, path, compression="zstd", row_group_size=512)
    return path


def _gen_chunk(args: tuple) -> tuple[bytes, tuple[float, float, float, float]]:
    """Worker: generate [start, stop) pages, return a serialized Arrow IPC
    batch (pickling Arrow tables across processes via IPC bytes) plus the
    chunk's node bbox."""
    import io

    import pyarrow.ipc as ipc

    start, stop, seed, dangling = args
    specs = [generate_page(i, seed, dangling=dangling) for i in range(start, stop)]
    tbl = pa.table(
        {
            "url": pa.array([s.url for s in specs], pa.string()),
            "warc_ts": pa.array(
                [s.warc_ts.replace(tzinfo=None) for s in specs], pa.timestamp("us")
            ),
            "html": pa.array([s.html for s in specs], pa.binary()),
            "text": pa.array([s.text for s in specs], pa.string()),
            "lang": pa.array([s.lang for s in specs], pa.string()),
        }
    )
    sink = io.BytesIO()
    with ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue(), _specs_bbox(specs)


def write_pages_parquet_parallel(
    path: str, n_pages: int, seed: int = 42, *, dangling: bool = True, procs: int | None = None
) -> str:
    """Multiprocess generator for bench-scale fixtures (pages are pure
    functions of (seed, idx), so the split is embarrassingly parallel and
    byte-identical to the serial path)."""
    import io
    import multiprocessing as mp
    import os

    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    procs = procs or min(os.cpu_count() or 8, 32)
    chunk = max(250, (n_pages + procs - 1) // procs)
    jobs = [
        (lo, min(lo + chunk, n_pages), seed, dangling)
        for lo in range(0, n_pages, chunk)
    ]
    # fork, not spawn: workers inherit the loaded interpreter (numpy etc.) —
    # generate fixtures BEFORE starting the JVM/SparkSession in the process
    with mp.get_context("fork").Pool(procs) as pool:
        parts = pool.map(_gen_chunk, jobs)
    tables = [ipc.open_stream(io.BytesIO(b)).read_all() for b, _bb in parts]
    bboxes = [bb for _b, bb in parts]
    bbox = (
        min(bb[0] for bb in bboxes),
        max(bb[1] for bb in bboxes),
        max(bb[2] for bb in bboxes),
        min(bb[3] for bb in bboxes),
    )
    merged = _with_header_meta(
        pa.concat_tables(tables), header_dict(n_pages, seed, bbox)
    )
    # small row groups -> splittable scan (see write_pages_parquet)
    pq.write_table(merged, path, compression="zstd", row_group_size=512)
    return path


# Scale profiles (FIXTURES.md §4): t1 smoke / t2 correctness / bench /
# scale (4x bench — scaling-efficiency legs, long enough that fixed
# per-job costs stop dominating the measurement).
PROFILES = {"t1": 500, "t2": 5_000, "bench": 50_000, "scale": 200_000}

DEFAULT_CACHE = "/root/repo/.cache/pages"


# ---------------------------------------------------------------------------
# ground-truth snapshot tables (driver-oracle side)
#
# The generator knows every entity *before* encoding, so it can emit flat
# relational "truth" tables that DuckDB reads directly — the analog of the
# reference's Osmonaut-verified golden counts (/root/reference/
# gosmonaut_test.go:43-75): an independent source of the expected join
# results, never touched by the Spark decode/assembly path under test.
# ---------------------------------------------------------------------------


def _tags_sorted(tags: dict[str, str]) -> str:
    return ";".join(f"{k}={v}" for k, v in sorted(tags.items()))


def _truth_chunk(args: tuple) -> tuple[bytes, ...]:
    """Worker: truth rows for pages [start, stop) as five Arrow IPC streams,
    one per truth table (node/way_ref/way/rel_member/rel)."""
    import io

    import pyarrow.ipc as ipc

    start, stop, seed, dangling = args
    cols: dict[str, list] = {
        "n_id": [], "n_lat": [], "n_lon": [], "n_tags": [],
        "wr_way": [], "wr_pos": [], "wr_ref": [],
        "w_id": [], "w_tags": [],
        "rm_rel": [], "rm_pos": [], "rm_ref": [], "rm_type": [], "rm_role": [],
        "r_id": [], "r_tags": [],
    }
    tname = {NODE_TYPE: "node", WAY_TYPE: "way", RELATION_TYPE: "relation"}
    for i in range(start, stop):
        t = generate_page(i, seed, dangling=dangling).truth
        n = t.nodes
        cols["n_id"].extend(n.ids)
        cols["n_lat"].extend(unit_to_deg(u) for u in n.lat_units)
        cols["n_lon"].extend(unit_to_deg(u) for u in n.lon_units)
        cols["n_tags"].extend(_tags_sorted(tg) for tg in n.tags)
        for wid, refs, wtags in zip(t.ways.ids, t.ways.refs, t.ways.tags):
            cols["w_id"].append(wid)
            cols["w_tags"].append(_tags_sorted(wtags))
            cols["wr_way"].extend([wid] * len(refs))
            cols["wr_pos"].extend(range(len(refs)))
            cols["wr_ref"].extend(refs)
        r = t.rels
        for rid, mids, mtypes, mroles, rtags in zip(
            r.ids, r.member_ids, r.member_types, r.member_roles, r.tags
        ):
            cols["r_id"].append(rid)
            cols["r_tags"].append(_tags_sorted(rtags))
            cols["rm_rel"].extend([rid] * len(mids))
            cols["rm_pos"].extend(range(len(mids)))
            cols["rm_ref"].extend(mids)
            cols["rm_type"].extend(tname[mt] for mt in mtypes)
            cols["rm_role"].extend(mroles)
    def _typ(k: str):
        if k in ("n_tags", "w_tags", "rm_type", "rm_role", "r_tags"):
            return pa.string()
        if k in ("n_lat", "n_lon"):
            return pa.float64()
        return pa.int64()

    groups = {
        "nodes": {"n_id": "id", "n_lat": "lat", "n_lon": "lon", "n_tags": "tags_sorted"},
        "way_refs": {"wr_way": "way_id", "wr_pos": "pos", "wr_ref": "ref"},
        "ways": {"w_id": "way_id", "w_tags": "tags_sorted"},
        "rel_members": {
            "rm_rel": "rel_id", "rm_pos": "pos", "rm_ref": "ref",
            "rm_type": "mtype", "rm_role": "role",
        },
        "rels": {"r_id": "rel_id", "r_tags": "tags_sorted"},
    }
    out = []
    for mapping in groups.values():
        tbl = pa.table(
            {out_name: pa.array(cols[k], _typ(k)) for k, out_name in mapping.items()}
        )
        sink = io.BytesIO()
        with ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        out.append(sink.getvalue())
    return tuple(out)


TRUTH_TABLES = ("nodes", "way_refs", "ways", "rel_members", "rels")


def write_truth_parquet(
    out_dir: str, n_pages: int, seed: int = 42, *, dangling: bool = True
) -> dict[str, str]:
    """Write the five ground-truth tables as parquet under ``out_dir``;
    returns {table_name: path}. Deterministic per (seed, n_pages)."""
    import io
    import multiprocessing as mp
    import os

    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    if n_pages >= 10_000:
        procs = min(os.cpu_count() or 8, 32)
        chunk = max(250, (n_pages + procs - 1) // procs)
        jobs = [
            (lo, min(lo + chunk, n_pages), seed, dangling)
            for lo in range(0, n_pages, chunk)
        ]
        with mp.get_context("fork").Pool(procs) as pool:
            parts = pool.map(_truth_chunk, jobs)
    else:
        parts = [_truth_chunk((0, n_pages, seed, dangling))]
    paths: dict[str, str] = {}
    for ti, name in enumerate(TRUTH_TABLES):
        tbl = pa.concat_tables(
            ipc.open_stream(io.BytesIO(p[ti])).read_all() for p in parts
        )
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, path, compression="zstd")
        paths[name] = path
    return paths


def ensure_truth_parquet(
    profile: str, cache_dir: str = DEFAULT_CACHE
) -> dict[str, str]:
    """Generate-once cache of the truth tables for a named profile."""
    import os

    n = PROFILES[profile]
    out_dir = os.path.join(cache_dir, f"truth_{profile}_{n}")
    done = os.path.join(out_dir, "_DONE")
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in TRUTH_TABLES}
    if os.path.exists(done):
        return paths
    write_truth_parquet(out_dir, n)
    with open(done, "w") as f:
        f.write("ok\n")
    return paths


def ensure_pages_parquet(profile: str, cache_dir: str = DEFAULT_CACHE) -> str:
    """Generate-once cache of the pages parquet for a named profile."""
    import os

    n = PROFILES[profile]
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"pages_{profile}_{n}.parquet")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        if n >= 10_000:
            write_pages_parquet_parallel(tmp, n)
        else:
            write_pages_parquet(tmp, n)
        os.replace(tmp, path)
    return path
