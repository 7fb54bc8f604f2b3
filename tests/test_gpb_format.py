"""GPB1 format tests: roundtrip + the 4-way decoder-equivalence matrix.

Recast of the reference's decoder matrix (FastDecoder/GoDecoder x dense/
non-dense encodings must agree, /root/reference/gosmonaut_test.go:27-41):
here numpy-vectorized vs pure-Python oracle x {raw, zlib} blobs.
"""

from __future__ import annotations

import numpy as np
import pytest

from gosmonaut_spark.fixtures.pages import generate_page, generate_pages
from gosmonaut_spark.format.gpb import (
    DecodedPage,
    PageNodes,
    PageRels,
    PageWays,
    decode_page,
    encode_page,
    zigzag_decode,
    zigzag_encode,
)
from gosmonaut_spark.format.gpb_numpy import (
    decode_page_np,
    decode_varint_stream,
    grouped_delta_cumsum,
    zigzag_decode_arr,
)


def _sample_page() -> DecodedPage:
    p = DecodedPage(text="héllo wörld ☃ bytes".encode("utf-8"))
    p.nodes = PageNodes(
        ids=[-92_233_720, -5, 0, 7, 92_233_720_368],
        lat_units=[deg for deg in (515_074_000, -900_000_000, 0, 1, 899_999_999)],
        lon_units=[-1_800_000_000, 1_799_999_999, 3, -3, 0],
        tags=[{"addr:housenumber": "1", "name": "x"}, {}, {"k": "v"}, {}, {"a": "", "": "never"}],
    )
    # index-0 empty string as a VALUE is legal; as a key idx 0 is the delimiter,
    # so the encoder interns "" at 0 and any empty-string KEY would collide —
    # the generator never emits empty keys.
    p.nodes.tags[4] = {"a": ""}
    p.ways = PageWays(
        ids=[10, -11],
        refs=[[-92_233_720, -5, 7], []],
        tags=[{"highway": "primary"}, {}],
    )
    p.rels = PageRels(
        ids=[100],
        member_ids=[[10, -5, 30_000]],
        member_types=[[2, 1, 4]],
        member_roles=[["outer", "", "via"]],
        tags=[{"type": "multipolygon"}],
    )
    return p


def test_zigzag_roundtrip():
    for n in [0, 1, -1, 2, -2, 63, -64, 2**62, -(2**62), 92_233_720_368]:
        assert zigzag_decode(zigzag_encode(n)) == n
    arr = np.array([zigzag_encode(n) for n in (-5, 0, 7, -(2**40))], dtype=np.int64)
    out = zigzag_decode_arr(arr)
    assert out.tolist() == [-5, 0, 7, -(2**40)]


def test_varint_stream_numpy():
    from gosmonaut_spark.format.gpb import write_varint

    vals = [0, 1, 127, 128, 300, 2**21, 2**35, 2**63 - 1]
    buf = bytearray()
    for v in vals:
        write_varint(buf, v)
    out = decode_varint_stream(np.frombuffer(bytes(buf), dtype=np.uint8))
    assert out.astype(np.uint64).tolist() == vals


def test_grouped_delta_cumsum():
    deltas = np.array([5, 1, 1, 100, -2, 7], dtype=np.int64)
    starts = np.array([0, 3, 5], dtype=np.int64)
    lens = np.array([3, 2, 1], dtype=np.int64)
    out = grouped_delta_cumsum(deltas, starts, lens)
    assert out.tolist() == [5, 6, 7, 100, 98, 7]


def _assert_equivalent(truth: DecodedPage, blob: bytes):
    """Both decoders must reproduce the truth exactly."""
    oracle = decode_page(blob)
    fast = decode_page_np(blob)

    assert oracle.text == truth.text == fast.text

    assert oracle.nodes.ids == truth.nodes.ids
    assert fast.node_ids.tolist() == truth.nodes.ids
    assert oracle.nodes.lat_units == truth.nodes.lat_units
    assert fast.node_lat_units.tolist() == truth.nodes.lat_units
    assert oracle.nodes.lon_units == truth.nodes.lon_units
    assert fast.node_lon_units.tolist() == truth.nodes.lon_units
    assert oracle.nodes.tags == truth.nodes.tags == fast.node_tags

    assert oracle.ways.ids == truth.ways.ids
    assert fast.way_ids.tolist() == truth.ways.ids
    assert oracle.ways.refs == truth.ways.refs
    flat = [r for refs in truth.ways.refs for r in refs]
    assert fast.way_refs.tolist() == flat
    assert fast.way_nrefs.tolist() == [len(r) for r in truth.ways.refs]
    assert oracle.ways.tags == truth.ways.tags == fast.way_tags

    assert oracle.rels.ids == truth.rels.ids
    assert fast.rel_ids.tolist() == truth.rels.ids
    assert oracle.rels.member_ids == truth.rels.member_ids
    assert fast.rel_member_ids.tolist() == [m for ms in truth.rels.member_ids for m in ms]
    assert fast.rel_member_types.tolist() == [t for ts in truth.rels.member_types for t in ts]
    assert fast.rel_member_roles == [r for rs in truth.rels.member_roles for r in rs]
    assert oracle.rels.member_roles == truth.rels.member_roles
    assert oracle.rels.tags == truth.rels.tags == fast.rel_tags


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("node_encoding", ["dense", "sparse"])
def test_equivalence_matrix_handcrafted(compress, node_encoding):
    """2 decoders x 2 compressions x 2 node encodings — the full recast of
    the reference's decoders x encodings matrix (gosmonaut_test.go:27-41:
    FastDecoder/GoDecoder against dense AND non-dense node files)."""
    truth = _sample_page()
    blob = encode_page(truth, compress=compress, node_encoding=node_encoding)
    _assert_equivalent(truth, blob)


def test_sparse_dense_same_entities_different_wire():
    """Same page, both node layouts: identical decode, different bytes."""
    truth = _sample_page()
    dense = encode_page(truth, compress=False, node_encoding="dense")
    sparse = encode_page(truth, compress=False, node_encoding="sparse")
    assert dense != sparse
    a, b = decode_page(dense), decode_page(sparse)
    assert a.nodes == b.nodes and a.ways == b.ways and a.rels == b.rels


def test_equivalence_matrix_generated():
    """Generator pages (idx%4 cycles zlib/raw x dense/sparse) through both
    decoders — the corpus itself carries all four wire combinations."""
    from gosmonaut_spark.format.gpb import FLAG_SPARSE_NODES, FLAG_ZLIB

    seen = set()
    for spec in generate_pages(40, seed=42):
        _assert_equivalent(spec.truth, spec.html)
        # byte-identical extracted text per url (north-rule invariant)
        assert decode_page_np(spec.html).text.decode("utf-8") == spec.text
        flags = spec.html[4]
        seen.add((bool(flags & FLAG_ZLIB), bool(flags & FLAG_SPARSE_NODES)))
    assert seen == {(False, False), (False, True), (True, False), (True, True)}


def test_generator_determinism():
    a = generate_page(17, seed=42)
    b = generate_page(17, seed=42)
    assert a.html == b.html and a.text == b.text and a.url == b.url


def test_empty_page():
    truth = DecodedPage(text=b"")
    blob = encode_page(truth, compress=True)
    _assert_equivalent(truth, blob)


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        decode_page(b"XXXX\x00")
    with pytest.raises(ValueError):
        decode_page_np(b"XXXX\x00")


def test_selective_section_decode():
    """Typed extraction seeks over unwanted sections via the directory."""
    spec = generate_page(3, seed=42)
    full = decode_page_np(spec.html)
    w = decode_page_np(spec.html, want=("ways",))
    assert w.way_ids.tolist() == full.way_ids.tolist()
    assert w.way_refs.tolist() == full.way_refs.tolist()
    assert w.way_tags == full.way_tags
    assert w.node_ids.size == 0 and w.text == b""
    t = decode_page_np(spec.html, want=("text",))
    assert t.text == full.text and t.way_ids.size == 0
