"""Vectorized numpy decoder for GPB1 blobs — the engine-side fast path.

Independent implementation of the format in :mod:`gosmonaut_spark.format.gpb`
(which holds the pure-Python oracle). The two must agree byte-for-byte on
every page — the recast of the reference's FastDecoder/GoDecoder equivalence
tests (/root/reference/gosmonaut_test.go:27-41; FastDecoder is the hand-rolled
streaming parser at /root/reference/fast_blob_decoder.go:56-66).

Strategy: decode *all* varints of a section in one ``np.add.reduceat`` pass,
then interpret the resulting int64 value stream with numpy cursor arithmetic
(delta reconstruction = ``np.cumsum`` with per-group base subtraction; the
0-delimited key/value tag stream splits on zero positions). No per-byte
Python in the hot path.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np

from .gpb import FLAG_SPARSE_NODES, FLAG_ZLIB, MAGIC

_SHIFTS = (np.arange(10, dtype=np.uint64) * np.uint64(7))


def decode_varint_stream(buf: np.ndarray) -> np.ndarray:
    """Decode a back-to-back LEB128 varint stream.

    ``buf`` is a uint8 array that contains *only* whole varints. Returns an
    int64 array of the decoded unsigned values (values must fit in 64 bits;
    the encoder guarantees that).
    """
    if buf.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (buf & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its varint
    pos_in_group = np.arange(buf.size, dtype=np.int64) - np.repeat(
        starts, ends - starts + 1
    )
    shifted = (buf & 0x7F).astype(np.uint64) << (
        pos_in_group.astype(np.uint64) * np.uint64(7)
    )
    vals = np.add.reduceat(shifted, starts)
    return vals.astype(np.int64)


def zigzag_decode_arr(u: np.ndarray) -> np.ndarray:
    uu = u.astype(np.uint64)
    return ((uu >> np.uint64(1)).astype(np.int64)) ^ -(u & 1)


def grouped_delta_cumsum(deltas: np.ndarray, group_starts: np.ndarray, group_lens: np.ndarray) -> np.ndarray:
    """Reconstruct per-group running sums: within each group the first value
    is absolute and the rest are deltas. Fully vectorized."""
    if deltas.size == 0:
        return deltas
    c = np.cumsum(deltas)
    cext = np.concatenate(([0], c[:-1]))
    # clamp: an empty group's start may point past the end; it repeats 0 times
    starts = np.minimum(group_starts, deltas.size - 1)
    base = np.repeat(cext[starts], group_lens)
    return c - base


@dataclass
class NumpyPage:
    """Arrays-of-struct view of one decoded page (engine representation)."""

    text: bytes
    node_ids: np.ndarray
    node_lat_units: np.ndarray
    node_lon_units: np.ndarray
    node_tags: list[dict[str, str]]
    way_ids: np.ndarray
    way_nrefs: np.ndarray
    way_refs: np.ndarray  # flat, grouped by way_nrefs
    way_tags: list[dict[str, str]]
    rel_ids: np.ndarray
    rel_nmembers: np.ndarray
    rel_member_ids: np.ndarray  # flat
    rel_member_types: np.ndarray  # flat
    rel_member_roles: list[str]  # flat
    rel_tags: list[dict[str, str]]


class _Cursor:
    """Byte cursor that hands sections to the vectorized decoders.

    Only the *section framing* (counts and byte extents) is walked
    sequentially; all value payloads are decoded in bulk.
    """

    __slots__ = ("buf", "pos")

    def __init__(self, buf: np.ndarray):
        self.buf = buf
        self.pos = 0

    def varint(self) -> int:
        u = 0
        shift = 0
        while True:
            b = int(self.buf[self.pos])
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                return u
            shift += 7

    def take_varints(self, count: int) -> np.ndarray:
        """Bulk-decode exactly ``count`` varints starting at the cursor."""
        if count == 0:
            return np.empty(0, dtype=np.int64)
        rest = self.buf[self.pos :]
        is_end = (rest & 0x80) == 0
        ends = np.flatnonzero(is_end)
        if ends.size < count:
            raise ValueError("truncated varint stream")
        stop = int(ends[count - 1]) + 1
        vals = decode_varint_stream(rest[:stop])
        self.pos += stop
        return vals

    def take_bytes(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n].tobytes()
        if len(b) != n:
            raise ValueError("truncated buffer")
        self.pos += n
        return b

    def take_keyval_stream(self, n_groups: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the 0-delimited key/value stream for ``n_groups`` entities.

        Returns (group_index, key_idx, val_idx) flat arrays: pair *i* belongs
        to entity ``group_index[i]``.
        """
        if n_groups == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        rest = self.buf[self.pos :]
        is_end = (rest & 0x80) == 0
        ends = np.flatnonzero(is_end)
        vals_all = None
        # We do not know how many varints the stream holds until we count n
        # zeros; decode increasingly large prefixes is wasteful, so decode the
        # whole remaining buffer's varint *ends*, then find the n-th zero
        # among single-byte zero varints. A zero varint is exactly one byte
        # 0x00, so zeros are positions where rest[pos]==0 and pos is a varint
        # start. Varint starts = 0 plus ends[:-1]+1.
        starts = np.empty_like(ends)
        if ends.size:
            starts[0] = 0
            starts[1:] = ends[:-1] + 1
        zero_starts = starts[rest[starts] == 0] if ends.size else starts
        if zero_starts.size < n_groups:
            raise ValueError("truncated keyval stream")
        last_zero = int(zero_starts[n_groups - 1])
        n_varints = int(np.searchsorted(ends, last_zero, side="left")) + 1
        vals_all = decode_varint_stream(rest[: last_zero + 1])
        assert vals_all.size == n_varints
        self.pos += last_zero + 1

        zero_mask = vals_all == 0
        # group id of each varint = number of zeros strictly before it
        group_of = np.cumsum(zero_mask) - zero_mask
        keep = ~zero_mask
        kv = vals_all[keep]
        grp = group_of[keep]
        keys = kv[0::2]
        vals = kv[1::2]
        grp_pairs = grp[0::2]
        return grp_pairs, keys, vals


def _tags_from_pairs(
    n_groups: int, grp: np.ndarray, keys: np.ndarray, vals: np.ndarray, strings: list[str]
) -> list[dict[str, str]]:
    out: list[dict[str, str]] = [dict() for _ in range(n_groups)]
    # value indices are stored off-by-one in the stream (0 = delimiter)
    for g, k, v in zip(grp.tolist(), keys.tolist(), vals.tolist()):
        out[g][strings[k]] = strings[v - 1]  # last write wins
    return out


_ALL_SECTIONS = ("text", "nodes", "ways", "rels")
_EMPTY_I64 = np.empty(0, dtype=np.int64)


def decode_page_np(blob: bytes, want: tuple[str, ...] = _ALL_SECTIONS) -> NumpyPage:
    """Decode one GPB1 blob with the vectorized path.

    ``want`` selects sections; unwanted ones are *seeked over* via the
    section directory — the payload-level analog of the reference's typed
    scan selection (/root/reference/fast_blob_decoder.go:74-129) and blob
    index replay (/root/reference/decode.go:341-383).
    """
    if blob[:4] != MAGIC:
        raise ValueError("bad magic")
    flags = blob[4]
    body = blob[5:]
    if flags & FLAG_ZLIB:
        body = zlib.decompress(body)
    buf = np.frombuffer(body, dtype=np.uint8)
    cur = _Cursor(buf)

    sec_lens = [cur.varint() for _ in range(5)]
    if cur.pos + sum(sec_lens) != buf.size:
        raise ValueError("section directory does not cover the body")
    want_entities = bool({"nodes", "ways", "rels"} & set(want))

    # string table: framing is sequential, payload slices are bulk
    strings: list[str] = [""]
    if want_entities:
        n_str = cur.varint()
        strings = []
        for _ in range(n_str):
            ln = cur.varint()
            strings.append(cur.take_bytes(ln).decode("utf-8"))
        if not strings or strings[0] != "":
            raise ValueError("string table index 0 must be empty")
    else:
        cur.pos += sec_lens[0]

    text = b""
    if "text" in want:
        text = cur.take_bytes(cur.varint())
    else:
        cur.pos += sec_lens[1]

    # nodes
    nn = 0
    node_ids = node_lats = node_lons = _EMPTY_I64
    node_tags: list[dict[str, str]] = []
    if "nodes" in want:
        nn = cur.varint()
        if flags & FLAG_SPARSE_NODES:
            # interleaved absolute records: one bulk varint pass, then
            # stride-deinterleave — no cumsum (values are not deltas)
            v = zigzag_decode_arr(cur.take_varints(3 * nn))
            node_ids = v[0::3]
            node_lats = v[1::3]
            node_lons = v[2::3]
        else:
            node_ids = np.cumsum(zigzag_decode_arr(cur.take_varints(nn)))
            node_lats = np.cumsum(zigzag_decode_arr(cur.take_varints(nn)))
            node_lons = np.cumsum(zigzag_decode_arr(cur.take_varints(nn)))
        node_tags = _tags_from_pairs(nn, *cur.take_keyval_stream(nn), strings)
    else:
        cur.pos += sec_lens[2]

    # ways
    way_ids = way_nrefs = way_refs = _EMPTY_I64
    way_tags: list[dict[str, str]] = []
    if "ways" in want:
        nw = cur.varint()
        way_ids = np.cumsum(zigzag_decode_arr(cur.take_varints(nw)))
        way_nrefs = cur.take_varints(nw)
        total_refs = int(way_nrefs.sum())
        ref_deltas = zigzag_decode_arr(cur.take_varints(total_refs))
        group_starts = np.concatenate(([0], np.cumsum(way_nrefs)[:-1])).astype(np.int64)
        way_refs = grouped_delta_cumsum(ref_deltas, group_starts, way_nrefs)
        way_tags = _tags_from_pairs(nw, *cur.take_keyval_stream(nw), strings)
    else:
        cur.pos += sec_lens[3]

    # relations
    rel_ids = rel_nmem = rel_member_ids = rel_member_types = _EMPTY_I64
    rel_member_roles: list[str] = []
    rel_tags: list[dict[str, str]] = []
    if "rels" in want:
        nr = cur.varint()
        rel_ids = np.cumsum(zigzag_decode_arr(cur.take_varints(nr)))
        rel_nmem = cur.take_varints(nr)
        total_mem = int(rel_nmem.sum())
        mem_deltas = zigzag_decode_arr(cur.take_varints(total_mem))
        mem_starts = np.concatenate(([0], np.cumsum(rel_nmem)[:-1])).astype(np.int64)
        rel_member_ids = grouped_delta_cumsum(mem_deltas, mem_starts, rel_nmem)
        rel_member_types = cur.take_varints(total_mem)
        role_idx = cur.take_varints(total_mem)
        rel_member_roles = [strings[i] for i in role_idx.tolist()]
        rel_tags = _tags_from_pairs(nr, *cur.take_keyval_stream(nr), strings)
    else:
        cur.pos += sec_lens[4]

    if cur.pos != buf.size:
        raise ValueError(f"trailing bytes: {buf.size - cur.pos}")

    return NumpyPage(
        text=text,
        node_ids=node_ids.astype(np.int64),
        node_lat_units=node_lats.astype(np.int64),
        node_lon_units=node_lons.astype(np.int64),
        node_tags=node_tags,
        way_ids=way_ids.astype(np.int64),
        way_nrefs=way_nrefs,
        way_refs=way_refs.astype(np.int64),
        way_tags=way_tags,
        rel_ids=rel_ids.astype(np.int64),
        rel_nmembers=rel_nmem,
        rel_member_ids=rel_member_ids.astype(np.int64),
        rel_member_types=rel_member_types,
        rel_member_roles=rel_member_roles,
        rel_tags=rel_tags,
    )
