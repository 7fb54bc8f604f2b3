"""Property-based tests (hypothesis) for the engine's pure integer laws —
the python twins the DuckDB/Spark oracles rely on. Spark-free and fast."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# cell law: range, self-description, parent consistency
# ---------------------------------------------------------------------------

_lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
_lon = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
_res = st.integers(min_value=0, max_value=15)


def _cell_py(lat, lon, res):
    n = 1 << res
    x = min(max(math.floor((lon + 180.0) / 360.0 * float(n)), 0), n - 1)
    y = min(max(math.floor((90.0 - lat) / 180.0 * float(n)), 0), n - 1)
    return (1 << (2 * res)) + x * n + y


@settings(max_examples=300, deadline=None)
@given(_lat, _lon, _res)
def test_cell_id_is_self_describing_and_in_range(lat, lon, res):
    from gosmonaut_spark.functions.cells import cell_np

    c = int(cell_np(lat, lon, res))
    assert c == _cell_py(lat, lon, res)
    base, n = 1 << (2 * res), 1 << res
    assert base <= c < base + n * n  # flag bit + (x, y) in range
    # resolution is recoverable from the id alone
    assert (c.bit_length() - 1) // 2 == res


@settings(max_examples=300, deadline=None)
@given(_lat, _lon, st.integers(min_value=1, max_value=15))
def test_cell_parent_contains_child(lat, lon, res):
    """The res-(r-1) cell of a point IS the arithmetic parent of its
    res-r cell — the law cell_parent/compact/cover all build on."""
    child = _cell_py(lat, lon, res)
    parent_direct = _cell_py(lat, lon, res - 1)
    n = 1 << res
    x = (child >> res) - n
    y = child - ((child >> res) << res)
    parent_arith = (1 << (2 * (res - 1))) + (x >> 1) * (1 << (res - 1)) + (y >> 1)
    assert parent_direct == parent_arith


# ---------------------------------------------------------------------------
# edit-distance band law: candidate completeness
# ---------------------------------------------------------------------------


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcde", min_size=0, max_size=12),
    st.text(alphabet="abcde", min_size=0, max_size=12),
)
def test_levenshtein_bounded_below_by_length_gap(a, b):
    """lev(a,b) >= |len(a)-len(b)| — the inequality that makes the
    length-band candidate generation in editdist_pairs LOSSLESS."""
    assert _lev(a, b) >= abs(len(a) - len(b))
    assert _lev(a, b) <= max(len(a), len(b))


# ---------------------------------------------------------------------------
# CDC boundary locality: edits only move boundaries inside one window
# ---------------------------------------------------------------------------

_W, _B, _M, _D = 8, 31, 1_000_003, 8


def _cdc_boundaries(s):
    L = len(s)
    out = []
    for i in range(_W, L + 1):
        h = sum(ord(s[i - 1 - j]) * (_B ** j) for j in range(_W)) % _M
        if h % _D == 0:
            out.append(i)
    return set(out)


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="abcdefgh ", min_size=20, max_size=80),
    st.data(),
)
def test_cdc_boundary_locality(s, data):
    """Changing ONE character moves only boundaries whose window covers
    it — the LBFS/rsync locality lemma behind cdc_shared_chunks'
    shift-resilience (chunks outside the edit's window re-synchronize
    byte-for-byte)."""
    p = data.draw(st.integers(min_value=1, max_value=len(s)))  # 1-based
    repl = data.draw(st.sampled_from("xyz"))
    t = s[: p - 1] + repl + s[p:]
    b_s, b_t = _cdc_boundaries(s), _cdc_boundaries(t)
    affected = set(range(p, p + _W))  # windows ending in [p, p+W-1] see s[p]
    assert {i for i in b_s if i not in affected} == {
        i for i in b_t if i not in affected
    }
