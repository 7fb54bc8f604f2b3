"""Registry-wide plan-shape sweep (VERDICT r4 Next #2): every registered
query's physical plan is checked for unbounded all-pairs joins.

The rule: ``CartesianProduct`` is banned outright, everywhere. A
``BroadcastNestedLoopJoin`` is allowed ONLY when its broadcast (build)
side is provably tiny from the plan itself:

* a scalar aggregate — ``HashAggregate(keys=[], ...)`` produces exactly
  one row (the crossJoin-with-global-total pattern used by shares,
  thresholds, and normalization constants), or
* a driver-local literal table (``LocalTableScan`` / ``Scan
  ExistingRDD`` / a ``ReusedExchange`` of one) — data that was already
  materialized on the driver and is small by construction,

or when the query is in the explicit allowlist below, each entry
carrying the boundedness argument a reviewer should re-check. Anything
else fails — this mechanically catches the Clark–Evans class of defect
(an ``a != b`` all-pairs join over a full table) the moment it is
introduced, for every query, forever.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# name -> why its BroadcastNestedLoopJoin build side is bounded. Keep
# this SMALL and argued; a new entry needs a documented size contract.
ALLOWED_BNLJ = {
    # documented brute-force oracles / checked subsets (VERDICT-approved)
    "knn_brute_3": "the registered brute kNN oracle twin — all-pairs by design",
    "embedding_near_dup": "checked-subset brute twin; production path is "
    "cosine_pairs_lsh (functions/similarity.py)",
    # certified-exact adaptive kNN: the brute FALLBACK branch only ever
    # receives the residual uncertified tail (sparse/polar queries) —
    # tiny by construction; the certified mass rides ring equi-joins
    "knn_adaptive_3": "adaptive kNN brute tail over residual pending set",
    "geo_clark_evans": "NN via adaptive kNN (k=2) — same brute tail",
    # bounded probe/query batches broadcast against candidates for the
    # exact re-rank — the batch size is the operator's contract
    "ann_cosine_topk": "broadcast query-vector batch (operator contract)",
    "ann_ivf_topk": "broadcast query-vector batch + centroid roster",
    "ann_sq8_recall": "broadcast query-vector batch (recall eval)",
    "embeddings_knn_classify": "broadcast labeled-probe batch",
    "embeddings_matryoshka_recall": "broadcast query-vector batch",
    # rosters bounded by low-cardinality group keys
    "corpus_kmv_lang_jaccard": "lang-sketch roster pairs (|langs| rows)",
    "embeddings_class_separation": "class-centroid roster pairs (|classes|)",
    # classic broadcast-dim non-equi containment join
    "geo_reverse_geocode": "25-row nation-derived region dim broadcast "
    "(bbox containment)",
}


def _node_indent(line: str) -> int:
    """Column where the operator name starts in a Spark plan tree line
    (skips tree art ``:  +- `` and codegen ids ``*(4) ``)."""
    n = re.match(r"^[\s:+\-]*", line).end()
    m2 = re.match(r"\*\(\d+\)\s", line[n:])
    return n + (m2.end() if m2 else 0)


def _subtree(lines: list, i: int) -> list:
    base = _node_indent(lines[i])
    out = [lines[i]]
    for j in range(i + 1, len(lines)):
        if lines[j].strip() and _node_indent(lines[j]) <= base:
            break
        out.append(lines[j])
    return out


def _direct_children(sub: list) -> list:
    child_indent, out = None, []
    for j in range(1, len(sub)):
        if not sub[j].strip():
            continue
        ni = _node_indent(sub[j])
        if child_indent is None:
            child_indent = ni
        if ni == child_indent:
            out.append(j)
    return out


_SCALAR_AGG = re.compile(
    r"(HashAggregate|SortAggregate|ObjectHashAggregate)\((keys|key)=\[\]"
)
_DRIVER_LOCAL = re.compile(r"LocalTableScan|Scan ExistingRDD|ReusedExchange")


def bnlj_violations(plan: str) -> list:
    """Offending join lines: every CartesianProduct, plus every
    BroadcastNestedLoopJoin whose build side is neither a scalar
    aggregate nor a driver-local table."""
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "CartesianProduct" in ln:
            bad.append("CartesianProduct: " + ln.strip()[:100])
            continue
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        sub = _subtree(lines, i)
        kids = _direct_children(sub)
        if len(kids) >= 2:
            if "BuildLeft" in ln:
                bsub = sub[kids[0] : kids[1]]
            else:
                bsub = sub[kids[-1] :]
        else:  # leaf-ish rendering — inspect whatever is below
            bsub = sub[1:]
        txt = "\n".join(bsub)
        if _SCALAR_AGG.search(txt) or _DRIVER_LOCAL.search(txt):
            continue
        bad.append(ln.strip()[:110])
    return bad


ALL_QUERIES = sorted(entrymod.queries())


def test_allowlist_entries_are_registered():
    missing = set(ALLOWED_BNLJ) - set(ALL_QUERIES)
    assert not missing, f"allowlist names not in registry: {missing}"


_BANNED_SPARK_TYPES = {"decimal", "float"}


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_unbounded_loop_joins(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    # output-type law (same sweep, zero extra cost): the driver's value
    # hash distinguishes serialized types even when == says equal, so
    # query outputs stay in the long/double/string/bool/date family —
    # no DecimalType, no float32
    bad_types = [
        (f.name, f.dataType.typeName())
        for f in df.schema.fields
        if f.dataType.typeName() in _BANNED_SPARK_TYPES
        or f.dataType.typeName().startswith("decimal")
    ]
    assert not bad_types, f"{name} emits hash-unsafe column types: {bad_types}"
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = bnlj_violations(plan)
    if name in ALLOWED_BNLJ:
        # even allowlisted queries may never plan a CartesianProduct
        carts = [b for b in bad if b.startswith("CartesianProduct")]
        assert not carts, f"{name}: {carts}"
        return
    assert not bad, (
        f"{name} plans an unbounded loop join (build side is neither a "
        f"scalar aggregate nor driver-local): {bad}"
    )
