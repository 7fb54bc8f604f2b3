"""Text / dedup / similarity operators: python oracles + DuckDB twin checks.

The DuckDB checks mirror the driver's CORRECTNESS gate mechanics: run the
Spark expression and the SQL twin on the same parquet, compare values.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gosmonaut_spark.functions import text as T
from gosmonaut_spark.functions import dedup as D
from gosmonaut_spark.functions import similarity as S

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    return con.execute(sql).fetchall()


def test_token_count_twin(spark, docs):
    got = {
        r.doc_id: r.tc
        for r in docs.select("doc_id", T.token_count("text").alias("tc")).collect()
    }
    exp = dict(_duck(f"SELECT doc_id, {T.token_count_sql('text')} FROM documents"))
    assert got == exp


def test_subword_count_twin(spark, docs):
    got = {
        r.doc_id: r.sc
        for r in docs.select("doc_id", T.subword_count("text").alias("sc")).collect()
    }
    exp = dict(_duck(f"SELECT doc_id, {T.subword_count_sql('text')} FROM documents"))
    assert got == exp


def test_lang_id_twin(spark, docs):
    got = {
        r.doc_id: r.lang
        for r in docs.select("doc_id", T.lang_id("text").alias("lang")).collect()
    }
    exp = dict(_duck(f"SELECT doc_id, {T.lang_id_sql('text')} FROM documents"))
    assert got == exp
    assert set(got.values()) <= set(T.STOPWORDS) | {"und"}


def test_quality_features_twin(spark, docs):
    feats = T.quality_features("text")
    cols = sorted(feats)
    got = {
        r.doc_id: tuple(getattr(r, c) for c in cols)
        for r in docs.select("doc_id", *[feats[c].alias(c) for c in cols]).collect()
    }
    sqls = T.quality_features_sql("text")
    exp = {
        row[0]: tuple(row[1:])
        for row in _duck(
            "SELECT doc_id, " + ", ".join(sqls[c] for c in cols) + " FROM documents"
        )
    }
    assert got == exp


def test_fingerprint_and_shingles_twin(spark, docs):
    got = {
        r.doc_id: (r.fp, sorted(r.sh))
        for r in docs.select(
            "doc_id",
            T.content_fingerprint("text").alias("fp"),
            T.shingles("text", 3).alias("sh"),
        ).collect()
    }
    exp = {
        row[0]: (row[1], sorted(row[2]))
        for row in _duck(
            f"SELECT doc_id, {T.content_fingerprint_sql('text')}, "
            f"{T.shingles_sql('text', 3)} FROM documents"
        )
    }
    assert got == exp


def test_exact_dedup(spark, docs):
    # inject exact duplicates deterministically
    dup = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 100000)
    all_docs = docs.unionByName(dup)
    groups = D.exact_dup_groups(all_docs).collect()
    assert len(groups) == 20
    for g in groups:
        assert g.n_docs == 2 and g.canonical_id == g.doc_ids[0]
    kept = D.dedup_exact(all_docs)
    assert kept.count() == docs.count()
    # every kept id is the canonical (min) of its group
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0


def test_jaccard_pairs_oracle(spark, docs):
    """Engine jaccard == python-set jaccard on a small sample."""
    sample = docs.filter(F.col("doc_id") < 120)
    got = {
        (r.a, r.b): r.jaccard for r in D.jaccard_pairs(sample, threshold=0.2).collect()
    }
    rows = sample.select("doc_id", "text").collect()

    def sh(text, n=3):
        toks = __import__("re").sub(r"[^a-z0-9]+", " ", text.lower()).split()
        return set(" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1)))

    exp = {}
    for i, ri in enumerate(rows):
        for rj in rows[i + 1 :]:
            a, b = sorted((ri.doc_id, rj.doc_id))
            sa, sb = sh(ri.text), sh(rj.text)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.2:
                exp[(a, b)] = j
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-12


def test_jaccard_prefix_filter_is_lossless(spark, docs):
    """PPJoin prefix filtering must return the EXACT jaccard_pairs result
    at every threshold — including t high (tiny prefixes), t low (whole
    doc is prefix) and docs sharing only hot (high-df) shingles."""
    import gosmonaut_spark.functions.dedup as D

    sample = docs.filter(F.col("doc_id") < 120)
    for t in (0.2, 0.5, 0.9):
        base = {
            (r.a, r.b): r.jaccard
            for r in D.jaccard_pairs(sample, threshold=t).collect()
        }
        pre = {
            (r.a, r.b): r.jaccard
            for r in D.jaccard_prefix_pairs(sample, threshold=t).collect()
        }
        assert pre == base, f"threshold {t}: prefix filter changed the result"


def test_jaccard_df_cap_skew_guard(spark):
    """A boilerplate shingle shared by every doc (the quadratic-join skew
    case) must be droppable with max_doc_freq: results then equal the
    python-set jaccard over the df-filtered shingle space, and near-dup
    pairs connected only through rare shingles are still found."""
    import re as _re

    boiler = "all rights reserved copyright notice"
    rows = []
    for i in range(60):
        rows.append((i, f"{boiler} unique text body number {i} alpha beta gamma"))
    # one true near-dup pair via rare shared text
    rows.append((100, f"{boiler} the quick brown fox jumps over the lazy dog"))
    rows.append((101, f"{boiler} the quick brown fox jumps over the lazy cat"))
    docs60 = spark.createDataFrame(rows, "doc_id long, text string")

    cap = 10
    got = {
        (r.a, r.b): r.jaccard
        for r in D.jaccard_pairs(docs60, threshold=0.3, max_doc_freq=cap).collect()
    }

    def sh(text, n=3):
        toks = _re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
        return set(" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1)))

    all_sh = [(i, sh(t)) for i, t in rows]
    dfreq = {}
    for _i, s in all_sh:
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    kept = [(i, {g for g in s if dfreq[g] <= cap}) for i, s in all_sh]
    exp = {}
    for x in range(len(kept)):
        for y in range(x + 1, len(kept)):
            (ia, sa), (ib, sb) = kept[x], kept[y]
            if not (sa | sb):
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.3:
                exp[tuple(sorted((ia, ib)))] = j
    assert set(got) == set(exp)
    assert (100, 101) in got  # rare-shingle near-dup survives the cap
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-12


def test_minhash_lsh_recall(spark, docs):
    """LSH candidates must contain every true pair above the threshold
    (verified against the exhaustive jaccard join) on this corpus."""
    sample = docs.filter(F.col("doc_id") < 200)
    true_pairs = {
        (r.a, r.b): r.jaccard for r in D.jaccard_pairs(sample, threshold=0.8).collect()
    }
    lsh_pairs = {
        (r.a, r.b): r.jaccard
        for r in D.minhash_lsh_pairs(sample, threshold=0.8, n_hashes=16, n_bands=8).collect()
    }
    assert set(lsh_pairs) == set(true_pairs)


def test_minhash_signatures_match_column_path(spark, docs):
    """Explode+min-agg signature plan == interpreted Column fold, both
    hash families (the reference's two-decoder equivalence discipline,
    /root/reference/gosmonaut_test.go:27-41)."""
    sample = docs.filter(F.col("doc_id") < 120)
    for fn in ("md5", "xxhash64"):
        fast = {
            r.doc_id: tuple(r[f"mh_{i}"] for i in range(8))
            for r in D.minhash_signatures(sample, 8, hash_fn=fn).collect()
        }
        slow = {
            r.doc_id: tuple(r[f"mh_{i}"] for i in range(8))
            for r in sample.select(
                "doc_id", *D.minhash_signature("text", 8, hash_fn=fn)
            )
            .filter(F.size(T.shingles("text")) > 0)
            .collect()
        }
        assert fast == slow


def test_simhash_pairs(spark, docs):
    """Block-trick candidates find all pairs within the hamming ball
    (cross-checked against exhaustive simhash comparison)."""
    sample = docs.filter(F.col("doc_id") < 150)
    sig = sample.select("doc_id", D.simhash64("text").alias("h")).collect()
    exp = set()
    for i, a in enumerate(sig):
        for b in sig[i + 1 :]:
            ham = bin(a.h ^ b.h).count("1")
            if ham <= 3:
                exp.add(tuple(sorted((a.doc_id, b.doc_id))))
    got = {
        (r.a, r.b) for r in D.simhash_pairs(sample, max_hamming=3).collect()
    }
    assert got == exp


def test_cosine_twin_and_brute_topk(spark, embs):
    """cosine matches DuckDB list_reduce twin bit-for-bit; brute topk
    matches numpy."""
    q = embs.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.target_id): r.cos_sim
        for r in S.cosine_topk_brute(
            q.select(F.col("vec_id").alias("query_id"), "embedding"),
            embs.select(F.col("vec_id").alias("target_id"), "embedding"),
            k=5,
        ).collect()
    }
    rows = embs.select("vec_id", "embedding").collect()
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(5):
        qi = np.where(ids == qid)[0][0]
        sims = Mn @ Mn[qi]
        order = np.lexsort((ids, -sims))[:5]
        exp_ids = set(ids[order].tolist())
        got_ids = {t for (qq, t) in got if qq == qid}
        assert got_ids == exp_ids
    # duckdb twin check on a few pairs
    sql = S.cosine_sql("a.embedding", "b.embedding")
    exp_pairs = dict(
        (tuple(row[:2]), row[2])
        for row in _duck(
            f"SELECT a.vec_id, b.vec_id, {sql} FROM embeddings a, embeddings b "
            f"WHERE a.vec_id < 3 AND b.vec_id < 3"
        )
    )
    sp = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sp.select(F.col("vec_id").alias("qa"), F.col("embedding").alias("ea")).filter("qa < 3")
    b = sp.select(F.col("vec_id").alias("qb"), F.col("embedding").alias("eb")).filter("qb < 3")
    got_pairs = {
        (r.qa, r.qb): r.c
        for r in a.crossJoin(b).select("qa", "qb", S.cosine(F.col("ea"), F.col("eb")).alias("c")).collect()
    }
    assert got_pairs == exp_pairs


def test_lsh_topk_reasonable_recall(spark, embs):
    q = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t = embs.select(F.col("vec_id").alias("target_id"), "embedding")
    exact = S.cosine_topk_brute(q, t, k=5).collect()
    # random embeddings are the adversarial case for hyperplane LSH (no
    # cluster structure): 4 bits x 16 tables measured at ~0.96 recall here
    approx = S.cosine_topk_lsh(q, t, k=5, n_bits=4, n_tables=16, dim=64).collect()
    exact_set = {(r.query_id, r.target_id) for r in exact}
    approx_set = {(r.query_id, r.target_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.85, f"LSH recall too low: {recall}"


def test_ivf_topk_exact_at_full_probe_and_recall_monotone(spark, embs):
    """IVF contract: the inverted lists PARTITION the targets, so probing
    every list equals brute force exactly (ids AND cos_sim doubles); fewer
    probes trade recall monotonically."""
    q = embs.filter(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t = embs.select(F.col("vec_id").alias("target_id"), "embedding")
    brute = {
        (r.query_id, r.target_id): r.cos_sim
        for r in S.cosine_topk_brute(q, t, k=5).collect()
    }
    # stride 25 over 500 vecs -> 20 centroids; nprobe=20 probes every list
    full = {
        (r.query_id, r.target_id): r.cos_sim
        for r in S.cosine_topk_ivf(
            q, t, k=5, centroid_stride=25, nprobe=20, dim=64
        ).collect()
    }
    assert full == brute  # exact: same pairs, bit-identical doubles

    def recall(nprobe, cap=None):
        got = {
            (r.query_id, r.target_id)
            for r in S.cosine_topk_ivf(
                q, t, k=5, centroid_stride=25, nprobe=nprobe, dim=64,
                max_list_targets=cap,
            ).collect()
        }
        return len(got & set(brute)) / len(brute)

    r2, r8 = recall(2), recall(8)
    assert r8 >= r2, f"recall not monotone in nprobe: {r2} -> {r8}"
    assert r8 >= 0.5, f"IVF recall@8/20 lists too low: {r8}"
    # skew-cap semantics: a loose cap changes nothing; a tight cap only
    # ever REMOVES result pairs (lists above the cap drop out), never adds
    assert recall(8, cap=10_000) == r8
    assert recall(8, cap=20) <= r8


def test_lsh_multiprobe_and_bucket_cap(spark):
    """Scale-parameterization evidence at sf0.1 (2000 random vectors — the
    adversarial no-cluster case): single-bit multiprobe must lift recall
    substantially over probe-free LSH at the same bits/tables (measured
    0.34 -> 0.74 here), and the bucket-size cap must only ever REMOVE
    candidate pairs (skew guard semantics), never invent them."""
    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    q = e.filter(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t = e.select(F.col("vec_id").alias("target_id"), "embedding")
    exact = {(r.query_id, r.target_id) for r in S.cosine_topk_brute(q, t, k=5).collect()}

    def run(mp, cap=None):
        return {
            (r.query_id, r.target_id)
            for r in S.cosine_topk_lsh(
                q, t, k=5, n_bits=8, n_tables=8, dim=64,
                multiprobe=mp, max_bucket_targets=cap,
            ).collect()
        }

    no_probe = run(0)
    probed = run(1)
    r0 = len(exact & no_probe) / len(exact)
    r1 = len(exact & probed) / len(exact)
    assert r1 >= 0.65, f"multiprobe recall too low: {r1}"
    assert r1 >= r0 + 0.2, f"multiprobe did not lift recall: {r0} -> {r1}"

    # cap semantics: a loose cap (nothing exceeds it) must change nothing;
    # a tight cap shrinks the CANDIDATE set, so true-pair recall can only
    # drop — a true top-k pair surviving the cap always stays in top-k
    # (at most k-1 pairs in the whole universe outrank it), so recall is
    # monotone in the candidate set even though the k-th slots differ.
    capped_loose = run(1, cap=2000)
    assert capped_loose == probed
    capped_tight = run(1, cap=5)
    r_tight = len(exact & capped_tight) / len(exact)
    assert r_tight <= r1


def test_multimodal_plumbing(spark):
    from gosmonaut_spark.functions.multimodal import (
        attach_media_meta,
        extract_media_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 48)
    meta = attach_media_meta(media)
    assert meta.filter(F.col("n_bytes") <= 0).count() == 0
    feats = extract_media_features(media, fake=True).collect()
    assert len(feats) == 48
    assert all(len(r.feature) == 8 for r in feats)
    # deterministic: same payload -> same feature
    again = extract_media_features(media, fake=True).collect()
    assert {r.media_id: r.feature for r in feats} == {r.media_id: r.feature for r in again}
    # opaque (non-wire-format) payloads fail loud on the real codec path
    opaque = synthetic_media(spark, 6, real=False)
    with pytest.raises(Exception, match="(?i)png|riff|yuv4mpeg|not a"):
        extract_media_features(opaque, fake=False).collect()


def test_minhash_xxhash_variant_matches_md5(spark, docs):
    """The throughput hash (xxhash64) must find the same verified pairs as
    the oracle hash (md5) — banding changes candidates, but the exact
    jaccard verification makes the output hash-agnostic for recall=1 sets."""
    sample = docs.filter(F.col("doc_id") < 150)
    dup = sample.select("doc_id", "text").withColumn("doc_id", F.col("doc_id") + 5000)
    both = sample.select("doc_id", "text").unionByName(dup)
    a = {(r.a, r.b) for r in D.minhash_lsh_pairs(both, 0.8, 16, 8, hash_fn="md5").collect()}
    b = {(r.a, r.b) for r in D.minhash_lsh_pairs(both, 0.8, 16, 8, hash_fn="xxhash64").collect()}
    assert a == b and len(a) >= 150


def test_codecs_png_roundtrip():
    """Real PNG: encode (both filter forms) -> full decode == pixels;
    header parse; CRC corruption rejected."""
    import numpy as np
    import pytest

    from gosmonaut_spark.functions.codecs import (
        png_decode,
        png_encode,
        png_parse_header,
    )

    rng = np.random.default_rng(7)
    for shape in [(5, 9), (6, 4, 3), (3, 7, 4)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8).reshape(shape)
        for ft in (0, 2):
            blob = png_encode(arr, filter_type=ft)
            hdr = png_parse_header(blob)
            assert (hdr["height"], hdr["width"]) == shape[:2]
            out = png_decode(blob)
            assert out.shape == arr.shape and (out == arr).all()
    # two filter forms: same pixels, different bytes
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    assert png_encode(arr, 0) != png_encode(arr, 2)
    # CRC corruption must be detected
    blob = bytearray(png_encode(arr, 0))
    blob[40] ^= 0xFF
    with pytest.raises(ValueError):
        png_decode(bytes(blob))


def test_codecs_png_unfilter_sub_avg_paeth():
    """Decoder handles filters 1/3/4 (Sub/Average/Paeth): re-filter a known
    image by hand and check the decode inverts it."""
    import struct
    import zlib as _z
    from binascii import crc32 as _crc

    import numpy as np

    from gosmonaut_spark.functions.codecs import PNG_MAGIC, png_decode

    rng = np.random.default_rng(11)
    h, w, ch = 5, 6, 3
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    rows = arr.reshape(h, w * ch).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        ft = [1, 3, 4, 1, 4][r]
        raw.append(ft)
        cur = rows[r]
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            base = a if ft == 1 else ((a + b) // 2 if ft == 3 else paeth(a, b, c))
            raw.append((int(cur[x]) - base) % 256)
        prev = cur

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", _crc(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    out = png_decode(blob)
    assert (out == arr).all()


def test_codecs_wav_roundtrip():
    import numpy as np

    from gosmonaut_spark.functions.codecs import wav_encode, wav_parse

    s = (np.sin(np.arange(400) / 7.0) * 12000).astype(np.int16)
    blob = wav_encode(s, 16000)
    w = wav_parse(blob)
    assert w["sample_rate"] == 16000 and w["channels"] == 1
    assert w["n_frames"] == 400 and w["duration_ms"] == 25
    assert (w["samples"] == s).all()
    stereo = np.stack([s, -s], axis=1).astype(np.int16)
    w2 = wav_parse(wav_encode(stereo, 8000))
    assert w2["channels"] == 2 and w2["n_frames"] == 400


def test_codecs_y4m_roundtrip():
    import numpy as np

    from gosmonaut_spark.functions.codecs import y4m_encode, y4m_parse

    # mono
    frames = (np.arange(3 * 4 * 6, dtype=np.int64) % 253).astype(np.uint8)
    frames = frames.reshape(3, 4, 6)
    v = y4m_parse(y4m_encode(frames, fps_num=30, fps_den=1))
    assert (v["width"], v["height"], v["n_frames"]) == (6, 4, 3)
    assert v["colorspace"] == "mono" and v["fps"] == 30.0
    assert v["duration_ms"] == 100
    assert (v["y_planes"] == frames).all()
    # C444 planar: luma plane round-trips, chroma validated by size
    yuv = np.stack([frames, frames // 2, frames // 3], axis=-1)
    v4 = y4m_parse(y4m_encode(yuv, fps_num=24))
    assert v4["colorspace"] == "444" and (v4["y_planes"] == frames).all()
    # foreign C420 file (odd dims exercise ceil-division chroma sizing)
    w, h = 5, 3
    chroma = ((w + 1) // 2) * ((h + 1) // 2)
    blob = (
        b"YUV4MPEG2 W5 H3 F25:1 Ip A1:1 C420jpeg\n"
        + (b"FRAME\n" + bytes(range(w * h)) + b"\x80" * (2 * chroma)) * 2
    )
    v420 = y4m_parse(blob)
    assert v420["n_frames"] == 2 and v420["y_planes"].shape == (2, 3, 5)
    # truncation and bad magic fail loud
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        y4m_parse(blob[:-1])
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        y4m_parse(b"RIFF" + blob)


def test_multimodal_real_decode(spark):
    """The non-stub path: Spark-side features over real PNG/WAV/Y4M
    payloads equal the driver-side codec computation exactly — no stubbed
    kind remains."""
    import pytest

    from gosmonaut_spark.functions.multimodal import (
        audio_feature,
        extract_media_features,
        image_feature,
        synthetic_media,
        video_feature,
    )

    media = synthetic_media(spark, 36, real=True)
    got = {
        r.media_id: (r.kind, r.feature)
        for r in extract_media_features(media, fake=False).collect()
    }
    rows = media.select("media_id", "kind", "payload").collect()
    assert len(got) == len(rows) > 0
    import numpy as np

    exp_fn = {"image": image_feature, "audio": audio_feature, "video": video_feature}
    for r in rows:
        kind, feat = got[r.media_id]
        exp = exp_fn[kind](bytes(r.payload))
        assert np.allclose(feat, exp, rtol=1e-6), (r.media_id, kind)
    # images report their true decoded dimensions
    img = [f for k, f in got.values() if k == "image"]
    assert all(f[0] >= 8 and f[1] >= 6 and f[2] == 3.0 for f in img)
    # videos report true container-derived stats incl. a nonzero motion proxy
    vid = [f for k, f in got.values() if k == "video"]
    assert len(vid) == 12
    assert all(f[2] >= 2 and f[3] in (24.0, 25.0) and f[7] > 0 for f in vid)

    unknown = media.filter(F.col("kind") == "image").withColumn(
        "kind", F.lit("hologram")
    )
    with pytest.raises(Exception, match="no pure-Python codec"):
        extract_media_features(unknown, fake=False).collect()


def test_lsh_bucket_arrow_matches_fold(spark, embs):
    """The vectorized Arrow bucket pass (hot path) must agree BIT-FOR-BIT
    with the Catalyst fold reference (and therefore with the DuckDB
    list_reduce oracle): the explicit per-dimension accumulation preserves
    the exact IEEE rounding sequence, so no vector ever lands in a
    different bucket between engines."""
    e = embs.filter(F.col("vec_id") < 60).select("vec_id", "embedding")
    n_bits, n_tables, dim = 6, 3, 64
    arrow = {
        r["vec_id"]: r["__bkts"]
        for r in S.lsh_bucket_table(e, "embedding", n_bits, n_tables, dim).collect()
    }
    for tbl in range(n_tables):
        planes = S._hyperplanes(dim, n_bits, tbl)
        fold = {
            r["vec_id"]: r["b"]
            for r in e.select(
                "vec_id", S.lsh_bucket(F.col("embedding"), planes).alias("b")
            ).collect()
        }
        assert all(arrow[k][tbl] == fold[k] for k in fold), f"table {tbl} diverged"


def test_pairs_lsh_default_bucket_cardinality(spark):
    """Scale-sizing pin: at the r3 defaults (n_bits=16 -> 65,536 buckets
    per table) the per-bucket population stays tiny even on the clustered
    sf0.1 embeddings (measured max 3 of 2000 vectors; 6 with exact dups
    injected) — the per-bucket self-join can never go quadratic."""
    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("v")
    )
    dup = e.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    b = S._bucketed(e.unionByName(dup), "v", n_bits=16, n_tables=4, dim=64)
    stats = (
        b.groupBy("tbl", "bkt")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .collect()[0]
    )
    assert stats["mx"] <= 16, f"degenerate bucket at default sizing: {stats['mx']}"
    assert stats["avg"] <= 2.5


def test_cosine_pairs_lsh_finds_dups_and_cap(spark, embs):
    """LSH near-dup pairs: injected exact duplicates must surface with
    cos ~= 1; a loose bucket cap changes nothing, a tight one only ever
    removes pairs (per-bucket self-join skew guard)."""
    base = embs.filter(F.col("vec_id") < 150).select("vec_id", "embedding")
    dup = base.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    both = base.unionByName(dup)

    def run(cap=None):
        return {
            (r.a, r.b)
            for r in S.cosine_pairs_lsh(
                both, threshold=0.999, n_bits=8, n_tables=4, dim=64, max_bucket=cap
            ).collect()
        }

    got = run()
    expected_dups = {(i, i + 1_000_000) for i in range(150)}
    # identical vectors always share every bucket -> recall 1.0 on true dups
    assert expected_dups <= got
    assert run(cap=10_000) == got
    assert run(cap=2) <= got


# ---------------------------------------------------------------------------
# decontamination + PII scrub
# ---------------------------------------------------------------------------


def test_ngram_contamination_counts(spark):
    from gosmonaut_spark.functions.text import ngram_contamination

    ev = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),  # 3 shared 5-gram? n=3 here
            (2, "a totally different sentence entirely"),
            (3, "quick brown fox story"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(docs, ev, n=3, min_overlap=1).collect()
    }
    # eval 3-grams: {the quick brown, quick brown fox, brown fox jumps}
    assert out == {1: 3, 3: 1}


def test_pii_scrub_redacts_and_counts(spark):
    from gosmonaut_spark.functions.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "reach me at jo.doe+x@site.org or 555-0100 today"),
            (2, "no pii here"),
            (3, "a@b.io c@d.net 123-4567 987 6543"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert rows[1].n_emails == 1 and rows[1].n_phones == 1
    assert "<EMAIL>" in rows[1].redacted and "<PHONE>" in rows[1].redacted
    assert "jo.doe" not in rows[1].redacted and "555-0100" not in rows[1].redacted
    assert rows[2].n_emails == 0 and rows[2].n_phones == 0
    assert rows[2].redacted == "no pii here"
    assert rows[3].n_emails == 2 and rows[3].n_phones == 2


def test_pii_scrub_case_and_boundaries(spark):
    """ADVICE r3: mixed-case addresses must match; a 3+4 digit pair inside
    a longer digit run (IDs, '123-45678') must NOT be flagged."""
    from gosmonaut_spark.functions.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail Bob.Smith@Site.ORG please"),
            (2, "order 123-45678 shipped"),  # 3+4 prefix of a longer run
            (3, "serial 9123-4567 intact"),  # 3+4 suffix of a longer run
            (4, "call 555-0100."),  # trailing punctuation is a boundary
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert rows[1].n_emails == 1 and "Bob.Smith" not in rows[1].redacted
    assert rows[2].n_phones == 0 and rows[2].redacted == "order 123-45678 shipped"
    assert rows[3].n_phones == 0 and rows[3].redacted == "serial 9123-4567 intact"
    assert rows[4].n_phones == 1 and rows[4].redacted == "call <PHONE>."


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (VERDICT r3 #5)
# ---------------------------------------------------------------------------


def _contam_docs(spark):
    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(60)]
    mk = lambda n: " ".join(rng.choice(words) for _ in range(n))
    ev = spark.createDataFrame(
        [(mk(30),), (mk(25),)], "text string"
    )
    docs = spark.createDataFrame(
        [(i, mk(40)) for i in range(40)], "doc_id long, text string"
    )
    return docs, ev


def test_ngram_contamination_bloom_verified_equals_exact(spark):
    """verify=True re-checks Bloom candidates against the real eval set,
    so the output is EXACTLY the exact broadcast path's."""
    from gosmonaut_spark.functions.text import (
        ngram_contamination,
        ngram_contamination_bloom,
    )

    docs, ev = _contam_docs(spark)
    exact = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(docs, ev, n=2).collect()
    }
    got = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination_bloom(docs, ev, n=2, verify=True).collect()
    }
    assert exact  # fixture must actually produce overlap
    assert got == exact


def test_ngram_contamination_bloom_unverified_no_false_negatives(spark):
    """verify=False may over-flag (Bloom false positives) but NEVER
    under-flags: every exact overlap is found with at least its exact
    count — the KEEP side of a cleaning pipeline is safe."""
    from gosmonaut_spark.functions.text import (
        ngram_contamination,
        ngram_contamination_bloom,
    )

    docs, ev = _contam_docs(spark)
    exact = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(docs, ev, n=2).collect()
    }
    got = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination_bloom(
            docs, ev, n=2, verify=False, fpp=1e-4
        ).collect()
    }
    assert set(got) >= set(exact)
    for d, n in exact.items():
        assert got[d] >= n
    # at fpp=1e-4 over a few thousand probed shingles, expect ~zero extras
    extra = sum(got.values()) - sum(exact.values())
    assert extra <= 2


def test_bloom_params_sane():
    from gosmonaut_spark.functions.text import _bloom_params

    m, k = _bloom_params(10_000, 1e-4)
    assert m % 64 == 0 and m >= 10_000 * 19 * 0.9
    assert 10 <= k <= 17
    m1, k1 = _bloom_params(0, 1e-4)  # degenerate eval set never crashes
    assert m1 >= 64 and k1 >= 1


# ---------------------------------------------------------------------------
# url canonicalization (functions/web.py)
# ---------------------------------------------------------------------------


def test_url_canonicalize_rules(spark):
    from gosmonaut_spark.functions.web import url_canonicalize, url_canonicalize_sql

    cases = [
        # (raw, canonical)
        ("https://Ex.COM/A/b#frag", "https://ex.com/A/b"),          # host lower, path case kept, fragment gone
        ("HTTP://ex.com:80/x", "http://ex.com/x"),                  # scheme lower + default port
        ("https://ex.com:443/x?b=2&a=1", "https://ex.com/x?a=1&b=2"),  # port + param sort
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),         # non-default port kept
        ("https://ex.com/x?utm_source=f&utm_campaign=c", "https://ex.com/x"),  # tracking-only query dropped
        ("https://ex.com/x?a=1&gclid=z&fbclid=y", "https://ex.com/x?a=1"),
        ("https://ex.com/x?refresh=1&ref=tw", "https://ex.com/x?refresh=1"),  # 'ref' exact, not prefix
        ("https://ex.com/", "https://ex.com/"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r[0] for r in df.select(url_canonicalize("url")).collect()]
    assert got == [c for _, c in cases]

    # DuckDB twin emits byte-identical canonicals on the same inputs
    con = duckdb.connect()
    vals = ", ".join(f"('{r}')" for r, _ in cases)
    dgot = [
        r[0]
        for r in con.execute(
            f"SELECT {url_canonicalize_sql('url')} FROM (VALUES {vals}) t(url)"
        ).fetchall()
    ]
    assert dgot == got


def test_canonical_url_dedup_manifest(spark):
    from gosmonaut_spark.functions.web import canonical_url_dedup
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("https://ex.com/p?utm_source=a", t0),
        ("https://EX.com/p", t0 + dt.timedelta(seconds=5)),
        ("https://ex.com/p#x", t0 + dt.timedelta(seconds=9)),
        ("https://ex.com/q", t0 + dt.timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    out = {
        r["canonical_url"]: r
        for r in canonical_url_dedup(df).collect()
    }
    assert out["https://ex.com/p"]["n_dup"] == 3
    assert out["https://ex.com/p"]["kept_url"] == "https://ex.com/p?utm_source=a"
    assert out["https://ex.com/p"]["first_ts"] == t0
    assert out["https://ex.com/q"]["n_dup"] == 1


def test_paragraph_dedup_first_occurrence_manifest(spark):
    """Hand-built corpus: shared boilerplate paragraphs survive exactly
    once, at their global (min doc_id, min para_idx) occurrence."""
    import hashlib

    from gosmonaut_spark.functions.dedup import paragraph_dedup

    boiler = "subscribe now"
    docs = [
        (1, f"{boiler}\n\nalpha beta\n\ngamma"),
        (2, f"alpha beta\n\n{boiler}\n\ndelta"),
        (3, f"{boiler}\n\n{boiler}\n\nepsilon"),  # dup inside one doc too
        (4, ""),  # empty doc -> zero paragraphs (min_chars)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = paragraph_dedup(df).collect()

    got = {(r.doc_id, r.para_idx): (r.fp, r.keep) for r in out}
    # every non-empty paragraph has a row; empty doc contributes none
    assert len(got) == 3 + 3 + 3
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # fingerprints are plain md5 of the paragraph text
    assert got[(1, 0)][0] == md5(boiler)
    assert got[(2, 0)][0] == md5("alpha beta")
    # keep = global first occurrence per fingerprint
    keeps = {k for k, (_, keep) in got.items() if keep}
    assert keeps == {(1, 0), (1, 1), (1, 2), (2, 2), (3, 2)}


def test_kmeans_train_matches_numpy_lloyd(spark):
    """Fixed-iteration spherical k-means == the same law in numpy."""
    import numpy as np

    from gosmonaut_spark.functions.similarity import kmeans_train

    rng = np.random.default_rng(21)
    n, dim, stride, iters = 80, 8, 16, 3
    X = rng.normal(size=(n, dim)).astype(np.float32)
    Xd = X.astype(np.float64)

    cids = [i for i in range(n) if i % stride == 0]
    C = {c: Xd[c].copy() for c in cids}
    counts = {}
    for _ in range(iters):
        assign = {}
        for p in range(n):
            # max cosine (point norm constant), tie -> min centroid id
            best = max(
                ((Xd[p] @ C[c]) / np.sqrt(C[c] @ C[c]), -c) for c in cids
            )
            assign[p] = -best[1]
        counts = {c: 0 for c in cids}
        sums = {c: np.zeros(dim) for c in cids}
        for p, c in assign.items():
            counts[c] += 1
            sums[c] += Xd[p]
        for c in cids:
            if counts[c]:
                C[c] = sums[c] / counts[c]

    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_train(df, iters=iters, stride=stride, dim=dim).collect()
    assert {r.centroid_id for r in out} == set(cids)
    assert sum(r.n_assigned for r in out) == n
    for r in out:
        assert r.n_assigned == counts[r.centroid_id]
        got = np.array(r.centroid)
        assert np.max(np.abs(got - C[r.centroid_id])) < 1e-9, r.centroid_id


def test_hll_distinct_exact_law_and_accuracy(spark):
    """The estimate is a bit-exact pure function (python oracle, exact ==)
    and lands within the HLL error envelope of the true cardinality."""
    import hashlib

    from gosmonaut_spark.functions.sketch import hll_distinct

    p, m = 6, 64
    alpha = 0.7213 / (1.0 + 1.079 / m)
    C = alpha * m * m * float(1 << 33)

    def py_hll(keys):
        regs = {}
        for k in keys:
            h = hashlib.md5(("hll" + str(k)).encode()).hexdigest()
            b = int(h[:4], 16) % m
            v = int(h[4:12], 16)
            rank = 33 - len(bin(v)[2:]) if v else 32
            regs[b] = max(regs.get(b, 0), rank)
        s = sum(1 << (33 - r) for r in regs.values())
        s += (m - len(regs)) * (1 << 33)
        return C / s

    rows = [("g1", f"k{i % 700}") for i in range(5000)] + [
        ("g2", f"x{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, key string")
    got = {r.g: r.hll_estimate for r in hll_distinct(df, "key", "g").collect()}

    want = {
        "g1": py_hll({k for g, k in rows if g == "g1"}),
        "g2": py_hll({k for g, k in rows if g == "g2"}),
    }
    assert got == want  # EXACT double equality — the whole point
    assert abs(got["g1"] - 700) / 700 < 0.35
    # g2 (n=50 << 2.5*m) is the documented small-range regime: the raw
    # estimator overestimates there (standard HLL would switch to linear
    # counting, whose ln() has no cross-engine ulp guarantee) — assert
    # the bias stays within its known envelope rather than the mid-range
    # error bound.
    assert 50 <= got["g2"] < 2.5 * 64
    # pure function: invariant to partitioning
    re = {r.g: r.hll_estimate
          for r in hll_distinct(df.repartition(17), "key", "g").collect()}
    assert re == got


def test_host_blocklist_label_boundary(spark):
    """Suffix law: bans catch subdomains but never lookalike hosts."""
    from gosmonaut_spark.functions.web import (
        host_blocklist_filter,
        host_suffixes,
        url_host,
    )

    rows = [
        (1, "https://tracker.example/a"),          # blocked apex
        (2, "https://x.y.tracker.example/b?q=1"),  # blocked deep subdomain
        (3, "https://nottracker.example/c"),        # lookalike -> kept
        (4, "HTTPS://TRACKER.EXAMPLE:443/d"),       # case + port -> blocked
        (5, "https://spam.net/e"),                  # second apex
        (6, "https://example/f"),                   # single-label host
        (7, "https://good.example/g#frag"),         # kept
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    kept = {r.id for r in
            host_blocklist_filter(df, ["tracker.example", "spam.net"]).collect()}
    assert kept == {3, 6, 7}
    audit = {r.id for r in
             host_blocklist_filter(df, ["tracker.example", "spam.net"],
                                   keep_blocked=True).collect()}
    assert audit == {1, 2, 4, 5}
    # suffix expansion itself
    sufs = df.where(F.col("id") == 2).select(
        host_suffixes(url_host("url")).alias("s")
    ).collect()[0].s
    assert sufs == ["x.y.tracker.example", "y.tracker.example",
                    "tracker.example", "example"]


def test_power_iteration_top_pc_matches_numpy(spark):
    """3 power iterations on the centered Gram == the same law in numpy;
    with a planted dominant direction the result aligns with it."""
    import numpy as np

    from gosmonaut_spark.functions.similarity import power_iteration_top_pc

    rng = np.random.default_rng(29)
    n, dim, iters = 120, 8, 3
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    X = (rng.normal(size=(n, 1)) * 6.0) @ direction[None, :] + rng.normal(
        size=(n, dim)
    ) * 0.3
    X = X.astype(np.float32)

    Xd = X.astype(np.float64)
    xc = Xd - Xd.mean(axis=0)
    G = xc.T @ xc
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iters):
        w = G @ v
        v = w / np.sqrt((w * w).sum())

    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.d: r.v
        for r in power_iteration_top_pc(df, iters=iters, dim=dim).collect()
    }
    assert set(got) == set(range(dim))
    gv = np.array([got[d] for d in range(dim)])
    assert np.max(np.abs(gv - v)) < 1e-9
    assert abs(np.linalg.norm(gv) - 1.0) < 1e-12
    assert abs(float(np.abs(gv @ direction))) > 0.99  # found the plant


def test_remove_top_pc_matches_numpy(spark):
    """x - (x.v)v with the power-iteration v: numpy parity + the residual
    is orthogonal to v."""
    import numpy as np

    from gosmonaut_spark.functions.similarity import remove_top_pc

    rng = np.random.default_rng(33)
    n, dim, iters = 90, 8, 3
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    X = ((rng.normal(size=(n, 1)) * 5.0) @ direction[None, :]
         + rng.normal(size=(n, dim)) * 0.4).astype(np.float32)

    Xd = X.astype(np.float64)
    xcent = Xd - Xd.mean(axis=0)
    G = xcent.T @ xcent
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iters):
        w = G @ v
        v = w / np.sqrt((w * w).sum())
    want = Xd - np.outer(Xd @ v, v)

    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    rows = remove_top_pc(df, iters=iters, dim=dim).collect()
    got = np.zeros((n, dim))
    for r in rows:
        got[r.id, r.d] = r.e
    assert np.max(np.abs(got - want)) < 1e-8
    assert np.max(np.abs(got @ v)) < 1e-8  # residuals orthogonal to v


def test_bpe_pair_counts_matches_brute(spark):
    from collections import Counter

    from gosmonaut_spark.functions.text import bpe_pair_counts

    texts = [
        "Hello hello world!",      # normalization folds case / punct
        "low lower lowest",        # classic BPE demo vocabulary
        "a ab low",                # 1-char word contributes nothing
        "",                        # empty doc
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r.pair: r.n_occurrences for r in bpe_pair_counts(df, "text").collect()}

    import re

    want = Counter()
    for t in texts:
        for w in re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip().split():
            if w and len(w) >= 2:
                for i in range(len(w) - 1):
                    want[w[i : i + 2]] += 1
    assert got == dict(want)
    assert got["lo"] == 2 + 3 + 1  # hello x2, low/lower/lowest, low
    assert "a" not in got and got["ab"] == 1


def test_collocations_pmi_matches_brute(spark):
    import re
    from collections import Counter

    from gosmonaut_spark.functions.corpus import collocations_pmi

    texts = [
        "new york new york new york",
        "in new york in the city",
        "the city of new york",
        "machine learning in the city",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = collocations_pmi(df, "text", min_count=2).collect()
    got = {(r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.pmi_ratio) for r in out}

    def toks(t):
        return re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip().split()

    uni, big = Counter(), Counter()
    for t in texts:
        ws = toks(t)
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    N, B = sum(uni.values()), sum(big.values())
    want = {
        (a, b): (c, uni[a], uni[b], float(c) * N * N / (float(B) * uni[a] * uni[b]))
        for (a, b), c in big.items()
        if c >= 2
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert abs(got[k][3] - want[k][3]) < 1e-9
    assert ("new", "york") in got


def test_cms_never_underestimates_and_is_exact_when_wide(spark):
    import hashlib
    from collections import Counter

    from gosmonaut_spark.functions.sketch import cms_estimates

    rng_keys = [f"k{i % 37}" for i in range(500)] + ["hot"] * 200
    df = spark.createDataFrame([(k,) for k in rng_keys], "tok string")
    true = Counter(rng_keys)

    # narrow sketch: collisions possible, but NEVER an underestimate
    got = {
        r.tok: r.cms_est
        for r in cms_estimates(df, "tok", depth=3, width=16).collect()
    }
    assert set(got) == set(true)
    assert all(got[k] >= true[k] for k in true)
    assert got["hot"] >= 200

    # wide sketch: 38 keys into 4x4096 cells — exact with overwhelming
    # probability under the fixed md5 law (deterministic, so this is a
    # stable assertion, not a flaky one)
    got_wide = {
        r.tok: r.cms_est
        for r in cms_estimates(df, "tok", depth=4, width=4096).collect()
    }
    assert got_wide == dict(true)

    # python twin of the md5 law reproduces the engine exactly
    d, w, salt = 3, 16, "cms"
    counters = Counter()
    for k in rng_keys:
        for i in range(d):
            h = hashlib.md5(f"{salt}{i}|{k}".encode()).hexdigest()
            counters[(i, int(h[:12], 16) % w)] += 1
    brute = {
        k: min(counters[(i, int(hashlib.md5(f"{salt}{i}|{k}".encode()).hexdigest()[:12], 16) % w)] for i in range(d))
        for k in true
    }
    assert got == brute


def test_cms_external_probe_set(spark):
    from gosmonaut_spark.functions.sketch import cms_estimates

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "tok string")
    probes = spark.createDataFrame([("a",), ("zz",)], "tok string")
    got = {
        r.tok: r.cms_est
        for r in cms_estimates(df, "tok", probes=probes, depth=4, width=1024).collect()
    }
    assert got["a"] == 2
    assert got["zz"] >= 0  # absent key: whatever its cells hold (>= 0)
    assert set(got) == {"a", "zz"}


def test_editdist_pairs_matches_brute(spark):
    from itertools import combinations

    from gosmonaut_spark.functions.dedup import editdist_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    strings = [
        (1, "kitten"), (2, "sitten"), (3, "sittin"),     # 1-edit chain
        (4, "kitten!"),                                  # insertion off 1
        (5, "cat"), (6, "ca"), (7, "c"),                 # deletions
        (8, "wholly-different"), (9, "catt"),
    ]
    df = spark.createDataFrame(strings, "id long, s string")
    for d in (0, 1, 2):
        out = editdist_pairs(df, d, "id", "s").collect()
        got = {frozenset((r.id_a, r.id_b)): r.dist for r in out}
        want = {
            frozenset((i, j)): lev(a, b)
            for (i, a), (j, b) in combinations(strings, 2)
            if lev(a, b) <= d
        }
        assert got == want, f"max_dist={d}"
        assert all(len(k) == 2 for k in got)  # no self-pairs
    # spot: the classic kitten/sitten pair at d=1
    out1 = editdist_pairs(df, 1, "id", "s").collect()
    assert frozenset((1, 2)) in {frozenset((r.id_a, r.id_b)) for r in out1}


def test_pq_encode_matches_numpy(spark):
    import numpy as np

    from gosmonaut_spark.functions.similarity import pq_encode

    rng = np.random.default_rng(11)
    n, dim, m, stride = 60, 16, 4, 8
    sub = dim // m
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    out = pq_encode(df, m=m, centroid_stride=stride, dim=dim).collect()
    got = {(r.vec_id, r.subspace): r.code for r in out}

    codes = [i for i in range(n) if i % stride == 0]
    v64 = vecs.astype(np.float64)
    for i in range(n):
        for j in range(m):
            s = v64[i, j * sub : (j + 1) * sub]
            d2 = [
                (float(np.sum((s - v64[c, j * sub : (j + 1) * sub]) ** 2)), c)
                for c in codes
            ]
            want = min(d2)[1]
            assert got[(i, j)] == want, (i, j)
    # shape invariant: every vector gets exactly m codes, codes are codebook ids
    assert len(out) == n * m
    assert {r.code for r in out} <= set(codes)
    # a codebook vector encodes to ITSELF in every subspace with d2 == 0
    self_rows = [r for r in out if r.vec_id == 0]
    assert all(r.code == 0 and r.d2 == 0.0 for r in self_rows)


def test_pq_adc_topk_matches_numpy(spark):
    import numpy as np

    from gosmonaut_spark.functions.similarity import pq_adc_topk

    rng = np.random.default_rng(5)
    n, dim, m, stride, k = 60, 16, 4, 8, 3
    sub = dim // m
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ts = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "target_id long, embedding array<float>",
    )
    q_ids = [3, 20, 41]
    qs = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in q_ids],
        "query_id long, embedding array<float>",
    )
    out = pq_adc_topk(qs, ts, k=k, m=m, centroid_stride=stride, dim=dim).collect()
    got = {(r.query_id, r.rank): (r.target_id, r.adc_d2) for r in out}

    v = vecs.astype(np.float64)
    codes = [c for c in range(n) if c % stride == 0]

    def encode(t):
        return [
            min(
                (float(np.sum((v[t, j*sub:(j+1)*sub] - v[c, j*sub:(j+1)*sub]) ** 2)), c)
                for c in codes
            )[1]
            for j in range(m)
        ]

    enc = {t: encode(t) for t in range(n)}
    for qi in q_ids:
        scores = []
        for t in range(n):
            s = sum(
                float(np.sum((v[qi, j*sub:(j+1)*sub] - v[enc[t][j], j*sub:(j+1)*sub]) ** 2))
                for j in range(m)
            )
            scores.append((s, t))
        scores.sort()
        for r in range(1, k + 1):
            tid, d2 = got[(qi, r)]
            assert tid == scores[r - 1][1]
            assert abs(d2 - scores[r - 1][0]) < 1e-9
    # a query that IS a codebook vector has ADC distance 0 to itself
    out0 = pq_adc_topk(
        spark.createDataFrame(
            [(0, [float(x) for x in vecs[0]])],
            "query_id long, embedding array<float>",
        ),
        ts, k=1, m=m, centroid_stride=stride, dim=dim,
    ).collect()
    assert out0[0].target_id == 0 and out0[0].adc_d2 == 0.0


def test_cdc_shared_chunks_matches_brute(spark):
    import hashlib
    import re
    from collections import defaultdict

    from gosmonaut_spark.functions.dedup import cdc_shared_chunks

    W, B, M, D = 8, 31, 1_000_003, 16
    passage = (
        "the quick brown fox jumps over the lazy dog and runs far away into "
        "the night again and again while the moon rises slowly over the "
        "quiet hills and the river bends through the valley toward the sea"
    )
    rows = [
        (1, passage),
        (2, "A Brand New Intro, Sentence Here; " + passage),  # shifted dup
        (3, "completely different words entirely with no overlap at all"),
        (4, passage),                                          # exact dup
        (5, "short"),                                          # < window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_shared_chunks(df, divisor=D, min_docs=2).collect()
    got = {r.chunk_fp: (r.n_docs, r.chunk_len) for r in out}

    def norm(t):
        return re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip()

    def chunks(t):
        s = norm(t)
        L = len(s)
        if L < W:
            return [s]
        bnd = []
        for i in range(W, L + 1):
            h = sum(ord(s[i - 1 - j]) * (B ** j) for j in range(W)) % M
            if h % D == 0:
                bnd.append(i)
        b = [p for p in bnd if p < L] + [L]
        starts = [1] + [p + 1 for p in b[:-1]]
        return [s[st - 1 : en] for st, en in zip(starts, b)]

    docs_by_fp = defaultdict(set)
    len_by_fp = {}
    for i, t in rows:
        for c in chunks(t):
            fp = hashlib.md5(c.encode()).hexdigest()
            docs_by_fp[fp].add(i)
            len_by_fp[fp] = len(c)
    want = {
        fp: (len(ds), len_by_fp[fp])
        for fp, ds in docs_by_fp.items()
        if len(ds) >= 2
    }
    assert got == want
    # the shifted duplicate re-synchronizes: docs 1/2/4 share interior
    # chunks despite doc 2's prefix shifting every offset
    shared_124 = [fp for fp, ds in docs_by_fp.items() if {1, 2, 4} <= ds]
    assert shared_124 and all(fp in got for fp in shared_124)


def test_rake_keywords_matches_brute(spark):
    import re
    from collections import Counter, defaultdict

    from gosmonaut_spark.functions.corpus import rake_keywords

    stops = ["the", "and", "of", "is", "for", "a", "in"]
    texts = [
        (1, "deep learning models and deep learning systems for the modern web"),
        (2, "the web is full of learning systems and a modern web stack"),
        (3, "the of and"),  # all stopwords: no phrases at all
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = rake_keywords(df, stops, top_k=2).collect()
    got = {(r.doc_id, r.rank): (r.phrase, r.score) for r in out}

    def toks(t):
        return re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip().split()

    # brute RAKE
    phrases = []  # (doc, firstpos, [words])
    freq, deg = Counter(), Counter()
    for did, t in texts:
        run, start = [], None
        for i, w in enumerate(toks(t) + ["the"]):  # sentinel flushes tail
            if w in stops:
                if run:
                    phrases.append((did, start, run))
                    for x in run:
                        freq[x] += 1
                        deg[x] += len(run)
                run, start = [], None
            else:
                if not run:
                    start = i
                run = run + [w]
    scored = defaultdict(list)
    for did, start, run in phrases:
        s = 0.0
        for w in run:
            s += deg[w] / freq[w]
        scored[did].append((-s, " ".join(run), start))
    want = {}
    for did, lst in scored.items():
        lst.sort()
        for r, (negs, phrase, _st) in enumerate(lst[:2], 1):
            want[(did, r)] = (phrase, -negs)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9
    assert not any(d == 3 for d, _ in got)  # all-stopword doc yields nothing
    assert got[(1, 1)][0] in ("deep learning models", "deep learning systems")


def test_knn_classify_matches_brute_vote(spark):
    import numpy as np

    from gosmonaut_spark.functions.similarity import (
        cosine_topk_brute,
        knn_classify,
    )

    rng = np.random.default_rng(3)
    # two well-separated label clusters + a contested query between them
    a = rng.normal(loc=(5, 0, 0, 0), scale=0.3, size=(10, 4))
    b = rng.normal(loc=(0, 5, 0, 0), scale=0.3, size=(10, 4))
    vecs = np.vstack([a, b]).astype(np.float32)
    labels = [0] * 10 + [1] * 10
    ts = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "target_id long, embedding array<float>",
    )
    lab = spark.createDataFrame(
        list(zip(range(20), labels)), "target_id long, label long"
    )
    qs = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]]),       # in cluster a: label 0
         (15, [float(x) for x in vecs[15]]),     # in cluster b: label 1
         (99, [2.5, 2.5, 0.0, 0.0])],            # equidistant: tie -> label 0
        "query_id long, embedding array<float>",
    )
    topk = cosine_topk_brute(qs, ts, k=4)
    got = {r.query_id: (r.label, r.n_votes) for r in knn_classify(topk, lab).collect()}

    # brute vote with the same exclude-self and (votes desc, label asc) law
    v64 = vecs.astype(np.float64)
    qv = {0: v64[0], 15: v64[15], 99: np.array([2.5, 2.5, 0.0, 0.0])}
    want = {}
    for qid, v in qv.items():
        sims = [
            (float(v @ v64[t] / (np.linalg.norm(v) * np.linalg.norm(v64[t]))), -t)
            for t in range(20)
        ]
        sims.sort(reverse=True)
        top = [-t for _, t in sims[:4] if -t != qid][: 4]
        votes = {}
        for t in top:
            if t == qid:
                continue
            votes[labels[t]] = votes.get(labels[t], 0) + 1
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[qid] = best
    assert got[0][0] == 0 and got[15][0] == 1
    assert got == want


def test_oov_bigram_rate_matches_brute(spark):
    import re
    from collections import Counter

    from gosmonaut_spark.functions.text import oov_bigram_rate

    texts = [
        (1, "the quick brown fox and the lazy dog"),
        (2, "the quick brown dog and the lazy fox again"),
        (3, "zxqj vvkw qqpz"),              # gibberish: every bigram rare
        (4, "a I . !"),                     # no >=2-char words: absent
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = oov_bigram_rate(df, min_df=2).collect()
    got = {r.doc_id: (r.n_bigrams, r.n_oov, r.oov_rate) for r in out}

    def words(t):
        n = re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip()
        return [w for w in n.split() if len(w) >= 2] if n else []

    vocab_counts = Counter()
    for _i, t in texts:
        wc = Counter(words(t))
        for w, c in wc.items():
            for j in range(len(w) - 1):
                vocab_counts[w[j : j + 2]] += c
    vocab = {p for p, c in vocab_counts.items() if c >= 2}
    want = {}
    for i, t in texts:
        bigs = [w[j : j + 2] for w in words(t) for j in range(len(w) - 1)]
        if not bigs:
            continue
        oov = sum(1 for b in bigs if b not in vocab)
        want[i] = (len(bigs), oov, oov / len(bigs))
    assert got == want
    assert got[3][1] == got[3][0]  # pure gibberish: rate 1.0
    assert got[3][2] == 1.0
    assert got[1][2] < 0.5 and 4 not in got


def test_containment_pairs_matches_brute(spark):
    import re
    from itertools import combinations

    from gosmonaut_spark.functions.dedup import containment_pairs

    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = [
        (1, body),
        (2, "totally different words here nothing shared at all whatsoever ok"),
        (3, "QUOTE: " + " ".join(body.split()[:8])),   # excerpt of 1
        (4, body),                                     # exact dup of 1
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = containment_pairs(df, threshold=0.5, n=3).collect()
    got = {(r.a, r.b): (r.n_inter, r.n_a, r.n_b, r.containment) for r in out}

    def sh(t):
        ws = re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip().split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: sh(t) for i, t in texts}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        c = inter / min(len(sets[a]), len(sets[b]))
        if c >= 0.5:
            want[(a, b)] = (inter, len(sets[a]), len(sets[b]), c)
    assert got == want
    # the excerpt is contained (high) even though its jaccard vs 1 is low
    assert got[(1, 3)][3] > 0.5
    inter, na, nb, _ = got[(1, 3)]
    assert inter / (na + nb - inter) < 0.5  # jaccard would have missed it
    assert got[(1, 4)][3] == 1.0            # exact dup: containment 1
    assert not any(2 in p for p in got)


def test_kmv_sketch_and_jaccard_laws(spark):
    """KMV bottom-k: (1) the sketch is EXACTLY the k smallest md5-60bit
    hashes of the distinct key set (python oracle, exact ==); (2) the
    pairwise estimates land in the KMV error envelope; (3) unsaturated
    pairs return the EXACT Jaccard; (4) partitioning-invariant."""
    import hashlib

    from gosmonaut_spark.functions.sketch import kmv_jaccard_pairs, kmv_sketch

    def h60(key):
        return int(hashlib.md5(("kmv" + str(key)).encode()).hexdigest()[:15], 16)

    K = 64
    # two big overlapping sets (true J = 1000/3000 = 1/3) + one tiny set
    a_keys = {f"s{i}" for i in range(2000)}
    b_keys = {f"s{i}" for i in range(1000, 3000)}
    c_keys = {f"s{i}" for i in range(10)}  # subset of A: exact J vs C
    rows = (
        [("a", k) for k in a_keys]
        + [("b", k) for k in b_keys] * 2  # duplicates must not matter
        + [("c", k) for k in c_keys]
    )
    df = spark.createDataFrame(rows, "g string, key string")

    got_sk = {r.g: list(r.kmv) for r in kmv_sketch(df, "key", "g", k=K).collect()}
    want_sk = {
        "a": sorted(h60(k) for k in a_keys)[:K],
        "b": sorted(h60(k) for k in b_keys)[:K],
        "c": sorted(h60(k) for k in c_keys),  # unsaturated: full set
    }
    assert got_sk == want_sk

    got = {
        (r.g_a, r.g_b): r
        for r in kmv_jaccard_pairs(df, "key", "g", k=K).collect()
    }
    ab = got[("a", "b")]
    assert abs(ab.est_a - 2000) / 2000 < 0.30 and abs(ab.est_b - 2000) / 2000 < 0.30
    assert abs(ab.jaccard - 1 / 3) < 2.5 / (K ** 0.5)  # estimator envelope
    # a-c: c unsaturated and a's sketch is a bottom-k sample — the merged
    # sketch law still gives a deterministic value; check the exact pair
    # c-vs-c-like property via the python twin instead of a loose bound
    merged = sorted(set(want_sk["a"]) | set(want_sk["c"]))[:K]
    sa, sc = set(want_sk["a"]), set(want_sk["c"])
    want_ov = sum(1 for x in merged if x in sa and x in sc)
    ac = got[("a", "c")]
    assert ac.overlap == want_ov
    assert ac.jaccard == want_ov / min(K, len(set(want_sk["a"]) | set(want_sk["c"])))
    assert ac.est_b == 10.0  # unsaturated side reports its exact count
    # pure function of the key set: invariant to partitioning
    re_sk = {
        r.g: list(r.kmv)
        for r in kmv_sketch(df.repartition(23), "key", "g", k=K).collect()
    }
    assert re_sk == got_sk


def test_textrank_prefers_connected_words(spark):
    """A word co-occurring with many distinct frequent words outranks an
    equally frequent word locked in one repeated pair."""
    from gosmonaut_spark.functions.corpus import textrank_keywords

    docs = spark.createDataFrame(
        [
            ("alpha beta gamma delta alpha gamma beta delta",),
            ("alpha delta beta gamma",),
            ("solo solo solo solo pair pair pair pair",),
        ],
        "text string",
    )
    rows = textrank_keywords(docs, k=10, min_len=4, iters=5).collect()
    scores = {r["word"]: r["score"] for r in rows}
    assert rows[0]["rank"] == 1 and rows[0]["word"] == "beta"
    # the densely connected clique word beats the single-partner words
    assert scores["beta"] > scores["solo"] and scores["beta"] > scores["pair"]
    # self-pairs (solo solo) were dropped: solo's only edge is solo-pair,
    # so its rank mass stays at the uniform level
    assert abs(scores["solo"] - scores["pair"]) < 1e-9


def test_bigram_ppl_novelty_ordering(spark):
    """A doc made of corpus-frequent bigrams scores lower perplexity
    than a doc of one-off bigrams; add-one smoothing keeps everything
    finite."""
    from gosmonaut_spark.functions.text import bigram_perplexity

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat again"),
            (3, "zq xv qk jw pf vb"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_perplexity(docs).collect()}
    assert got[1]["avg_nll"] < got[3]["avg_nll"]
    assert got[1]["ppl"] < got[3]["ppl"] < float("inf")
    assert got[1]["n_bigrams"] == 5 and got[3]["n_bigrams"] == 5


def test_bpe_learn_merges_hand_example(spark):
    """Classic hand-computed trainer walk: corpus 'aaab aaab ab' —
    round 1 counts (a,a)=4 via OVERLAPPING adjacent positions and merges
    it greedily left-to-right NON-overlapping ('aaab' -> [aa, a, b]);
    round 2 picks (a,b)=3; round 3 merges the merged symbols (aa,ab)=2.
    Exercises run-parity greedy, multi-char symbols, and tie order."""
    from gosmonaut_spark.functions.text import bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab")], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_learn_merges(docs, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == [(1, "a", "a", 4), (2, "a", "b", 3), (3, "aa", "ab", 2)]
