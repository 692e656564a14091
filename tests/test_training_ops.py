"""Training-data pipeline operators: multimodal plumbing, simhash,
IVF ANN — python-oracle checks (these are the non-SQL-expressible
ops; the SQL-expressible ones are oracle-checked in the catalog)."""

import hashlib
import math
import zlib

import pytest
from pyspark.sql import functions as F

from atlas_spark.operators.multimodal import (
    attach_media,
    extract_features,
    sample_frames,
)
from atlas_spark.operators.similarity import (
    IvfIndex,
    brute_force_topk,
    simhash16,
    simhash_near_dups,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# ------------------------------------------------------------ multimodal

def test_media_feature_extraction(spark, docs):
    media = attach_media(docs.limit(50), "text", "doc_id")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r["media_id"]: r for r in feats}
    src = {r["doc_id"]: r["text"] for r in docs.limit(50).collect()}
    for mid, row in by_id.items():
        payload = src[mid].encode("utf-8")
        h = hashlib.sha256(payload).digest()
        assert row["checksum"] == h.hex()
        assert row["width"] == 16 + h[0] % 64
        assert row["n_bytes"] == len(payload)
        assert 16 <= row["height"] < 80


def test_frame_sampling(spark, docs):
    media = attach_media(docs.limit(5), "text", "doc_id")
    frames = sample_frames(media, every_nth=3).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per_doc.items():
        assert idxs == sorted(idxs)
        assert all(i % 3 == 0 for i in idxs)


# --------------------------------------------------------------- simhash

def py_simhash16(text: str) -> int:
    words = [w for w in text.split(" ") if w != ""]
    votes = [0] * 16
    for w in words:
        h = zlib.crc32(w.encode("utf-8"))
        for i in range(16):
            votes[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(16):
        if votes[i] >= 0:
            out |= 1 << i
    return out


def test_simhash_matches_python_oracle(spark, docs):
    rows = simhash16(docs.limit(100), "text").select("doc_id", "simhash", "text").collect()
    for r in rows:
        assert r["simhash"] == py_simhash16(r["text"]), r["doc_id"]


def test_simhash_near_dups_finds_planted(spark):
    # long doc so a one-word edit flips at most a bit or two (simhash
    # stability grows with document length)
    base = " ".join(f"token{i % 37} word{i % 11} filler{i % 7}" for i in range(40))
    variant = base.replace("token5", "changed", 1)
    rows = [
        (1, base),
        (2, variant),                  # one-word edit → near-dup
        (3, "completely different words about spark engines at scale"),
        (4, base),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    ham = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(df, max_hamming=3).collect()
    }
    assert ham.get((1, 4)) == 0     # identical
    assert (1, 2) in ham and ham[(1, 2)] <= 3  # near-identical
    assert all(3 not in p for p in ham)


def test_band_slices_pigeonhole():
    """ADVICE r01: with max_hamming+1 bands, ANY pair within
    max_hamming bits shares at least one whole band (pigeonhole) — the
    r01 fixed 2-byte banding only guaranteed hamming ≤ 1."""
    import random

    from atlas_spark.operators.similarity import _band_slices

    rnd = random.Random(7)
    for max_h in (1, 2, 3):
        slices = _band_slices(16, max_h + 1)
        assert sum(w for _, w in slices) == 16
        assert [off for off, _ in slices] == sorted(off for off, _ in slices)
        for _ in range(500):
            x = rnd.getrandbits(16)
            y = x
            for b in rnd.sample(range(16), max_h):
                y ^= 1 << b
            assert any(
                (x >> off) & ((1 << w) - 1) == (y >> off) & ((1 << w) - 1)
                for off, w in slices
            ), (hex(x), hex(y), max_h)


def test_simhash_md5_variant_matches_python():
    """The md5_16 word-hash family (driver-oracle-portable) — python
    recomputation of the nibble arithmetic."""
    import hashlib

    def py_md5_simhash(text: str) -> int:
        words = [w for w in text.split(" ") if w != ""]
        votes = [0] * 16
        for w in words:
            h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:4], 16)
            for i in range(16):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(16) if votes[i] >= 0)

    import pyspark.sql.functions as FF

    from atlas_spark.session import get_spark
    spark = get_spark("t_md5sh", master="local[4]", shuffle_partitions=4)
    rows = [(1, "alpha beta gamma alpha"), (2, ""), (3, "  x  "), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash16(df, "text", word_hash="md5_16").collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == py_md5_simhash(text), (doc_id, text)


# ------------------------------------------------------------------ ANN

def py_cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_brute_force_topk_exact(spark, emb):
    q = [float(v) for v in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    got = brute_force_topk(emb, q, k=5).collect()
    assert got[0]["vec_id"] == 3 and got[0]["cos_sim"] == pytest.approx(1.0)
    # python oracle over the full table
    allv = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in emb.collect()]
    scored = sorted(((py_cos(q, v), -i) for i, v in allv), reverse=True)
    expect = [-i for _, i in scored[:5]]
    assert [r["vec_id"] for r in got] == expect


def test_ivf_recall_vs_brute_force(spark, emb):
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    idx = IvfIndex(n_cells=8, nprobe=4)
    idx.build(emb)
    approx = {r["vec_id"] for r in idx.search(q, k=10).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"recall {recall}"
    # probing ALL cells must equal brute force exactly
    idx_all = IvfIndex(n_cells=8, nprobe=8)
    idx_all.build(emb)
    full = {r["vec_id"] for r in idx_all.search(q, k=10).collect()}
    assert full == exact


def test_ivf_prunes_cells(spark, emb):
    idx = IvfIndex(n_cells=8, nprobe=2)
    assigned = idx.build(emb)
    n_cells_used = assigned.select("_cell").distinct().count()
    assert n_cells_used >= 4
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
    cand = assigned.filter(F.col("_cell").isin(idx._probe_cells(q)))
    assert cand.count() < emb.count()


def test_ivf_kmeans_recall(spark, emb):
    """VERDICT r01 #10: k-means|| centroids (cosine distance, fixed
    seed → deterministic) — average top-10 recall vs brute force over
    10 spread queries ≥ 0.9 at nprobe=6/8 (measured 0.91, min 0.8;
    the sf embeddings are near-uniform, so recall tracks the probe
    fraction — on clustered production embeddings k-means does
    strictly better at the same nprobe)."""
    qids = [3, 7, 11, 42, 99, 150, 222, 310, 404, 480]
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    idx = IvfIndex(n_cells=8, nprobe=6)
    idx.build(emb, centroids="kmeans")
    recalls = []
    for qid in qids:
        exact = {r["vec_id"]
                 for r in brute_force_topk(emb, vecs[qid], k=10).collect()}
        approx = {r["vec_id"] for r in idx.search(vecs[qid], k=10).collect()}
        recalls.append(len(exact & approx) / 10)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.9, f"kmeans avg recall {avg} ({recalls})"
    assert min(recalls) >= 0.7, recalls


def test_embedding_neardups_ivf_no_cartesian(spark, emb):
    """The composed near-dup API must be cell-bounded: every pair it
    returns is a true pair (subset of brute force at the same
    threshold), same-cell true pairs are found, and the physical plan
    contains NO cartesian/nested-loop join."""
    from atlas_spark.operators.similarity import embedding_neardups_ivf

    small = emb.filter(F.col("vec_id") < 120)
    got = embedding_neardups_ivf(
        small, threshold=0.5, n_cells=4, centroids="kmeans"
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in got.collect()}
    # soundness: subset of the brute-force pair set, values identical
    a = small.select(F.col("vec_id").alias("id_a"),
                     F.col("embedding").cast("array<double>").alias("ea"))
    b = small.select(F.col("vec_id").alias("id_b"),
                     F.col("embedding").cast("array<double>").alias("eb"))
    dot = F.expr("aggregate(zip_with(ea, eb, (x,y) -> x*y), 0.0D, (a,v) -> a+v)")
    na = F.expr("sqrt(aggregate(ea, 0.0D, (a,v) -> a+v*v))")
    nb = F.expr("sqrt(aggregate(eb, 0.0D, (a,v) -> a+v*v))")
    brute = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(dot / (na * nb), 3))
        .filter(F.col("cos_sim") >= 0.5)
        .select("id_a", "id_b", "cos_sim").collect()
    }
    assert set(pairs) <= set(brute)
    for k, v in pairs.items():
        assert brute[k] == v
    # completeness within cells: found a meaningful fraction of all
    # true pairs (boundary-straddling pairs are the documented miss)
    if brute:
        assert len(pairs) / len(brute) >= 0.5, (len(pairs), len(brute))


def test_resize_media(spark, docs):
    from atlas_spark.operators.multimodal import resize_media

    media = attach_media(docs.limit(20), "text", "doc_id")
    out = resize_media(media, max_side=32).collect()
    assert len(out) == 20
    for r in out:
        assert 1 <= r["width"] <= 32 and 1 <= r["height"] <= 32
        assert r["payload"] is not None
    # deterministic
    out2 = resize_media(media, max_side=32).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_embedding_neardups_ivf_multiprobe_recall(spark):
    """VERDICT r02 #8: nprobe>1 closes the cell-boundary recall gap.

    Deterministic clustered corpus with MORE cells than clusters, so
    k-means oversplits clusters across cell boundaries — the exact
    case nprobe=1 misses pairs on.  Multi-probe recall (vs the
    brute-force pair oracle) must dominate single-probe and stay sound
    (subset of true pairs)."""
    import numpy as np

    from atlas_spark.operators.similarity import embedding_neardups_ivf

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, 8))
    rows = []
    for ci, c in enumerate(centers):
        for j in range(20):
            v = c + 0.25 * rng.normal(size=8)
            rows.append((ci * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    a = df.select(F.col("vec_id").alias("id_a"),
                  F.col("embedding").alias("ea"))
    b = df.select(F.col("vec_id").alias("id_b"),
                  F.col("embedding").alias("eb"))
    dot = F.expr("aggregate(zip_with(ea, eb, (x,y) -> x*y), 0.0D, (a,v) -> a+v)")
    na = F.expr("sqrt(aggregate(ea, 0.0D, (a,v) -> a+v*v))")
    nb = F.expr("sqrt(aggregate(eb, 0.0D, (a,v) -> a+v*v))")
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot / (na * nb), 3).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.8).collect()
    }
    assert truth, "test needs at least one true near-dup pair"

    def pairs(nprobe):
        got = embedding_neardups_ivf(df, threshold=0.8, n_cells=6,
                                     centroids="kmeans", nprobe=nprobe)
        return {(r["id_a"], r["id_b"]) for r in got.collect()}

    p1, p2 = pairs(1), pairs(2)
    assert p1 <= truth and p2 <= truth      # soundness (no false pairs)
    assert p1 <= p2                          # multi-probe only adds
    r1 = len(p1) / len(truth)
    r2 = len(p2) / len(truth)
    assert r2 >= r1
    assert r2 >= 0.8, f"nprobe=2 recall {r2} (nprobe=1: {r1})"


def test_simhash_near_dups_single_scan(spark):
    """The group-by-band rework must scan the corpus ONCE (the r02
    band self-join re-scanned and re-simhashed both sides — HOF
    lambdas defeat exchange-reuse)."""
    from atlas_spark.operators.similarity import simhash_near_dups

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(50)],
        "doc_id int, text string",
    )
    plan = simhash_near_dups(docs)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1, plan


def test_embedding_neardups_ivf_cell_cap_pathological(spark):
    """VERDICT r03 #3: a degenerate corpus (all-identical embeddings →
    every vector in ONE cell) must complete with the mega-cell dropped
    and a warning, not enumerate |cell|² pairs."""
    import warnings

    from atlas_spark.operators.similarity import embedding_neardups_ivf

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(400)],
        "vec_id int, embedding array<double>",
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = embedding_neardups_ivf(
            df, threshold=0.9, n_cells=4, centroids="lowid",
            max_cell_size=100,
        ).collect()
    assert got == []                       # the only cell was dropped
    msgs = [str(w.message) for w in caught
            if "dropped oversized cells" in str(w.message)]
    assert msgs and "=400" in msgs[0], msgs
    # same corpus under the default cap still works (sanity: the cap
    # is the only thing between this shape and |cell|² = 160k pairs)
    n = embedding_neardups_ivf(
        df.filter("vec_id < 30"), threshold=0.9, n_cells=4,
        centroids="lowid",
    ).count()
    assert n == 30 * 29 // 2


def test_embedding_neardups_ivf_id_label_invariance(spark):
    """ADVICE r03 (medium): multi-probe recall must not depend on
    arbitrary id labeling.  Relabel ids in reverse order; the pair set
    (mapped back) must be identical — the old `a.id < b.id` pre-filter
    kept only the orientation where the LOWER id's primary cell was in
    the HIGHER id's probe list, so reversing labels changed results."""
    import numpy as np

    from atlas_spark.operators.similarity import embedding_neardups_ivf

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 8))
    rows = []
    for ci, c in enumerate(centers):
        for j in range(15):
            v = c + 0.3 * rng.normal(size=8)
            rows.append((ci * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    hi = max(r[0] for r in rows)
    flipped = spark.createDataFrame(
        [(hi - i, v) for i, v in rows], "vec_id int, embedding array<double>"
    )

    def pairset(frame):
        got = embedding_neardups_ivf(frame, threshold=0.8, n_cells=6,
                                     centroids="kmeans", nprobe=2)
        return {(r["id_a"], r["id_b"]) for r in got.collect()}

    orig = pairset(df)
    remapped = {tuple(sorted((hi - a, hi - b))) for a, b in pairset(flipped)}
    assert orig == remapped, (sorted(orig - remapped),
                              sorted(remapped - orig))


def test_ivf_search_many_matches_search(spark, emb):
    """VERDICT r03 #5: the batched search path must return exactly the
    per-query search() results, with no driver loop."""
    from atlas_spark.operators.similarity import IvfIndex

    qids = [3, 7, 42, 150, 404]
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    idx = IvfIndex(n_cells=8, nprobe=3)
    idx.build(emb, centroids="kmeans")

    queries = spark.createDataFrame(
        [(qid, vecs[qid]) for qid in qids],
        "query_id int, embedding array<double>",
    )
    batched = idx.search_many(queries, k=5)
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cos_sim"], 9))
        )
    for qid in qids:
        single = [(r["vec_id"], round(r["cos_sim"], 9))
                  for r in idx.search(vecs[qid], k=5).collect()]
        assert sorted(got[qid]) == sorted(single), qid
