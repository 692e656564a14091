"""Composed corpus dedup: exact + LSH near-dup with Jaccard verify."""

from atlas_spark.operators.dedup import dedupe_corpus, exact_dups, near_dups

BASE = " ".join(f"tok{i % 29} word{i % 13} x{i % 7}" for i in range(60))


def _corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),                                  # exact dup of 1
        (3, BASE.replace("tok5", "changed", 2)),    # near dup of 1
        (4, "an entirely different document about spark engines and scale"),
        (5, "short"),
        (6, BASE),                                  # another exact dup
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dups(spark):
    pairs = {(r["loser"], r["keeper"]) for r in exact_dups(_corpus(spark)).collect()}
    assert pairs == {(2, 1), (6, 1)}


def test_near_dups_verified_by_jaccard(spark):
    nd = near_dups(_corpus(spark), jaccard_threshold=0.7).collect()
    got = {(r["loser"], r["keeper"]) for r in nd}
    assert (3, 1) in got            # the edited copy
    assert all(l not in (4, 5) and k not in (4, 5) for l, k in got)
    for r in nd:
        assert r["jaccard"] >= 0.7


def test_dedupe_corpus_end_to_end(spark):
    kept, dropped = dedupe_corpus(_corpus(spark), jaccard_threshold=0.7)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    dropped_ids = {r["doc_id"] for r in dropped.collect()}
    assert kept_ids == {1, 4, 5}
    assert dropped_ids == {2, 3, 6}
